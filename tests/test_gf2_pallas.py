"""Pallas Gauss-Jordan kernel vs the XLA reference path (interpret mode).

The Pallas kernel (ops/gf2_pallas.py) must be bit-identical to
``ordered_gauss_jordan`` — same greedy reliability-ordered pivoting as the
reference's ``mod2sparse_decomp_osd`` (mod2sparse_extra.cpp:113-376) — for
every output the OSD sweep consumes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from slidingwindowdecoder_tpu.ops.gf2_solve import (
    gf2_rank_packed,
    ordered_gauss_jordan,
    pack_rows_host,
)
from slidingwindowdecoder_tpu.ops.gf2_pallas import (
    ordered_gauss_jordan_pallas,
    pallas_gj_supported,
)

KEYS = [
    "osd0",
    "piv_col",
    "piv_row",
    "reduced_wm",
    "synd_bits",
    "sol_bits",
    "inconsistent",
]


def _compare(H, B, rng):
    m, n = H.shape
    rank = gf2_rank_packed(H)
    Hw = jnp.asarray(pack_rows_host(H))
    synd = jnp.asarray((rng.random((B, m)) < 0.5).astype(np.uint8))
    order = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(B)]).astype(np.int32)
    )
    ref = ordered_gauss_jordan(Hw, synd, order, m=m, n=n, rank=rank)
    out = ordered_gauss_jordan_pallas(
        Hw, synd, order, m=m, n=n, rank=rank, interpret=True
    )
    for k in KEYS:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(out[k]), err_msg=k
        )
    return ref


def test_full_rank_random(rng):
    H = (rng.random((24, 70)) < 0.18).astype(np.uint8)
    while gf2_rank_packed(H) != 24:
        H = (rng.random((24, 70)) < 0.18).astype(np.uint8)
    _compare(H, 5, rng)


def test_rank_deficient_inconsistent(rng):
    base = (rng.random((32, 130)) < 0.15).astype(np.uint8)
    H = np.vstack([base, base[:8]])  # duplicated rows -> rank < m
    assert gf2_rank_packed(H) < H.shape[0]
    ref = _compare(H, 9, rng)
    # random syndromes on a rank-deficient H: some must be inconsistent
    assert np.asarray(ref["inconsistent"]).any()


def test_batch_padding_to_lane_multiple(rng):
    # B=3 forces lane padding to 128 inside the kernel wrapper
    H = (rng.random((16, 40)) < 0.25).astype(np.uint8)
    _compare(H, 3, rng)


def test_wide_multiword(rng):
    # n > 64 exercises multi-word pivot column selection
    H = (rng.random((48, 200)) < 0.08).astype(np.uint8)
    _compare(H, 4, rng)


def test_supported_shape_check():
    # [[144]] W=3 window graph shape fits; an absurd one does not
    assert pallas_gj_supported(216, 54, 216)
    assert not pallas_gj_supported(4096, 300, 4096)


@pytest.mark.slow
def test_bposd_engine_equivalence(rng):
    """BPOSD end-to-end: pallas GJ and xla GJ give identical decodes."""
    from slidingwindowdecoder_tpu.codes.constructors import (
        create_bivariate_bicycle_codes,
    )
    from slidingwindowdecoder_tpu.decoders import BPOSD

    code, _, _ = create_bivariate_bicycle_codes(6, 6, [3], [1, 2], [1, 2], [3])
    H = code.hx
    p = 0.05
    probs = np.full(H.shape[1], p)
    errs = (rng.random((64, H.shape[1])) < p).astype(np.uint8)
    synds = (errs @ H.T) % 2

    kw = dict(max_iter=12, osd_method="osd_cs", osd_order=4, phase_a_iters=None)
    d_x = BPOSD(H, probs, gj_engine="xla", **kw)
    d_p = BPOSD(H, probs, gj_engine="pallas_interpret", **kw)
    r_x = d_x.decode_batch(synds)
    r_p = d_p.decode_batch(synds)
    np.testing.assert_array_equal(r_x.error, r_p.error)
    np.testing.assert_array_equal(r_x.converged, r_p.converged)
    np.testing.assert_allclose(r_x.min_pm, r_p.min_pm, rtol=1e-5)
