"""Pallas CN-update kernel vs the XLA path (interpret mode).

The fused check-node kernel (ops/bp_pallas.py) must be bit-identical to
``_cn_update_sm`` — the reference two-pass min-sum semantics
(bpgd.cpp:97-197) — including degree padding, ties, clipping and the
bfloat16 message mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from slidingwindowdecoder_tpu.graphs.tanner import (
    compile_graph,
    graph_device_arrays,
)
from slidingwindowdecoder_tpu.ops.bp import bp_init_messages, bp_run, fresh_bp_state
from slidingwindowdecoder_tpu.ops.bp_pallas import cn_update_pallas
from slidingwindowdecoder_tpu.ops.bp import _cn_update_sm


def _random_graph(rng, m=24, n=60, dens=0.2):
    H = (rng.random((m, n)) < dens).astype(np.uint8)
    H[:, 0] = 1  # no empty rows/cols
    H[0, :] = 1
    return H


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_cn_kernel_matches_xla(rng, dtype):
    H = _random_graph(rng)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    dc, m_pad = garr["cn_vn_sm"].shape
    B = 128
    mdt = jnp.dtype(dtype)

    mv = jnp.asarray(
        (rng.standard_normal((dc, m_pad, B)) * 30).astype(np.float32)
    ).astype(mdt)
    # exercise ties: clone slot 0's magnitude into slot 1 for some checks
    mv = mv.at[1, ::3, :].set(-mv[0, ::3, :])
    parity = jnp.asarray(rng.integers(0, 2, (m_pad, B)).astype(np.int32))
    valid = garr["cn_valid_sm"]

    ref = _cn_update_sm(
        mv, valid[:, :, None], parity, alpha=0.625, clip=50.0
    )
    out = cn_update_pallas(
        mv, valid, parity, alpha=0.625, clip=50.0, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref, np.float32), np.asarray(out, np.float32)
    )


def test_bp_run_cn_engine_equivalence(rng):
    """Full bp_run trajectories agree between CN engines (B=128)."""
    H = _random_graph(rng)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    B, n, m = 128, H.shape[1], H.shape[0]
    prior = np.log((1 - 0.05) / 0.05) * np.ones(n, np.float32)

    errs = (rng.random((B, n)) < 0.08).astype(np.uint8)
    synds = jnp.asarray((errs @ H.T) % 2, jnp.uint8)
    vn_state = jnp.full((B, n), -1, jnp.int8)
    cn_state = synds.astype(jnp.int8)

    outs = {}
    for eng in ("xla", "pallas_interpret"):
        mv = bp_init_messages(garr, prior, B)
        history, error, done, iters = fresh_bp_state(garr, B)
        outs[eng] = bp_run(
            garr, mv, prior, synds, vn_state, cn_state, history, error,
            done, iters, num_iter=12, alpha=1.0, clip=50.0, masked=False,
            cn_engine=eng,
        )
    for a, b in zip(outs["xla"], outs["pallas_interpret"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cn_engine_masked_pinned(rng):
    """Masked (pinned-LLR) BP through the Pallas CN kernel is
    bit-identical to the XLA masked path — the decimation decoders'
    configuration (round 5 lifted the unmasked-only restriction)."""
    H = _random_graph(rng)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    B, n = 128, H.shape[1]
    prior = rng.uniform(0.5, 4.0, n).astype(np.float32)
    synds = jnp.asarray(rng.integers(0, 2, (B, H.shape[0])), jnp.uint8)
    # decide a third of the VNs (mix of 0/1) as guided decimation would
    vs = rng.integers(-1, 2, (B, n)).astype(np.int8)
    vs[:, : n // 3] = -1
    vn_state = jnp.asarray(np.where(vs > 0, 1, np.where(vs == 0, 0, -1)),
                           jnp.int8)
    cn_state = synds.astype(jnp.int8)

    outs = {}
    for eng in ("xla", "pallas_interpret"):
        mv = bp_init_messages(garr, prior, B)
        history, error, done, iters = fresh_bp_state(garr, B)
        outs[eng] = bp_run(
            garr, mv, prior, synds, vn_state, cn_state, history, error,
            done, iters, num_iter=8, alpha=0.625, clip=50.0, masked=True,
            cn_engine=eng,
        )
    # the CN kernel itself is bit-identical (see the unmasked test and
    # the direct pinned comparison below), but the two engines' whole
    # iterations differ by XLA fusion: with the XLA CN in-graph, the VN
    # update contracts `post_edge - alpha*mag` into an FMA (one
    # rounding); a custom call is opaque to contraction. Decisions and
    # convergence agree on this seed; messages/history agree to
    # reassociation tolerance.
    xo, po = outs["xla"], outs["pallas_interpret"]
    np.testing.assert_array_equal(np.asarray(xo[2]), np.asarray(po[2]))
    np.testing.assert_array_equal(np.asarray(xo[3]), np.asarray(po[3]))
    np.testing.assert_array_equal(np.asarray(xo[4]), np.asarray(po[4]))
    np.testing.assert_allclose(
        np.asarray(xo[0]), np.asarray(po[0]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(xo[1]), np.asarray(po[1]), rtol=1e-4, atol=1e-4
    )

    # direct pinned CN-stage comparison: exactly equal
    from slidingwindowdecoder_tpu.ops.bp import PIN, _cn_update_sm
    from slidingwindowdecoder_tpu.ops.bp_pallas import cn_update_pallas

    dc, m_pad = g.dc, g.m_pad
    mv_sm = rng.standard_normal((dc, m_pad, B)).astype(np.float32) * 3
    pin = rng.random((dc, m_pad, B)) < 0.3
    mv_sm = jnp.asarray(np.where(pin, np.float32(PIN), mv_sm))
    valid = jnp.asarray(g.cn_valid_sm)
    parity = jnp.asarray(rng.integers(0, 2, (m_pad, B)), jnp.int32)
    out = cn_update_pallas(mv_sm, valid, parity, alpha=0.625, clip=50.0,
                           interpret=True, pinned=True)
    ref = _cn_update_sm(mv_sm, valid[:, :, None], parity, alpha=0.625,
                        clip=50.0, pinned=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
