import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.codes import bb_code_by_n
from slidingwindowdecoder_tpu.decoders import OSDWindow


@pytest.fixture(scope="module")
def bb72():
    code, _, _ = bb_code_by_n(72)
    return code


def test_osd_window_syndrome_consistency(bb72, rng):
    p = 0.04
    dec = OSDWindow(
        bb72.hx,
        np.full(bb72.N, p),
        pre_max_iter=8,
        post_max_iter=40,
        osd_method="osd_cs",
        osd_order=4,
        new_n=bb72.N,
        bucket=64,
    )
    errs = (rng.random((64, bb72.N)) < p).astype(np.uint8)
    synds = (errs @ bb72.hx.T) % 2
    res = dec.decode_batch(synds)
    resid = (res.error.astype(int) @ bb72.hx.T + synds) % 2
    # converged-BP and consistent-OSD outputs reproduce the syndrome
    ok = resid.any(axis=1) == 0
    assert ok.mean() > 0.95
    assert res.osd_applied.sum() >= 0


def test_osd_window_shortening_active(bb72, rng):
    # with new_n < n, many columns are decided to zero before post-BP
    p = 0.05
    dec = OSDWindow(
        bb72.hx,
        np.full(bb72.N, p),
        pre_max_iter=4,
        post_max_iter=30,
        osd_method="osd_0",
        new_n=60,
        bucket=32,
    )
    errs = (rng.random((32, bb72.N)) < p).astype(np.uint8)
    synds = (errs @ bb72.hx.T) % 2
    res = dec.decode_batch(synds)
    assert res.error.shape == (32, bb72.N)
    # decodes a decent fraction
    resid = (res.error.astype(int) @ bb72.hx.T + synds) % 2
    assert (resid.any(axis=1) == 0).mean() > 0.5


def test_osd_window_order_bound(bb72):
    with pytest.raises(ValueError):
        OSDWindow(
            bb72.hx, np.full(bb72.N, 0.01), osd_method="osd_cs", osd_order=100
        )


def test_osd_window_new_n_candidate_count_and_consistency(bb72, rng):
    """new_n < n: the OSD-CS candidate list must have exactly
    k + order*(order-1)/2 patterns over k = new_n - rank free columns
    (the reference's osd_cs_setup cross-check, osd_window.pyx:134-155),
    and the decode must stay syndrome-consistent with pm(OSD-CS) <=
    pm(OSD-0) per shot."""
    p = 0.05
    new_n, order = 60, 6
    dec = OSDWindow(
        bb72.hx, np.full(bb72.N, p), pre_max_iter=4, post_max_iter=8,
        new_n=new_n, osd_method="osd_cs", osd_order=order, bucket=16,
    )
    k = new_n - dec.rank
    assert dec.k == k
    assert dec.patterns.shape == (k + order * (order - 1) // 2, k)
    # every pattern weight-1, plus weight-2 pairs within the first `order`
    w = dec.patterns.sum(axis=1)
    assert (w[:k] == 1).all() and (w[k:] == 2).all()

    dec0 = OSDWindow(
        bb72.hx, np.full(bb72.N, p), pre_max_iter=4, post_max_iter=8,
        new_n=new_n, osd_method="osd_0", bucket=16,
    )
    shots = 32
    errs = (rng.random((shots, bb72.N)) < p).astype(np.uint8)
    synds = ((errs @ bb72.hx.T) % 2).astype(np.uint8)
    res = dec.decode_batch(synds)
    res0 = dec0.decode_batch(synds)
    resid = (res.error @ bb72.hx.T + synds) % 2
    # OSD solutions always satisfy the syndrome; only dead/unconverged-BP
    # fallbacks may not. Check consistency wherever OSD was applied.
    applied = np.asarray(res.osd_applied)
    assert not resid[applied].any()
    assert applied.any()  # the shortened+OSD path actually exercised
    both = applied & np.asarray(res0.osd_applied)
    assert (res.min_pm[both] <= res0.min_pm[both] + 1e-4).all()
