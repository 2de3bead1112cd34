import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.codes import bb_code_by_n
from slidingwindowdecoder_tpu.decoders import BPOSD
from slidingwindowdecoder_tpu.harness import data_qubit_noise_decoding


@pytest.fixture(scope="module")
def bb72():
    code, _, _ = bb_code_by_n(72)
    return code


def test_bposd_syndrome_consistency(bb72, rng):
    p = 0.04
    dec = BPOSD(
        bb72.hx,
        np.full(bb72.N, p),
        max_iter=30,
        osd_method="osd_cs",
        osd_order=4,
    )
    errs = (rng.random((40, bb72.N)) < p).astype(np.uint8)
    synds = (errs @ bb72.hx.T) % 2
    res = dec.decode_batch(synds)
    # every OSD (or converged-BP) output must reproduce its syndrome:
    # hx is rank-deficient but the syndrome is always in the image
    resid = (res.error.astype(int) @ bb72.hx.T + synds) % 2
    assert not resid.any()
    assert res.osd_applied is not None


def test_bposd_code_capacity_ler(bb72):
    # functional LER check: OSD-CS must beat plain BP-convergence failures
    # and produce a low LER at moderate p on [[72,12,6]]
    p = 0.03
    dec = BPOSD(
        bb72.hx, np.full(bb72.N, p), max_iter=40, osd_method="osd_cs", osd_order=5
    )
    out = data_qubit_noise_decoding(
        bb72, p, 2000, {"bposd": dec}, batch_size=1000, seed=5, verbose=False
    )
    r = out["bposd"]
    assert r["shots"] == 2000
    # [[72,12,6]]: distance-6 code at p=0.03 under OSD decodes most shots
    assert r["ler"] < 0.05
    assert r["num_flagged"] < 2000  # BP converges on a decent fraction


def test_bposd_single_shot_api(bb72):
    p = 0.02
    dec = BPOSD(bb72.hx, np.full(bb72.N, p), max_iter=20, osd_method="osd_0")
    err = np.zeros(bb72.N, dtype=np.uint8)
    err[5] = 1
    e_hat = dec.decode((err @ bb72.hx.T) % 2)
    assert e_hat.shape == (bb72.N,)
    # single data-qubit error must be corrected exactly up to stabilizer
    e_diff = (e_hat + err) % 2
    assert not ((e_diff @ bb72.hz_perp.T) % 2).any()


def test_bposd_validation():
    code, _, _ = bb_code_by_n(72)
    with pytest.raises(ValueError):
        BPOSD(code.hx, np.full(code.N, 0.0))  # prob not in (0,1)
    with pytest.raises(ValueError):
        BPOSD(code.hx, np.full(code.N, 0.01), osd_method="bogus")
    with pytest.raises(ValueError):
        BPOSD(code.hx, np.full(10, 0.01))  # wrong length


def test_bposd_phase_compaction_invariance(bb72, rng):
    """Per-shot results must be independent of the phase split and bucket
    sizes: the two-phase bucket walk is purely a scheduling choice (covers
    the long-iteration path in the fast suite, per round-1 ADVICE)."""
    p = 0.06
    shots = 48
    errs = (rng.random((shots, bb72.N)) < p).astype(np.uint8)
    synds = ((errs @ bb72.hx.T) % 2).astype(np.uint8)
    kw = dict(max_iter=200, osd_method="osd_cs", osd_order=4)
    mono = BPOSD(bb72.hx, np.full(bb72.N, p), phase_a_iters=None, **kw)
    two = BPOSD(
        bb72.hx, np.full(bb72.N, p), phase_a_iters=24, bp_bucket=8,
        osd_bucket=8, **kw,
    )
    r_mono = mono.decode_batch(synds)
    r_two = two.decode_batch(synds)
    np.testing.assert_array_equal(r_mono.error, r_two.error)
    np.testing.assert_array_equal(r_mono.converged, r_two.converged)
    np.testing.assert_array_equal(r_mono.iterations, r_two.iterations)
    np.testing.assert_allclose(r_mono.min_pm, r_two.min_pm, rtol=1e-5)

    # explicit multi-span phase B (re-compaction between spans) must also
    # be trajectory-identical
    spans = BPOSD(
        bb72.hx, np.full(bb72.N, p), phase_a_iters=24, bp_bucket=8,
        osd_bucket=8, phase_b_spans=(24, 48, 104), **kw,
    )
    r_sp = spans.decode_batch(synds)
    np.testing.assert_array_equal(r_mono.error, r_sp.error)
    np.testing.assert_array_equal(r_mono.converged, r_sp.converged)
    np.testing.assert_array_equal(r_mono.iterations, r_sp.iterations)
    np.testing.assert_allclose(r_mono.min_pm, r_sp.min_pm, rtol=1e-5)


def test_bposd_phase_b_spans_validation(bb72):
    probs = np.full(bb72.N, 0.01)
    with pytest.raises(ValueError):  # doesn't sum to it_b
        BPOSD(bb72.hx, probs, max_iter=100, phase_a_iters=20,
              phase_b_spans=(40, 30))
    with pytest.raises(ValueError):  # non-final span not a multiple of 4
        BPOSD(bb72.hx, probs, max_iter=100, phase_a_iters=20,
              phase_b_spans=(30, 50))
