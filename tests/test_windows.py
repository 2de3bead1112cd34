import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.harness.circuit_level import (
    build_bb_window_experiment,
    sliding_window_decoder,
)
from slidingwindowdecoder_tpu.windows.regions import (
    build_sliding_window_plan,
    find_anchors,
    regroup_columns,
)


@pytest.fixture(scope="module")
def bb72_experiment():
    # [[72,12,6]], 4 rounds, W=3/F=1 — smallest realistic window experiment
    return build_bb_window_experiment(72, 0.003, 4, 3, 1, method=1)


def test_regrouping_staircase(bb72_experiment):
    code, circuit, dem, plan = bb72_experiment
    h = code.N // 2
    # permutation is a bijection over DEM columns
    assert sorted(plan.column_perm.tolist()) == list(range(dem.chk.shape[1]))
    # staircase: each column's row support spans at most 2 half-blocks and
    # columns are ordered by non-decreasing region
    last_region = -1
    for j in range(plan.chk.shape[1]):
        rows = np.nonzero(plan.chk[:, j])[0]
        lo = rows.min() // h
        hi = rows.max() // h
        assert hi - lo <= 1
        assert lo >= last_region - 1  # block-staircase monotonicity
        last_region = max(last_region, lo)


def test_anchors(bb72_experiment):
    code, circuit, dem, plan = bb72_experiment
    h = code.N // 2
    anchors = plan.anchors
    # one anchor per round boundary + final sentinel
    assert len(anchors) == circuit.num_detectors // h + 1
    assert anchors[0] == (0, 0)
    assert anchors[-1] == (plan.chk.shape[0], plan.chk.shape[1])
    rows = [a[0] for a in anchors]
    assert rows == sorted(rows)


def test_window_specs(bb72_experiment):
    code, circuit, dem, plan = bb72_experiment
    h = code.N // 2
    assert plan.num_windows == len(plan.anchors) - plan.W  # F=1
    for spec in plan.windows:
        assert spec.row_end - spec.row_start <= plan.W * h
        assert spec.mat.shape[0] == spec.row_end - spec.row_start
        assert spec.prior.shape[0] == spec.mat.shape[1]
        if not spec.is_last:
            assert spec.num_virtual == h
            # virtual block is the identity on the last h rows
            virt = spec.mat[:, -h:]
            assert np.array_equal(virt[-h:], np.eye(h, dtype=virt.dtype))
            assert not virt[:-h].any()
            assert spec.commit_col_end <= spec.col_end
    # interior windows share a shape (compile-cache friendliness)
    shapes = {s.shape for s in plan.windows[1:-1]}
    assert len(shapes) <= 2


def test_end_to_end_noiseless_shots(bb72_experiment):
    code, circuit, dem, plan = bb72_experiment
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window,
        evaluate_logical_errors,
    )
    from slidingwindowdecoder_tpu.decoders import BPOSD

    S = 4
    det = np.zeros((S, plan.chk.shape[0]), dtype=np.uint8)
    obs = np.zeros((S, plan.obs.shape[0]), dtype=np.uint8)
    factory = CachingDecoderFactory(
        lambda spec: BPOSD(spec.mat, spec.prior, max_iter=10, osd_method="osd_0")
    )
    out = decode_sliding_window(plan, det, factory, verbose=False)
    ev = evaluate_logical_errors(plan, det, obs, out["total_e_hat"])
    # all-zero detectors must decode to the all-zero correction
    assert not out["total_e_hat"].any()
    assert ev["num_failed"] == 0


def test_sliding_window_decoder_end_to_end():
    # full pipeline on [[72]] x 4 rounds with a small shot count: the
    # decoder must fix the overwhelming majority of shots at p=0.003
    res = sliding_window_decoder(
        N=72,
        p=0.003,
        num_repeat=4,
        num_shots=300,
        max_iter=60,
        W=3,
        F=1,
        osd_method="osd_cs",
        osd_order=4,
        seed=3,
        verbose=False,
    )
    assert res["num_windows"] == 3
    # raw detector data is very noisy, decoded failure rate must be tiny
    assert res["ler"] < 0.05
    assert res["num_flagged"] <= res["num_failed"]
