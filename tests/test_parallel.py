import json
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.parallel.checkpoint import (
    MonteCarloCheckpoint,
    run_checkpointed,
)
from slidingwindowdecoder_tpu.parallel.distributed import (
    host_seed,
    host_shot_range,
    initialize_distributed,
)
from slidingwindowdecoder_tpu.parallel.mesh import make_shot_mesh, shard_decode_step
from slidingwindowdecoder_tpu.utils.metrics import (
    RunMetrics,
    ler_per_round,
    rates_compatible,
    wilson_interval,
)


def test_host_shot_range():
    ranges = [host_shot_range(103, pid, 4) for pid in range(4)]
    assert sum(c for _, c in ranges) == 103
    covered = sorted((s, s + c) for s, c in ranges)
    assert covered[0][0] == 0
    for (a0, a1), (b0, b1) in zip(covered, covered[1:]):
        assert a1 == b0


def test_host_seed_streams_disjoint():
    a = host_seed(7, 0).random(1000)
    b = host_seed(7, 1).random(1000)
    assert not np.allclose(a, b)
    a2 = host_seed(7, 0).random(1000)
    np.testing.assert_array_equal(a, a2)  # deterministic


def test_initialize_distributed_single_process():
    info = initialize_distributed()
    assert info["num_processes"] == 1
    assert len(info["devices"]) >= 1


def test_checkpoint_resume(tmp_path):
    calls = []

    def run_batch(idx, shots):
        calls.append(idx)
        if len(calls) == 4 and not getattr(run_batch, "resumed", False):
            raise KeyboardInterrupt  # simulate a crash mid-run
        return {"failed": idx, "shots": shots}

    ckpt = MonteCarloCheckpoint(str(tmp_path), process_id=0)
    with pytest.raises(KeyboardInterrupt):
        run_checkpointed(100, 10, run_batch, ckpt, checkpoint_every=2)
    state = ckpt.load()
    assert state is not None and state["batch_index"] >= 2
    run_batch.resumed = True
    out = run_checkpointed(100, 10, run_batch, ckpt, checkpoint_every=2)
    assert out["shots_done"] == 100
    assert out["counts"]["failed"] == sum(range(10))
    # batches before the checkpoint were not re-run
    assert sorted(set(calls))[:2] == [0, 1]


def test_metrics():
    m = RunMetrics()
    m.add(shots=100, failed=3)
    with m.time_span("decode"):
        pass
    s = m.summary()
    assert s["ler"] == 0.03
    lo, hi = s["ler_ci95"]
    assert lo < 0.03 < hi
    assert "decode" in s["spans"]
    assert wilson_interval(0, 0) == (0.0, 1.0)
    assert 0 < ler_per_round(0.1, 10) < 0.1
    assert rates_compatible(254, 10000, 102, 4096)  # the two golden LER runs
    assert not rates_compatible(254, 10000, 800, 4096)


def test_mesh_shard_decode_multichip():
    # 8 virtual CPU devices from conftest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from slidingwindowdecoder_tpu.codes import bb_code_by_n

    code, _, _ = bb_code_by_n(72)
    mesh = make_shot_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    errs = (rng.random((32, code.N)) < 0.01).astype(np.uint8)
    synds = (errs @ code.hx.T) % 2
    out = shard_decode_step(mesh, code.hx, np.full(code.N, 0.01), synds, num_iter=16)
    err = np.asarray(out["error"])
    resid = (err.astype(int) @ code.hx.T + synds) % 2
    failed = resid.any(axis=1).sum()
    assert int(out["num_errors"]) == failed


def test_sharded_window_pipeline_matches_single():
    """The flagship sliding-window BPOSD pipeline, run (a) with the host
    window loop, (b) as jitted device steps on one device, and (c) under
    shard_map on an 8-device mesh, must produce bit-identical corrections
    (per-shot results are independent of batch placement)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window,
        decode_sliding_window_sharded,
        evaluate_logical_errors,
        evaluate_logical_errors_sharded,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        72, 0.004, 3, 3, 1, method=1
    )
    rng = np.random.default_rng(7)
    det, obs, _ = sample_dem_numpy(dem, 32, rng)
    factory = CachingDecoderFactory(
        lambda spec: BPOSD(
            spec.mat,
            spec.prior,
            max_iter=60,
            phase_a_iters=8,
            osd_method="osd_cs",
            osd_order=4,
            bp_bucket=8,
            osd_bucket=8,
        )
    )
    ref = decode_sliding_window(
        plan, det, factory, verbose=False, collect_window_stats=False
    )
    single = decode_sliding_window_sharded(plan, det, factory)
    np.testing.assert_array_equal(
        np.asarray(ref["total_e_hat"]), np.asarray(single["total_e_hat"])
    )
    mesh = make_shot_mesh(jax.devices()[:8])
    sharded = decode_sliding_window_sharded(plan, det, factory, mesh)
    np.testing.assert_array_equal(
        np.asarray(ref["total_e_hat"]), np.asarray(sharded["total_e_hat"])
    )
    ev = evaluate_logical_errors(plan, det, obs, ref["total_e_hat"])
    evs = evaluate_logical_errors_sharded(
        plan, det, obs, sharded["total_e_hat"], mesh
    )
    assert evs["num_failed"] == ev["num_failed"]
    assert evs["num_flagged"] == ev["num_flagged"]


def test_cli_smoke():
    out = subprocess.run(
        [
            sys.executable, "-m", "slidingwindowdecoder_tpu.harness.cli",
            "code-capacity", "--N", "72", "--p", "0.02", "--shots", "64",
            "--decoder", "bposd", "--osd-order", "2", "--quiet",
        ],
        capture_output=True,
        text=True,
        timeout=500,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["bposd"]["shots"] == 64
