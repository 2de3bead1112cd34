#!/usr/bin/env python
"""Scaling-efficiency probe for the sharded sliding-window pipeline.

Runs on the virtual CPU mesh (no multi-chip hardware in this environment):

1. *Structural check*: compiles every window step of the flagship [[144]]
   W=3 BP+OSD pipeline under shard_map on an 8-device mesh and asserts the
   optimized HLO contains NO cross-device collectives (all-reduce /
   all-gather / collective-permute / all-to-all). Decode state is fully
   shard-local; the only collective in the whole Monte-Carlo is the final
   scalar count psum — so multi-chip scaling is communication-free by
   construction.
2. *Weak scaling measurement*: fixed per-device batch, mesh size 1 vs 2
   (this host has 2 physical cores; virtual devices beyond that share
   cores and measure nothing).

Writes SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "collective-permute",
    "all-to-all",
    "reduce-scatter",
)


def main() -> None:
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.parallel.mesh import make_shot_mesh
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        _window_step_builder,
        decode_sliding_window_sharded,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )

    def make_factory():
        return CachingDecoderFactory(
            lambda spec: BPOSD(
                spec.mat, spec.prior, max_iter=200, osd_method="osd_cs",
                osd_order=10, bp_bucket=8, osd_bucket=8,
            )
        )

    # --- 1. structural: no collectives inside any window step ------------
    mesh8 = make_shot_mesh(jax.devices()[:8])
    axis = mesh8.axis_names[0]
    factory = make_factory()
    S = 8 * 4
    bad_ops: list[str] = []
    checked = 0
    seen = set()
    chk_t = jnp.asarray(plan.chk.T, jnp.float32)
    for spec in plan.windows:
        decoder = factory(spec)
        m_w = spec.row_end - spec.row_start
        ncommit = (
            spec.col_end if spec.is_last else spec.commit_col_end
        ) - spec.col_start
        key = (id(decoder), m_w, ncommit)
        if key in seen:
            continue
        seen.add(key)
        fn = _window_step_builder(decoder, m_w, ncommit)
        sharded = jax.shard_map(
            fn, mesh=mesh8,
            in_specs=(P(axis, None), P(axis, None), P(None, None), P(), P()),
            out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        )
        det = jnp.zeros((S, plan.chk.shape[0]), jnp.uint8)
        tot = jnp.zeros((S, plan.chk.shape[1]), jnp.uint8)
        sl = chk_t[spec.col_start : spec.col_start + ncommit]
        hlo = (
            jax.jit(sharded)
            .lower(det, tot, sl, jnp.int32(spec.row_start), jnp.int32(spec.col_start))
            .compile()
            .as_text()
        )
        checked += 1
        for op in COLLECTIVES:
            if op in hlo:
                bad_ops.append(f"window {spec.index}: {op}")
    print(f"structural: {checked} distinct window steps compiled on the "
          f"8-device mesh; collectives found: {bad_ops or 'NONE'}")

    # --- 2. weak scaling: fixed per-device batch over 1/2/4/8 devices ----
    # This host has 2 physical cores, so WALL time beyond 2 virtual
    # devices measures core timesharing, not sharding overhead. The
    # host-measurable invariant is total CPU seconds per shot: with no
    # collectives, each device executes an identical independent program,
    # so if cpu-s/shot stays flat as the mesh grows, the per-device STEP
    # TIME on real hardware (one core per chip's dispatch) is invariant —
    # the sharded program adds no per-device work with mesh size.
    per_dev = 64
    results = {}
    cpu_per_shot = {}
    for ndev in (1, 2, 4, 8):
        mesh = make_shot_mesh(jax.devices()[:ndev])
        factory = make_factory()
        S = per_dev * ndev
        rng = np.random.default_rng(0)
        det, obs, _ = sample_dem_numpy(dem, S, rng)

        def run():
            out = decode_sliding_window_sharded(plan, det, factory, mesh)
            jax.block_until_ready(out["total_e_hat"])

        run()  # compile
        best_wall, best_cpu = float("inf"), float("inf")
        for _ in range(2):
            c0 = time.process_time()
            t0 = time.perf_counter()
            run()
            best_wall = min(best_wall, time.perf_counter() - t0)
            best_cpu = min(best_cpu, time.process_time() - c0)
        results[ndev] = S / best_wall
        cpu_per_shot[ndev] = best_cpu / S
        print(f"mesh={ndev}: {S} shots wall {best_wall:.2f}s "
              f"({S/best_wall:.1f} shots/s), cpu {best_cpu:.2f}s "
              f"({best_cpu/S*1e3:.1f} cpu-ms/shot)")

    eff_wall2 = results[2] / (2 * results[1])
    step_eff = {
        str(n): round(cpu_per_shot[1] / cpu_per_shot[n], 4)
        for n in (2, 4, 8)
    }
    out = {
        "structural_collectives_in_window_steps": bad_ops,
        "structurally_communication_free": not bad_ops,
        "weak_scaling_shots_per_sec": {str(k): round(v, 2) for k, v in results.items()},
        "weak_scaling_efficiency_2dev_wall": round(eff_wall2, 4),
        "cpu_ms_per_shot": {
            str(k): round(v * 1e3, 2) for k, v in cpu_per_shot.items()
        },
        "step_time_efficiency_vs_1dev": step_eff,
        "note": (
            "host has 2 physical cores; wall time beyond 2 virtual devices "
            "measures core timesharing. step_time_efficiency is the "
            "cpu-seconds-per-shot ratio vs the 1-device mesh at fixed "
            "per-device batch: >=0.85 means the sharded program adds no "
            "per-device work as the mesh grows, which with the structural "
            "no-collectives check bounds real-chip weak scaling by the "
            "final scalar psum only. Values above 1.0 mean per-shot CPU "
            "work FELL as the mesh grew: the per-window dispatch/fixed "
            "cost amortizes over the larger global batch, so the 1-device "
            "baseline is the pessimistic end, not the sharded meshes."
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
