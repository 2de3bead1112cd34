#!/usr/bin/env python
"""GDG ensemble throughput sweep: bucket size x message dtype.

The SW GDG parity run (gdg-144-w3) decodes ~20 shots/s against the
reference CPU's 73 shots/s — the vmapped ensemble is dispatch/overhead
bound at the default 64-shot bucket. This sweeps the ensemble bucket and
message dtype on one representative window to pick harness defaults.

Run on the TPU (chip exclusive): python tools/bench_gdg_sweep.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=2024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders.gdg import GDG
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )

    # gdg-144-w3 settings (BASELINE row 10): p=0.005, pre-BP 8
    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    base = None
    for bucket in (64, 128, 256):
        for dt in ("float32", "bfloat16"):
            dec = GDG(
                np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8,
                ensemble_bucket=bucket, msg_dtype=dt,
            )
            t0 = time.perf_counter()
            out = dec.decode_batch_device(synds)
            jax.block_until_ready(out["error"])
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = dec.decode_batch_device(synds)
            jax.block_until_ready(out["error"])
            dt_run = time.perf_counter() - t0
            nerr = int(np.asarray(out["converged"]).sum())
            errs = np.asarray(out["error"])
            if base is None:
                base = errs
                same = "ref"
            else:
                same = "SAME" if np.array_equal(base, errs) else "DIFFERS"
            print(
                f"bucket={bucket:4d} dtype={dt:9s}: {dt_run:6.2f}s "
                f"({args.shots / dt_run:7.1f} shots/s) warm {warm:6.1f}s "
                f"conv {nerr}/{args.shots} errors-vs-f32-64: {same}",
                flush=True,
            )


if __name__ == "__main__":
    main()
