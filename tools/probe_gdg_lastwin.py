#!/usr/bin/env python
"""Probe: spans vs fused GDG on the LAST window of the [[144]] W=3
pipeline (the shape where ensemble_mode='spans' ran 25x slower than
expected in the gdg-144-w3 re-measurement)."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=2048)
    ap.add_argument("--modes", type=str, default="fused,spans")
    ap.add_argument("--window", type=int, default=-1)
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

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(7)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[args.window]
    print(f"window {spec.index}: mat {np.asarray(spec.mat).shape}",
          flush=True)
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    for mode in args.modes.split(","):
        dec = GDG(np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8,
                  ensemble_bucket=256 if mode == "spans" else 64,
                  ensemble_mode=mode)
        t0 = time.perf_counter()
        out = dec.decode_batch_device(synds)
        jax.block_until_ready(out["error"])
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = dec.decode_batch_device(synds)
        jax.block_until_ready(out["error"])
        dt = time.perf_counter() - t0
        nconv = int(np.asarray(out["converged"]).sum())
        print(f"{mode:6s}: {dt:7.2f}s ({args.shots / dt:7.1f} sh/s) warm "
              f"{warm:6.1f}s conv {nconv}/{args.shots}", flush=True)


if __name__ == "__main__":
    main()
