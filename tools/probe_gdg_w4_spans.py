#!/usr/bin/env python
"""Probe: does the span-compacted ensemble survive the TPU worker on the
W>=4 window graphs that crash the fused form? (docs/GDG_W4_CRASH.md)

Runs one [[288]] W=4 window with the reference's f83f0070 ensemble params
in the requested mode and compares against host_loop output.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=256)
    ap.add_argument("--mode", type=str, default="spans")
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--row-bucket", type=int, default=2048)
    ap.add_argument("--check", action="store_true",
                    help="also run host_loop and compare bit-for-bit")
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
        288, 0.005, 18, 4, 1, method=1
    )
    rng = np.random.default_rng(11)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)
    print(f"window mat {np.asarray(spec.mat).shape}", flush=True)

    kw = dict(
        max_iter=16, max_iter_per_step=6, max_step=60, max_tree_depth=4,
        max_side_depth=20, max_tree_branch_step=40, max_side_branch_step=40,
        ensemble_bucket=args.bucket,
    )
    dec = GDG(np.asarray(spec.mat), np.asarray(spec.prior),
              ensemble_mode=args.mode, row_bucket=args.row_bucket, **kw)
    print(f"NB={dec.NB} D_max={dec.D_max} spans={dec.ensemble_spans}",
          flush=True)
    t0 = time.perf_counter()
    out = dec.decode_batch_device(synds)
    jax.block_until_ready(out["error"])
    print(f"[{args.mode}] warm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = dec.decode_batch_device(synds)
    jax.block_until_ready(out["error"])
    dt = time.perf_counter() - t0
    nconv = int(np.asarray(out["converged"]).sum())
    print(f"[{args.mode}] {dt:.2f}s ({args.shots / dt:.1f} sh/s) conv "
          f"{nconv}/{args.shots}", flush=True)

    if args.check:
        dec_h = GDG(np.asarray(spec.mat), np.asarray(spec.prior),
                    ensemble_mode="host_loop", **kw)
        t0 = time.perf_counter()
        out_h = dec_h.decode_batch_device(synds)
        jax.block_until_ready(out_h["error"])
        dt_h = time.perf_counter() - t0
        same = np.array_equal(np.asarray(out["error"]),
                              np.asarray(out_h["error"]))
        convs = np.array_equal(np.asarray(out["converged"]),
                               np.asarray(out_h["converged"]))
        print(f"[host_loop] {dt_h:.2f}s ({args.shots / dt_h:.1f} sh/s); "
              f"error {'SAME' if same else 'DIFFERS'} "
              f"converged {'SAME' if convs else 'DIFFERS'}", flush=True)


if __name__ == "__main__":
    main()
