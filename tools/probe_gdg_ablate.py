#!/usr/bin/env python
"""Timing ablations inside the GDG ensemble step (W=3 window 5).

Each variant removes one component of the per-step work (as a TIMING
probe only — results are not semantically valid decodes for the patched
variants) so the step-cost budget is measurable on chip:

  full        the production spans ensemble (bf16)
  bp1         num_iter_per_step=1 (BP burst share: full - bp1 ~ 5 iters)
  no_peel     peel patched to identity (peel share)
  low_err     low_error_mode=True (drops num_flip gather + C/D/A rules)
  no_reinit   side-branch message reinit patched out
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
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--configs", type=str, default="full,bp1,no_peel,low_err")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import gdg as G
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(2024)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    real_peel = G.peel

    def run(name, *, patch_peel=False, low_err=False, num_iter=6):
        G.peel = (lambda garr, v, c, d, dd: (v, c, d, dd)) if patch_peel \
            else real_peel
        dec = G.GDG(
            np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8,
            max_iter_per_step=num_iter, ensemble_bucket=args.bucket,
            ensemble_mode="spans", msg_dtype="bfloat16",
            low_error_mode=low_err,
        )
        o = dec.decode_batch_device(synds)
        jax.block_until_ready(o["error"])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            o = dec.decode_batch_device(synds)
            jax.block_until_ready(o["error"])
            best = min(best, time.perf_counter() - t0)
        conv = int(np.asarray(o["converged"]).sum())
        print(f"{name:10s}: {best:6.2f}s ({args.shots/best:7.1f} sh/s) "
              f"conv {conv}", flush=True)
        G.peel = real_peel

    names = args.configs.split(",")
    if "full" in names:
        run("full")
    if "bp1" in names:
        run("bp1", num_iter=1)
    if "no_peel" in names:
        run("no_peel", patch_peel=True)
    if "low_err" in names:
        run("low_err", low_err=True)


if __name__ == "__main__":
    main()
