#!/usr/bin/env python
"""Measure the BP convergence-iteration CDF per window (CPU-friendly).

Runs the real window pipeline at a modest batch and records, for each
window, the distribution of per-shot BP iterations-to-convergence under
the production decoder settings. This sizes the phase-A/phase-B split:
phase A costs ``it_a`` full-batch iterations regardless, while every shot
still unconverged at ``it_a`` enters the bucket walk.

Usage: JAX_PLATFORMS=cpu python tools/conv_cdf.py [--shots 4096]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=4096)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--seed", type=int, default=2024)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)

    stats = []

    class RecordingBPOSD(BPOSD):
        def decode_batch_device(self, synds):
            out = super().decode_batch_device(synds)
            iters = np.asarray(out["iterations"])
            done = np.asarray(out["converged"])
            stats.append((iters, done))
            return out

    factory = CachingDecoderFactory(
        lambda spec: RecordingBPOSD(
            spec.mat,
            spec.prior,
            max_iter=args.max_iter,
            ms_scaling_factor=1.0,
            osd_method="osd_cs",
            osd_order=10,
            phase_a_iters=None,  # single span: iters == true convergence iter
        )
    )
    decode_sliding_window(plan, det, factory, verbose=False)

    print(f"shots={args.shots} max_iter={args.max_iter}")
    marks = [4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 200]
    print("win  " + "".join(f">{k:<5}" for k in marks) + " unconv")
    agg = np.zeros(len(marks))
    for w, (iters, done) in enumerate(stats):
        row = [np.mean(iters > k) for k in marks]
        agg += row
        print(
            f"{w:3d}  "
            + "".join(f"{r:6.3f}" for r in row)
            + f" {np.mean(~done):.4f}"
        )
    agg /= len(stats)
    print("avg  " + "".join(f"{r:6.3f}" for r in agg))
    # expected full-batch iteration cost per shot for a given phase-A cut:
    # it_a (everyone) vs survivors * remaining budget if run naively
    for it_a in (8, 12, 16, 24, 32):
        surv = np.mean(
            [np.mean(it > it_a) for it, _ in stats]
        )
        print(
            f"phase_a={it_a:3d}: survivors/window {surv:.3%}"
        )


if __name__ == "__main__":
    main()
