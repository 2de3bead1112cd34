#!/usr/bin/env python
"""Reproduce the in-situ last-window slowdown: run the full [[144]] W=3
GDG pipeline at small shots under different (mode, bucket) configs and
report per-window wall times. The gdg-144-w3 re-measurement saw window 10
take 960s (spans/256) where round-2 fused/64 took 42s at 4x the shots."""

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
    ap.add_argument("--configs", type=str, default="spans256,spans64,fused64")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        sliding_window_gdg,
    )

    CONF = {
        "spans256": dict(ensemble_mode="spans", ensemble_bucket=256),
        "spans64": dict(ensemble_mode="spans", ensemble_bucket=64),
        "fused64": dict(ensemble_mode="fused", ensemble_bucket=64),
        # span-count isolation: one span == fused work + ONE compaction
        "spans64_one": dict(ensemble_mode="spans", ensemble_bucket=64,
                            ensemble_spans=(25,)),
        "spans64_two": dict(ensemble_mode="spans", ensemble_bucket=64,
                            ensemble_spans=(13, 12)),
    }
    for name in args.configs.split(","):
        t0 = time.perf_counter()
        res = sliding_window_gdg(
            N=144, p=0.005, num_repeat=12, num_shots=args.shots, max_iter=8,
            W=3, F=1, seed=77, verbose=True, **CONF[name],
        )
        print(f"[{name}] total {time.perf_counter() - t0:.1f}s decode "
              f"{res['decode_seconds']:.1f}s fails {res['num_failed']}",
              flush=True)


if __name__ == "__main__":
    main()
