#!/usr/bin/env python
"""Stage-isolation probe: how the flagship pipeline's time splits across
phase-A BP, phase-B BP, and OSD (run on the real chip).

Times four decoder variants over the full 11-window pipeline:
  full        = A(24) + B(176 bucketed) + OSD-CS-10
  bp_only     = A(24) + B(176 bucketed), OSD off
  phase_a     = A(24) only, OSD off
  a_plus_osd  = A(24) + OSD (no phase B)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=16384)
    args = ap.parse_args()

    import jax

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window_sharded,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(2024)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)

    VARIANTS = {
        "full": dict(max_iter=200, osd_method="osd_cs", osd_order=10),
        "bp_only": dict(max_iter=200, osd_method="off"),
        "phase_a": dict(max_iter=24, osd_method="off"),
        "a_plus_osd": dict(max_iter=24, osd_method="osd_cs", osd_order=10),
    }
    times = {}
    for name, kw in VARIANTS.items():
        factory = CachingDecoderFactory(
            lambda spec, kw=kw: BPOSD(
                spec.mat, spec.prior, ms_scaling_factor=1.0,
                bp_bucket=512, osd_bucket=1024, msg_dtype="bfloat16", **kw,
            )
        )

        def run():
            out = decode_sliding_window_sharded(plan, det, factory)
            jax.block_until_ready(out["total_e_hat"])

        print(f"[{name}] warmup ...", file=sys.stderr, flush=True)
        run()
        t0 = time.perf_counter()
        run()
        times[name] = time.perf_counter() - t0
        print(f"{name}: {times[name]:.2f}s", flush=True)

    a = times["phase_a"]
    print(f"\nphase A      : {a:.2f}s")
    print(f"phase B      : {times['bp_only'] - a:.2f}s")
    print(f"OSD          : {times['full'] - times['bp_only']:.2f}s")
    print(f"OSD (from A) : {times['a_plus_osd'] - a:.2f}s (larger todo set)")
    print(f"full         : {times['full']:.2f}s "
          f"({args.shots / times['full']:.0f} shots/s)")


if __name__ == "__main__":
    main()
