#!/usr/bin/env python
"""Throughput sweep over pipeline/decoder configs on the real chip.

Usage: python tools/bench_sweep.py [--shots 16384]
Prints one line per config: name, seconds, shots/s, num_failed.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=16384)
    ap.add_argument("--configs", type=str, default="")
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
        decode_sliding_window,
        decode_sliding_window_sharded,
        evaluate_logical_errors,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(2024)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)

    def factory_for(kw):
        return CachingDecoderFactory(
            lambda spec: BPOSD(
                spec.mat,
                spec.prior,
                max_iter=200,
                ms_scaling_factor=1.0,
                osd_method="osd_cs",
                osd_order=10,
                **kw,
            )
        )

    CONFIGS = {
        # name: (pipeline, decoder kwargs). All bf16, phase-A 16, bp bucket
        # 2048, OSD bucket 256 (round-2 sweep winner, 1631.8 shots/s).
        # Axis under test now: the phase-B span split (re-compaction points;
        # sized from tools/conv_cdf.py survivor fractions).
        "spans_none": (
            "jit",
            dict(bp_bucket=2048, osd_bucket=256, phase_a_iters=16,
                 phase_b_spans=(184,), msg_dtype="bfloat16"),
        ),
        "spans_48_136": (
            "jit",
            dict(bp_bucket=2048, osd_bucket=256, phase_a_iters=16,
                 phase_b_spans=(48, 136), msg_dtype="bfloat16"),
        ),
        "spans_48_48_88": (
            "jit",
            dict(bp_bucket=2048, osd_bucket=256, phase_a_iters=16,
                 phase_b_spans=(48, 48, 88), msg_dtype="bfloat16"),
        ),
        "spans_48_136_b1024": (
            "jit",
            dict(bp_bucket=1024, osd_bucket=256, phase_a_iters=16,
                 phase_b_spans=(48, 136), msg_dtype="bfloat16"),
        ),
        "spans_48_136_b1024_cnpallas": (
            "jit",
            dict(bp_bucket=1024, osd_bucket=256, phase_a_iters=16,
                 phase_b_spans=(48, 136), msg_dtype="bfloat16",
                 cn_engine="pallas"),
        ),
    }
    if args.configs:
        names = args.configs.split(",")
        CONFIGS = {k: v for k, v in CONFIGS.items() if k in names}

    for name, (mode, kw) in CONFIGS.items():
        factory = factory_for(kw)

        def run():
            if mode == "host":
                out = decode_sliding_window(
                    plan, det, factory, verbose=False,
                    collect_window_stats=False,
                )
            else:
                out = decode_sliding_window_sharded(plan, det, factory)
            jax.block_until_ready(out["total_e_hat"])
            return out

        log(f"[{name}] warmup ...")
        t0 = time.perf_counter()
        run()
        log(f"[{name}] warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        ev = evaluate_logical_errors(plan, det, obs, out["total_e_hat"])
        print(
            f"{name}: {dt:.2f}s  {args.shots / dt:.1f} shots/s  "
            f"failed={ev['num_failed']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
