#!/usr/bin/env python
"""Phase-timed GDG throughput probe on one representative W=3 window.

Measures pre-BP vs ensemble split and the effect of bucket size, message
dtype, and the fused all-halted early exit. Run on the TPU.
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
    ap.add_argument("--configs", type=str, default="")
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
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    CONFIGS = {
        "base_b64_f32": dict(ensemble_bucket=64),
        "b256_f32": dict(ensemble_bucket=256),
        "b256_bf16": dict(ensemble_bucket=256, msg_dtype="bfloat16"),
        "spans_b256": dict(ensemble_bucket=256, ensemble_mode="spans"),
        "spans_b256_bf16": dict(ensemble_bucket=256, ensemble_mode="spans",
                                msg_dtype="bfloat16"),
        "spans_b512_bf16": dict(ensemble_bucket=512, ensemble_mode="spans",
                                msg_dtype="bfloat16"),
        "spans_b512_bf16_rb4k": dict(ensemble_bucket=512,
                                     ensemble_mode="spans",
                                     msg_dtype="bfloat16", row_bucket=4096),
        "spans_b512_bf16_h16": dict(ensemble_bucket=512,
                                    ensemble_mode="spans",
                                    msg_dtype="bfloat16",
                                    hist_dtype="bfloat16"),
        "spans_b1024_bf16_h16": dict(ensemble_bucket=1024,
                                     ensemble_mode="spans",
                                     msg_dtype="bfloat16",
                                     hist_dtype="bfloat16"),
    }
    if args.configs:
        names = args.configs.split(",")
        CONFIGS = {k: v for k, v in CONFIGS.items() if k in names}

    # phase split: how much is pre-BP alone?
    dec0 = GDG(np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8)
    pre = jax.jit(
        lambda s: decode_bp(dec0.garr, dec0._llr_dev, s, num_iter=8,
                            alpha=1.0, clip=50.0)
    )
    out = pre(synds)
    jax.block_until_ready(out["converged"])
    t0 = time.perf_counter()
    out = pre(synds)
    jax.block_until_ready(out["converged"])
    nsurv = int(np.asarray(~out["converged"]).sum())
    print(f"pre-BP(8): {time.perf_counter() - t0:.3f}s  survivors "
          f"{nsurv}/{args.shots}", flush=True)

    base = None
    for name, kw in CONFIGS.items():
        dec = GDG(np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8,
                  **kw)
        t0 = time.perf_counter()
        o = dec.decode_batch_device(synds)
        jax.block_until_ready(o["error"])
        warm = time.perf_counter() - t0
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            o = dec.decode_batch_device(synds)
            jax.block_until_ready(o["error"])
            best = min(best, time.perf_counter() - t0)
        errs = np.asarray(o["error"])
        nconv = int(np.asarray(o["converged"]).sum())
        if base is None:
            base, same = errs, "ref"
        else:
            same = "SAME" if np.array_equal(base, errs) else "DIFFERS"
        print(f"{name:18s}: {best:6.2f}s ({args.shots / best:7.1f} sh/s) "
              f"warm {warm:5.1f}s conv {nconv} [{same}]", flush=True)


if __name__ == "__main__":
    main()
