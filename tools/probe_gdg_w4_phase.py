#!/usr/bin/env python
"""Per-window phase probe for the W>=4 sliding-window GDG rows.

Runs the real pipeline (feedback included) for the gdg-last-osd /
gdg-288-41 / gdg-144-52 configs with sync_per_window timing and prints,
per window: wall seconds, non-converged-after-pre-BP count, and the
pre-BP-only seconds (decoder with max_step=0 equivalent measured via
decode_bp). Sweeps ensemble knobs passed on the command line.

Reference anchors: Sliding Window GDG.ipynb cells ccb3047b (r=6, ~33
shots/s CPU) and f83f0070 ([[288]] (4,1) r=18).
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


CFG = {
    # name: (N, p, r, W, F, max_iter, gdg_kwargs)
    "last": (288, 0.005, 6, 4, 1, 16,
             dict(max_step=60, max_tree_depth=4, max_side_depth=20,
                  max_tree_branch_step=40, max_side_branch_step=40)),
    "288-41": (288, 0.005, 18, 4, 1, 16,
               dict(max_step=60, max_tree_depth=4, max_side_depth=20,
                    max_tree_branch_step=40, max_side_branch_step=40)),
    "144-52": (144, 0.005, 12, 5, 2, 8,
               dict(max_step=40, max_tree_depth=4, max_side_depth=20,
                    max_tree_branch_step=20, max_side_branch_step=20)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="last")
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--row-bucket", type=int, default=2048)
    ap.add_argument("--span", type=int, default=0, help="0 = default spans")
    ap.add_argument("--mode", type=str, default="spans")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders.gdg import GDG
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window,
    )

    N, p, r, W, F, max_iter, gkw = CFG[args.config]
    code, circuit, dem, plan = build_bb_window_experiment(
        N, p, r, W, F, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    log(f"[{args.config}] {plan.num_windows} windows; window shapes:",
        [(s.mat.shape) for s in plan.windows])

    spans_kw = {}
    if args.span:
        spans_kw["ensemble_spans"] = None  # let decoder build from span len
    def build(spec):
        kw = dict(
            max_iter=max_iter,
            ensemble_bucket=args.bucket,
            ensemble_mode=args.mode,
            msg_dtype=args.dtype,
            hist_dtype=args.dtype,
            **gkw,
        )
        d = GDG(spec.mat, spec.prior, **kw)
        if args.row_bucket:
            d.row_bucket = args.row_bucket
        return d

    factory = CachingDecoderFactory(build)
    # compile pass
    t0 = time.perf_counter()
    decode_sliding_window(plan, det, factory, verbose=False)
    log(f"compile+first pass {time.perf_counter() - t0:.1f}s")
    # timed pass, per-window sync
    t0 = time.perf_counter()
    out = decode_sliding_window(
        plan, det, factory, verbose=False, sync_per_window=True
    )
    total = time.perf_counter() - t0
    log(f"timed pass {total:.1f}s -> {args.shots / total:.1f} shots/s")
    for i, (s, nc) in enumerate(
        zip(out["window_seconds"], out["window_nonconverged"])
    ):
        log(f"  win {i}: {s:7.2f}s  nonconv {nc}/{args.shots}")

    # pre-BP-only timing on the raw first-window syndrome (upper bound on
    # the BP share; full-batch, no ensemble)
    spec = plan.windows[0]
    d = factory(spec)
    synd = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)
    f = jax.jit(lambda s: decode_bp(
        d.garr, d._llr_dev, s, num_iter=max_iter, alpha=d.alpha,
        clip=d.clip, msg_dtype=d.msg_dtype)["converged"])
    f(synd).block_until_ready()
    t0 = time.perf_counter()
    c = f(synd)
    c.block_until_ready()
    log(f"pre-BP({max_iter}) alone, win0 full batch: "
        f"{time.perf_counter() - t0:.3f}s; conv "
        f"{int(jnp.sum(c))}/{args.shots}")


if __name__ == "__main__":
    main()
