#!/usr/bin/env python
"""Capture a jax.profiler trace of the in-situ window-10 GDG decode in
spans mode, and print the top device ops by total duration."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=1024)
    ap.add_argument("--mode", type=str, default="spans")
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--trace-dir", type=str, default="/tmp/gdg_lastwin_trace")
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
    from slidingwindowdecoder_tpu.windows.pipeline import (
        CachingDecoderFactory,
        decode_sliding_window,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(77)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)

    # run the pipeline up to the last window to get its in-situ detectors
    factory = CachingDecoderFactory(
        lambda spec: GDG(
            spec.mat, spec.prior, max_iter=8, ensemble_mode=args.mode,
            ensemble_bucket=args.bucket,
        )
    )
    out = decode_sliding_window(plan, det, factory, verbose=False,
                                collect_window_stats=False)
    # reconstruct the last window's input: det + committed feedback
    chk = np.asarray(plan.chk, dtype=np.int64)
    e = np.asarray(out["total_e_hat"], dtype=np.int64)
    spec = plan.windows[-1]
    new_det = (det.astype(np.int64) + e @ chk.T) % 2
    # zero the last window's own commits: recompute feedback without them
    e_before = e.copy()
    e_before[:, spec.col_start:] = 0
    new_det = (det.astype(np.int64) + e_before @ chk.T) % 2
    synds = jnp.asarray(
        new_det[:, spec.row_start : spec.row_end], jnp.uint8
    )
    w = np.asarray(synds).sum(1)
    print(f"in-situ last-window syndrome weight: mean {w.mean():.1f} "
          f"max {w.max()} nonzero {np.count_nonzero(w)}/{args.shots}",
          flush=True)

    dec = factory(spec)
    t0 = time.perf_counter()
    o = dec.decode_batch_device(synds)
    jax.block_until_ready(o["error"])
    print(f"warm decode: {time.perf_counter() - t0:.1f}s", flush=True)

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        o = dec.decode_batch_device(synds)
        jax.block_until_ready(o["error"])
        dt = time.perf_counter() - t0
    print(f"traced decode: {dt:.1f}s", flush=True)

    # parse the trace: top ops by self duration
    files = glob.glob(
        os.path.join(args.trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        print("no trace file found"); return
    with gzip.open(sorted(files)[-1], "rt") as f:
        doc = json.load(f)
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for ev in doc.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid_name = ev.get("pid")
            dur[name] += ev["dur"]
            cnt[name] += 1
    top = sorted(dur.items(), key=lambda kv: -kv[1])[:25]
    for name, d in top:
        print(f"{d/1e6:9.2f}s  x{cnt[name]:<6d} {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
