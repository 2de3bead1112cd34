#!/usr/bin/env python
"""Small-batch window-decode latency curve (reference FAQ.md:42 framing).

The reference claims ~3 ms/window worst-case on non-converged samples
(i9-13900K, 15-32 threads). This framework is throughput-oriented, but
the same question — "what does ONE window decode cost at small batch?" —
is answered here: decode latency of the flagship [[144]] W=3 window 5
(BP(200)+OSD-CS-10, the production BPOSD config) for B = 1..256, on
syndromes filtered to NON-CONVERGED shots (the hard ones that reach OSD).

Writes docs/latency_curve.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="1,16,64,256")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(7)
    det, obs, _ = sample_dem_numpy(dem, 4096, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    dec = BPOSD(
        spec.mat, spec.prior, max_iter=200, ms_scaling_factor=1.0,
        osd_method="osd_cs", osd_order=10, msg_dtype="bfloat16",
        phase_a_iters=16, phase_b_spans=(48, 136),
    )
    # hard shots: not converged by a 16-iteration probe (the OSD-bound
    # tail the reference's worst-case methodology measures, FAQ.md:42)
    pre = decode_bp(dec.garr, dec._llr_dev, synds, num_iter=16,
                    msg_dtype="bfloat16")
    hard_idx = np.flatnonzero(~np.asarray(pre["converged"]))
    log(f"hard (non-converged-at-16) shots: {len(hard_idx)}/4096")

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        idx = hard_idx[:B]
        if len(idx) < B:
            idx = np.resize(hard_idx, B)
        s = jnp.asarray(np.asarray(synds)[idx], jnp.uint8)
        t0 = time.perf_counter()
        out = dec.decode_batch_device(s)
        jax.block_until_ready(out["error"])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = dec.decode_batch_device(s)
            jax.block_until_ready(out["error"])
            times.append(time.perf_counter() - t0)
        times = np.array(times) * 1e3
        row = {
            "batch": B,
            "window_ms_p50": round(float(np.percentile(times, 50)), 2),
            "window_ms_worst": round(float(times.max()), 2),
            "ms_per_shot_p50": round(float(np.percentile(times, 50)) / B, 3),
            "compile_s": round(compile_s, 1),
        }
        rows.append(row)
        log(row)

    out = {
        "config": "[[144,12,12]] W=3 window 5, BP(200)+OSD-CS-10, bf16, "
                  "non-converged (hard) shots only",
        "reference_claim_ms_per_window": 3.0,
        "reference_source": "FAQ.md:42 (i9-13900K, 15-32 threads/shot)",
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "latency_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
