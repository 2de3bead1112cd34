#!/usr/bin/env python
"""Micro-benchmark of the BP iteration on the flagship window graph.

Times bp_run at the bench batch size for several iteration counts so the
per-iteration cost (slope) is separated from call overhead, plus ablations
(msg dtype, convergence-check cost via an all-zero syndrome early exit).
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
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.graphs.tanner import (
        compile_graph,
        graph_device_arrays,
    )
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.004, 12, 3, 1, method=1
    )
    spec = plan.windows[1]
    garr = graph_device_arrays(compile_graph(spec.mat))
    llr = jnp.asarray(np.log((1 - spec.prior) / spec.prior).astype(np.float32))
    rng = np.random.default_rng(0)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    def timed(name, masked=False, **kw):
        def run():
            out = decode_bp(garr, llr, synds, masked=masked,
                            freeze_messages=False, history_mode="none", **kw)
            jax.block_until_ready(out["error"])
            return out

        run()  # warmup/compile
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        conv = int(jnp.sum(out["converged"]))
        print(f"{name}: {dt*1e3:.1f} ms  conv={conv}/{args.shots}", flush=True)
        return dt

    t8 = timed("bf16 it=8", num_iter=8, msg_dtype="bfloat16")
    t24 = timed("bf16 it=24", num_iter=24, msg_dtype="bfloat16")
    t48 = timed("bf16 it=48", num_iter=48, msg_dtype="bfloat16")
    print(f"bf16 per-iter (24->48 slope): {(t48 - t24) / 24 * 1e3:.2f} ms")
    timed("f32 it=24", num_iter=24, msg_dtype="float32")
    timed("masked bf16 it=24", num_iter=24, msg_dtype="bfloat16", masked=True)


if __name__ == "__main__":
    main()
