#!/usr/bin/env python
"""Active-row census + step cost split for the W>=4 GDG ensemble
(gdg-last-osd config: [[288]] W=4, max_step=60, tree 4 / side 20).

Prints active rows per step (drives span sizing), the converged count,
and per-step cost at the production row bucket."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=256)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders.gdg import (
        GDG,
        _ensemble_init,
        _ensemble_step,
    )
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    code, circuit, dem, plan = build_bb_window_experiment(
        288, 0.005, 6, 4, 1, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[1]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    dec = GDG(
        np.asarray(spec.mat), np.asarray(spec.prior), max_iter=16,
        max_step=60, max_tree_depth=4, max_side_depth=20,
        max_tree_branch_step=40, max_side_branch_step=40,
        msg_dtype=args.dtype, hist_dtype=args.dtype,
    )
    garr, llr = dec.garr, dec._llr_dev
    print(f"graph: n {dec.n}, m {dec.m}, new_n {dec.new_n}, "
          f"NB {dec.NB}, D_max {dec.D_max}", flush=True)
    print("mv slots:", garr["cn_vn"].shape if "cn_vn" in garr else
          {k: v.shape for k, v in garr.items() if hasattr(v, "shape")},
          flush=True)

    pre = decode_bp(garr, llr, synds, num_iter=16, alpha=1.0, clip=50.0,
                    msg_dtype=args.dtype)
    surv = np.asarray(~pre["converged"])
    print(f"survivors {surv.sum()}/{args.shots}", flush=True)
    vn0, cn0, cd0, dead0, order = dec._shorten_state(synds, pre["llr_sum"])

    carry, synd, llr_b, branch_of_row, order_b = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB,
        args.dtype, args.dtype,
    )
    budget_row = dec._tables["budget"][branch_of_row]
    BN = synd.shape[0]
    # dormancy start depths as the spans form computes them
    cp = dec._copy_plan
    start_row = None
    if cp is not None:
        lanes_np = np.arange(BN) % dec.NB
        start_np = np.maximum(np.asarray(cp[0], np.int32)[lanes_np], 0)
        start_row = jnp.asarray(start_np)
    print(f"rows {BN} (= {args.shots} x {dec.NB} lanes)", flush=True)

    step = lambda d, c: _ensemble_step(
        garr, llr_b, synd, order_b, branch_of_row, budget_row,
        dec._tables["flip_now"], dec._tables["reinit"], dec._tables["A"],
        dec._tables["A_sum"], jnp.int32(d), c, start_row,
        num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor, clip=dec.clip,
        low_error_mode=dec.low_error_mode, msg_dtype=dec.msg_dtype,
    )

    active_hist = []
    times = []
    for d in range(dec.D_max):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(step(d, carry))
        times.append(time.perf_counter() - t0)
        halted = np.asarray(carry[7])
        fin = halted | (d + 1 >= np.asarray(budget_row))
        if start_row is not None:
            fin = fin | (np.asarray(start_row) > d + 1)
        active_hist.append(int((~fin).sum()))
    print("active rows per step:", active_hist, flush=True)
    print(f"first-step t {times[1]:.3f}s (post-compile), "
          f"mean t {np.mean(times[2:]):.3f}s over full BN", flush=True)
    conv = np.asarray(carry[8]).reshape(args.shots, dec.NB).any(1)
    print(f"shots with any converged lane: {conv.sum()}/{args.shots}",
          flush=True)
    tot_act = sum(active_hist)
    print(f"total active row-steps {tot_act} = "
          f"{tot_act / (BN * dec.D_max):.1%} of BN*D_max", flush=True)


if __name__ == "__main__":
    main()
