#!/usr/bin/env python
"""Measure (a) the per-step active-row distribution of the GDG ensemble and
(b) the cost split of one ensemble step (BP burst vs select/peel machinery).

Drives tuning decisions: if rows halt early, span-compaction pays; if the
non-BP machinery dominates, fuse/cheapen select+peel first."""

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
    from slidingwindowdecoder_tpu.ops.bp import bp_run

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[5]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    dec = GDG(np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8)
    garr, llr = dec.garr, dec._llr_dev

    # shorten + init exactly as core() does
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    pre = decode_bp(garr, llr, synds, num_iter=8, alpha=1.0, clip=50.0)
    surv = np.asarray(~pre["converged"])
    print(f"survivors {surv.sum()}/{args.shots}", flush=True)
    vn0, cn0, cd0, dead0, order = dec._shorten_state(synds, pre["llr_sum"])

    carry, synd, llr_b, branch_of_row, order_b = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB
    )
    budget_row = dec._tables["budget"][branch_of_row]
    BN = synd.shape[0]
    print(f"rows {BN} (= {args.shots} x {dec.NB} lanes), D_max {dec.D_max}",
          flush=True)

    step = lambda d, c: _ensemble_step(
        garr, llr_b, synd, order_b, branch_of_row, budget_row,
        dec._tables["flip_now"], dec._tables["reinit"], dec._tables["A"],
        dec._tables["A_sum"], jnp.int32(d), c,
        num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor, clip=dec.clip,
        low_error_mode=dec.low_error_mode, msg_dtype=dec.msg_dtype,
    )

    active_hist = []
    conv_hist = []
    for d in range(dec.D_max):
        carry = step(d, carry)
        halted = np.asarray(carry[7])
        finished = halted | (d + 1 >= np.asarray(budget_row))
        active_hist.append(int((~finished).sum()))
        conv_hist.append(int(np.asarray(carry[8]).sum()))
    print("active rows per step:", active_hist, flush=True)
    print("cum converged rows  :", conv_hist, flush=True)
    shot_conv = np.asarray(carry[8]).reshape(args.shots, dec.NB).any(1)
    print(f"shots with any converged lane: {shot_conv.sum()}/{args.shots}",
          flush=True)

    # --- cost split: full step vs BP burst only, at the bucketed shape ----
    bucket = 64
    sb = synds[:bucket]
    vnb, cnb, cdb, db = (x[: bucket] for x in (vn0, cn0, cd0, dead0))
    carry_b, synd_b, llr_bb, bor_b, ord_b = _ensemble_init(
        garr, llr, sb, order[:bucket], vnb, cnb, cdb, db, dec.NB
    )
    budget_b = dec._tables["budget"][bor_b]

    stepb = jax.jit(lambda c: _ensemble_step(
        garr, llr_bb, synd_b, ord_b, bor_b, budget_b,
        dec._tables["flip_now"], dec._tables["reinit"], dec._tables["A"],
        dec._tables["A_sum"], jnp.int32(0), c,
        num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor, clip=dec.clip,
        low_error_mode=dec.low_error_mode, msg_dtype=dec.msg_dtype,
    ))

    def bponly(c):
        (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
         converged, conv_pm, conv_error, iters) = c
        mv, history, error, bp_done, iters, _synd = bp_run(
            garr, mv, llr_bb, synd_b, vn_state, cn_state, history, error,
            halted, iters, num_iter=dec.num_iter_per_step,
            alpha=dec.gdg_factor, clip=dec.clip, msg_dtype=dec.msg_dtype,
            return_synd=True, io_layout="slot_major",
        )
        return (mv, history, error, vn_state, cn_state, cn_degree, dead,
                halted, converged, conv_pm, conv_error, iters)

    bponly = jax.jit(bponly)

    for name, fn in (("full step", stepb), ("bp burst only", bponly)):
        c = jax.block_until_ready(fn(carry_b))  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            c = fn(c)
        jax.block_until_ready(c[0])
        print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms "
              f"({bucket}x{dec.NB} rows)", flush=True)


if __name__ == "__main__":
    main()
