#!/usr/bin/env python
"""Bisect the W=4 ensemble step: time the step with phases toggled off.

Phases: bp (masked burst), sel (select_vn incl. aggressive decimation +
peel), dec (decision vn_set + peel + reinit). Run each subset end-to-end
as one jitted program from the same realistic carry, so fusion context
matches the real step (standalone phase timings over-count the jit
boundary materializations).
"""
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
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import gdg as G
    from slidingwindowdecoder_tpu.decoders.gdg import (
        GDG,
        _ensemble_init,
        _hist_stats_sm,
        _row_at,
        _select_and_decimate_t,
    )
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import bp_run, decode_bp
    from slidingwindowdecoder_tpu.ops.decimation import peel_t, vn_set_values_t

    code, circuit, dem, plan = build_bb_window_experiment(
        288, 0.005, 6, 4, 1, method=1
    )
    rng = np.random.default_rng(2024)
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
    pre = decode_bp(garr, llr, synds, num_iter=16, alpha=1.0, clip=50.0,
                    msg_dtype=args.dtype)
    vn0, cn0, cd0, dead0, order = dec._shorten_state(synds, pre["llr_sum"])
    carry, synd, llr_1d, branch_of_row, rank_t = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB,
        args.dtype, args.dtype,
    )
    tt = G.tile_branch_tables(
        {k: dec._tables[k] for k in
         ("flip_now", "reinit", "A", "A_sum", "budget")}, args.shots)
    kw = dict(num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor,
              clip=dec.clip)

    def make(do_bp, do_sel, do_dec):
        def fn(c, llr_1d, synd, rank_t, tt):
            (mv, history, error, vn_state, cn_state, cn_degree, dead,
             halted, converged, conv_pm, conv_error, iters) = c
            n, BN = vn_state.shape
            d = jnp.int32(5)
            budget_row = tt["budget_row"]
            active = ~halted & (d < budget_row)
            synd_hat = synd.astype(jnp.int8)
            if do_bp:
                mv, history, error, bp_done, iters, synd_hat = bp_run(
                    garr, mv, llr_1d, synd, vn_state, cn_state, history,
                    error, ~active, iters, num_iter=kw["num_iter"],
                    alpha=kw["alpha"], clip=kw["clip"],
                    msg_dtype=args.dtype, return_synd=True,
                    io_layout="slot_major", history_mode="tail",
                    hist_update="slice", state_layout="transposed",
                )
                newly = bp_done & active
                pm = jnp.sum(llr_1d[:, None] * (error == 1), axis=0)
                conv_pm = jnp.where(newly, pm, conv_pm)
                conv_error = jnp.where(newly[None, :], error, conv_error)
                converged = converged | newly
                halted = halted | newly
                active = active & ~newly
            guess_vn = jnp.zeros((BN,), jnp.int32)
            favor = jnp.ones((BN,), jnp.int8)
            has_cand = jnp.ones((BN,), bool)
            if do_sel:
                (vn_state, cn_state, cn_degree, dead, guess_vn, favor,
                 has_cand) = _select_and_decimate_t(
                    garr, _hist_stats_sm(history), synd, vn_state, cn_state,
                    cn_degree, dead, active, _row_at(tt["AT"], d),
                    _row_at(tt["AsumT"], d),
                    jnp.broadcast_to(d < 4, active.shape),
                    low_error_mode=dec.low_error_mode,
                    vn_deg=garr["vn_degree"], synd_hat_t=synd_hat,
                    scan_rank_t=rank_t,
                )
            if do_dec:
                halted2 = halted | (active & ~has_cand)
                value = favor
                do_set = active & ~halted2 & ~dead
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (n, BN), 0)
                    == guess_vn[None, :]
                ) & do_set[None, :]
                vn_state, cn_state, cn_degree, dead = vn_set_values_t(
                    garr, vn_state, cn_state, cn_degree, dead, onehot,
                    jnp.broadcast_to(value[None, :], (n, BN)),
                )
                vn_state, cn_state, cn_degree, dead = peel_t(
                    garr, vn_state, cn_state, cn_degree, dead
                )
                error = jnp.where(vn_state != -1, vn_state, error)
            return (mv, history, error, vn_state, cn_state, cn_degree,
                    dead, halted, converged, conv_pm, conv_error, iters)
        return jax.jit(fn)

    variants = {
        "full": (1, 1, 1),
        "bp only": (1, 0, 0),
        "sel only": (0, 1, 0),
        "dec only": (0, 0, 1),
        "bp+sel": (1, 1, 0),
    }
    for name, (b, se, de) in variants.items():
        f = make(b, se, de)
        out = jax.block_until_ready(f(carry, llr_1d, synd, rank_t, tt))
        t0 = time.perf_counter()
        for _ in range(6):
            out = f(carry, llr_1d, synd, rank_t, tt)
        jax.block_until_ready(out)
        print(f"{name:8s}: {(time.perf_counter()-t0)/6*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()


def bp_variants():
    """Compare bp_run configurations for the ensemble burst."""
    import argparse
    import time

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import gdg as G
    from slidingwindowdecoder_tpu.decoders.gdg import GDG, _ensemble_init
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import bp_run, decode_bp

    dtype = "bfloat16"
    code, circuit, dem, plan = build_bb_window_experiment(
        288, 0.005, 6, 4, 1, method=1
    )
    rng = np.random.default_rng(2024)
    det, obs, _ = sample_dem_numpy(dem, 256, rng)
    spec = plan.windows[1]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)
    dec = GDG(
        np.asarray(spec.mat), np.asarray(spec.prior), max_iter=16,
        max_step=60, max_tree_depth=4, max_side_depth=20,
        max_tree_branch_step=40, max_side_branch_step=40,
        msg_dtype=dtype, hist_dtype=dtype,
    )
    garr, llr = dec.garr, dec._llr_dev
    pre = decode_bp(garr, llr, synds, num_iter=16, alpha=1.0, clip=50.0,
                    msg_dtype=dtype)
    vn0, cn0, cd0, dead0, order = dec._shorten_state(synds, pre["llr_sum"])
    carry, synd, llr_1d, _, rank_t = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB, dtype, dtype)

    def make(freeze, ee, eng, hist="tail"):
        def fn(c, llr_1d, synd):
            (mv, history, error, vn_state, cn_state, cn_degree, dead,
             halted, *_r) = c
            return bp_run(
                garr, mv, llr_1d, synd, vn_state, cn_state, history, error,
                halted, c[11], num_iter=6, alpha=1.0, clip=50.0,
                msg_dtype=dtype, return_synd=True, io_layout="slot_major",
                history_mode=hist, hist_update="slice",
                state_layout="transposed", freeze_messages=freeze,
                early_exit=ee, cn_engine=eng,
            )
        return jax.jit(fn)

    for name, (fr, ee, eng, hm) in {
        "freeze+while+xla (current)": (True, True, "xla", "tail"),
        "nofreeze+while+xla": (False, True, "xla", "tail"),
        "freeze+fori+xla": (True, False, "xla", "tail"),
        "nofreeze+fori+xla": (False, False, "xla", "tail"),
        "nofreeze+fori+pallas": (False, False, "pallas", "tail"),
        "nofreeze+fori+pallas+histfull": (False, False, "pallas", "full"),
        "nofreeze+fori+xla+histnone": (False, False, "xla", "none"),
    }.items():
        f = make(fr, ee, eng, hm)
        out = jax.block_until_ready(f(carry, llr_1d, synd))
        t0 = time.perf_counter()
        for _ in range(8):
            out = f(carry, llr_1d, synd)
        jax.block_until_ready(out)
        print(f"{name:32s}: {(time.perf_counter()-t0)/8*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__" and os.environ.get("BP_VARIANTS"):
    bp_variants()
