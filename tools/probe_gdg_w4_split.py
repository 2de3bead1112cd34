#!/usr/bin/env python
"""Cost split of one W=4 GDG ensemble step: BP burst alone vs
select_vn stats vs decimate+peel vs full step. Run on chip."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *args, n=8):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


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
    from slidingwindowdecoder_tpu.decoders import gdg as G
    from slidingwindowdecoder_tpu.decoders.gdg import GDG, _ensemble_init
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp, bp_run
    from slidingwindowdecoder_tpu.ops.decimation import peel, vn_set_values

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
    pre = decode_bp(garr, llr, synds, num_iter=16, alpha=1.0, clip=50.0,
                    msg_dtype=args.dtype)
    vn0, cn0, cd0, dead0, order = dec._shorten_state(synds, pre["llr_sum"])
    carry, synd, llr_b, branch_of_row, order_b = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB,
        args.dtype, args.dtype,
    )
    tt = G.tile_branch_tables(
        {k: dec._tables[k] for k in
         ("flip_now", "reinit", "A", "A_sum", "budget")}, args.shots)
    budget_row = tt["budget_row"]
    BN = synd.shape[0]
    print(f"BN {BN}, mv {carry[0].shape} {carry[0].dtype}, "
          f"hist {carry[1].shape} {carry[1].dtype}", flush=True)

    d = jnp.int32(5)
    kw = dict(num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor,
              clip=dec.clip, low_error_mode=dec.low_error_mode,
              msg_dtype=dec.msg_dtype)
    T = dec._tables

    @jax.jit
    def full(c, llr_b, synd, order_b, tt):
        return G._ensemble_step(
            garr, llr_b, synd, order_b, tt["budget_row"], tt["flipT"],
            tt["reinitT"], tt["AT"], tt["AsumT"], d, c, None, **kw)
    t_full = bench("full step", full, carry, llr_b, synd, order_b, tt)

    @jax.jit
    def bponly(c, llr_b, synd):
        (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
         converged, conv_pm, conv_error, iters) = c
        mv, history, error, bp_done, iters, sh = bp_run(
            garr, mv, llr_b, synd, vn_state, cn_state, history, error,
            halted, iters, num_iter=dec.num_iter_per_step,
            alpha=dec.gdg_factor, clip=dec.clip, msg_dtype=dec.msg_dtype,
            return_synd=True, io_layout="slot_major", history_mode="tail")
        return mv, history, error, bp_done, iters, sh
    t_bp = bench("bp burst (6 it)", bponly, carry, llr_b, synd)

    mv, history, error, bp_done, iters, synd_hat = jax.block_until_ready(
        bponly(carry, llr_b, synd))
    (_, _, _, vn_state, cn_state, cn_degree, dead, halted,
     *_rest) = carry
    active = ~halted

    @jax.jit
    def sel(history, error, synd_hat, vn_state, cn_state, cn_degree, dead,
            synd, active, branch_of_row, order_b):
        A = G._row_at(tt["AT"], 5)[:, None]
        A_sum = G._row_at(tt["AsumT"], 5)
        return G._select_and_decimate(
            garr, G._hist_stats_sm(history), error, synd, vn_state,
            cn_state, cn_degree, dead, active, A, A_sum,
            jnp.broadcast_to(False, active.shape),
            low_error_mode=dec.low_error_mode, vn_deg=garr["vn_degree"],
            synd_hat=synd_hat, scan_rank=order_b)
    t_sel = bench("select+decimate", sel, history, error, synd_hat,
                  vn_state, cn_state, cn_degree, dead, synd, active,
                  branch_of_row, order_b)

    out = sel(history, error, synd_hat, vn_state, cn_state, cn_degree,
              dead, synd, active, branch_of_row, order_b)
    vns, cns, cnd, dd2, guess_vn, favor, has_cand = jax.block_until_ready(out)

    @jax.jit
    def peelonly(vns, cns, cnd, dd):
        return peel(garr, vns, cns, cnd, dd)
    t_peel = bench("peel", peelonly, vns, cns, cnd, dd2)

    @jax.jit
    def setval(vns, cns, cnd, dd, guess_vn, favor, active):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (BN, dec.n), 1)
                  == guess_vn[:, None]) & active[:, None]
        return vn_set_values(garr, vns, cns, cnd, dd, onehot,
                             jnp.broadcast_to(favor[:, None], (BN, dec.n)))
    t_set = bench("vn_set_values", setval, vns, cns, cnd, dd2, guess_vn,
                  favor, active)

    @jax.jit
    def hstats(h):
        return G._hist_stats_sm(h)
    t_h = bench("hist_stats alone", hstats, history)

    print(f"sum of parts {1e3 * (t_bp + t_sel + t_peel + t_set):.1f} ms vs "
          f"full {1e3 * t_full:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
