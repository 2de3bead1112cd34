#!/usr/bin/env python
"""Bisect the TPU worker crash on GDG W>=4 sliding-window graphs.

The [[144]] (5,2) and [[288]] W=4 window graphs kill the TPU worker
(UNAVAILABLE restart) inside the GDG decode at any ensemble bucket size,
while the identical workload runs fine on CPU and the W=3 graphs run fine
on TPU. Each stage of this probe compiles/executes one more layer of the
decode stack on the suspect graph so a single run identifies the faulty
layer:

  bp        decode_bp (plain pre-BP, 8 iters) on the window graph
  ensemble  gdg_ensemble alone (fori over D_max steps of masked BP +
            select/decimate), no bucket while_loop
  core      GDG.core jitted - the full while_loop{fori{scan}} nest
  steps     a hand-rolled Python loop over ensemble *steps* (each step
            jitted separately): isolates the fused fori from the step body

Usage: python tools/probe_gdg_crash.py [--stage bp|ensemble|core|steps]
       [--N 144 --W 5 --F 2] [--bucket 16] [--win 0]
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
    ap.add_argument("--stage", default="ensemble",
                    choices=["bp", "ensemble", "core", "steps", "hostcore"])
    ap.add_argument("--N", type=int, default=144)
    ap.add_argument("--r", type=int, default=12)
    ap.add_argument("--W", type=int, default=5)
    ap.add_argument("--F", type=int, default=2)
    ap.add_argument("--p", type=float, default=0.005)
    ap.add_argument("--bucket", type=int, default=16)
    ap.add_argument("--win", type=int, default=0)
    ap.add_argument("--max-iter", type=int, default=8)
    args = ap.parse_args()

    import jax

    # axon sitecustomize pins jax_platforms; honor a CPU request from env
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders.gdg import GDG
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.bp import decode_bp

    log(f"devices: {jax.devices()}")
    code, circuit, dem, plan = build_bb_window_experiment(
        args.N, args.p, args.r, args.W, args.F, method=1
    )
    spec = plan.windows[args.win]
    log(f"window {args.win}: mat {spec.mat.shape}")
    rng = np.random.default_rng(0)
    det, obs, _ = sample_dem_numpy(dem, args.bucket, rng)
    synd = np.asarray(
        det[:, spec.row_start:spec.row_end], dtype=np.uint8
    )
    log(f"syndromes {synd.shape}, weight mean {synd.sum(1).mean():.1f}")

    dec = GDG(
        spec.mat, spec.prior, max_iter=args.max_iter,
        ensemble_bucket=args.bucket,
    )
    log(f"NB={dec.NB} D_max={dec.D_max} bucket={args.bucket} "
        f"-> BN={dec.NB * args.bucket}")

    t0 = time.perf_counter()
    if args.stage == "bp":
        out = decode_bp(dec.garr, dec._llr_dev, jnp.asarray(synd),
                        num_iter=args.max_iter, alpha=dec.alpha)
        jax.block_until_ready(out["error"])
        log(f"bp ok: converged {int(out['converged'].sum())}/{args.bucket}")
    elif args.stage == "ensemble":
        s = jnp.asarray(synd)
        pre = decode_bp(dec.garr, dec._llr_dev, s, num_iter=args.max_iter,
                        alpha=dec.alpha)
        vn0, cn0, cd0, dead0, order = dec._shorten_state(s, pre["llr_sum"])
        out = dec._run_ensemble(s, order, vn0, cn0, cd0, dead0)
        jax.block_until_ready(out["error"])
        log(f"ensemble ok: converged {int(out['converged'].sum())}/{args.bucket}")
    elif args.stage == "core":
        out = dec.decode_batch_device(jnp.asarray(synd))
        jax.block_until_ready(out["error"])
        log(f"core ok: converged {int(out['converged'].sum())}/{args.bucket}")
    elif args.stage == "hostcore":
        dec.ensemble_mode = "host_loop"
        out = dec.decode_batch_device(jnp.asarray(synd))
        jax.block_until_ready(out["error"])
        log(f"hostcore ok: converged {int(out['converged'].sum())}/{args.bucket}")
    elif args.stage == "steps":
        # hand-rolled: one jitted program per ensemble *step*
        from slidingwindowdecoder_tpu.decoders import gdg as G

        s = jnp.asarray(synd)
        pre = decode_bp(dec.garr, dec._llr_dev, s, num_iter=args.max_iter,
                        alpha=dec.alpha)
        vn0, cn0, cd0, dead0, order = dec._shorten_state(s, pre["llr_sum"])
        BK = s.shape[0]
        NB = dec.NB
        BN = BK * NB
        n = dec.garr["vn_valid"].shape[0]
        tile = lambda x: jnp.repeat(x, NB, axis=0)
        synd_t = tile(s)
        vn_state, cn_state = tile(vn0), tile(cn0)
        cn_degree = tile(cd0)
        dead = tile(dead0[:, None])[:, 0]
        llr_b = jnp.broadcast_to(dec._llr_dev, (BN, n))
        branch_of_row = jnp.tile(jnp.arange(NB, dtype=jnp.int32), BK)
        tb = dec._tables
        budget_row = tb["budget"][branch_of_row]
        mv = G.bp_init_messages(dec.garr, llr_b, BN)
        history, error, _, iters = G.fresh_bp_state(dec.garr, BN)
        halted = dead
        from slidingwindowdecoder_tpu.ops.bp import bp_run
        from slidingwindowdecoder_tpu.ops.decimation import peel, vn_set_values

        @jax.jit
        def one_step(d, mv, history, error, vn_state, cn_state, cn_degree,
                     dead, halted, iters):
            active = ~halted & (d < budget_row)
            mv, history, error, bp_done, iters = bp_run(
                dec.garr, mv, llr_b, synd_t, vn_state, cn_state, history,
                error, ~active, iters, num_iter=dec.num_iter_per_step,
                alpha=dec.gdg_factor, clip=dec.clip,
            )
            halted = halted | (bp_done & active)
            active = active & ~bp_done
            A = tb["A"][branch_of_row, d][:, None]
            A_sum = tb["A_sum"][branch_of_row, d]
            (vn_state, cn_state, cn_degree, dead, guess_vn, favor,
             has_cand) = G._select_and_decimate(
                dec.garr, G._hist_stats_bm(history), error, synd_t, vn_state,
                cn_state, cn_degree, dead, active, A, A_sum,
                jnp.broadcast_to(d < 4, active.shape),
                low_error_mode=False, vn_deg=dec.garr["vn_degree"],
            )
            halted = halted | (active & ~has_cand)
            flip = tb["flip_now"][branch_of_row, d]
            value = (favor ^ flip.astype(jnp.int8)).astype(jnp.int8)
            do_set = active & ~halted & ~dead
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (BN, n), 1)
                == guess_vn[:, None]
            ) & do_set[:, None]
            vn_state, cn_state, cn_degree, dead = vn_set_values(
                dec.garr, vn_state, cn_state, cn_degree, dead, onehot,
                jnp.broadcast_to(value[:, None], (BN, n)),
            )
            vn_state, cn_state, cn_degree, dead = peel(
                dec.garr, vn_state, cn_state, cn_degree, dead
            )
            halted = halted | dead
            error = jnp.where(vn_state != -1, vn_state, error)
            return (mv, history, error, vn_state, cn_state, cn_degree, dead,
                    halted, iters)

        for d in range(dec.D_max):
            (mv, history, error, vn_state, cn_state, cn_degree, dead,
             halted, iters) = one_step(
                jnp.int32(d), mv, history, error, vn_state, cn_state,
                cn_degree, dead, halted, iters)
            jax.block_until_ready(error)
            log(f"step {d}: halted {int(halted.sum())}/{BN}")
            if bool(halted.all()):
                break
        log("steps ok")
    log(f"stage {args.stage} done in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
