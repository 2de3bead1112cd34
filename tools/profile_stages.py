#!/usr/bin/env python
"""Stage-level timing of the flagship sliding-window BP+OSD pipeline.

Breaks the per-window decode into its stages (phase-A BP on the full
batch, phase-B BP buckets on non-converged shots, OSD buckets, feedback
mat-mul) and prints the aggregate seconds per stage. Timing is
block_until_ready-exact per stage, so the total is slightly above the
fused pipeline's wall clock.
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
    ap.add_argument("--shots", type=int, default=16384)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--phase-a", type=int, default=24)
    ap.add_argument("--bucket", type=int, default=2048,
                    help="phase-B BP bucket (production default 2048)")
    ap.add_argument("--osd-bucket", type=int, default=256)
    ap.add_argument("--msg-dtype", type=str, default="bfloat16")
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
    from slidingwindowdecoder_tpu.ops.bp import bp_init_messages, fresh_bp_state
    from slidingwindowdecoder_tpu.ops.gf2_solve import osd_decode
    from slidingwindowdecoder_tpu.windows.pipeline import CachingDecoderFactory

    code, circuit, dem, plan = build_bb_window_experiment(144, 0.004, 12, 3, 1,
                                                          method=1)
    rng = np.random.default_rng(args.seed)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)

    factory = CachingDecoderFactory(
        lambda spec: BPOSD(
            spec.mat, spec.prior, max_iter=args.max_iter,
            ms_scaling_factor=1.0, osd_method="osd_cs", osd_order=10,
            bp_bucket=args.bucket, osd_bucket=args.osd_bucket,
            msg_dtype=args.msg_dtype,
            phase_a_iters=args.phase_a,
        )
    )

    stats = {"bpA": 0.0, "bpB": 0.0, "osd": 0.0, "feedback": 0.0, "host": 0.0}
    counts = {"bpA_shots": 0, "bpB_shots": 0, "osd_shots": 0}

    def run_once(record: bool):
        det_dev = jnp.asarray(det, jnp.uint8)
        chk_t = jnp.asarray(plan.chk.T, jnp.float32)
        S = det_dev.shape[0]
        total_e_hat = jnp.zeros((S, plan.chk.shape[1]), jnp.uint8)
        new_det = det_dev
        for spec in plan.windows:
            dec = factory(spec)
            synd = new_det[:, spec.row_start : spec.row_end]
            B = synd.shape[0]
            n = dec.n

            t0 = time.perf_counter()
            vn_state = jnp.full((B, n), -1, jnp.int8)
            cn_state = synd.astype(jnp.int8)
            mv = bp_init_messages(dec.garr, dec._llr_dev, B)
            history, error, done, iters = fresh_bp_state(dec.garr, B)
            it_a, it_b = dec.phase_iters
            osd_on = dec.osd_method is not None
            mv, history, error, done, iters = dec._run_bp(
                mv, synd, vn_state, cn_state, history, error, done, iters, it_a,
                history_mode="tail" if (it_b == 0 and osd_on) else "none",
            )
            jax.block_until_ready(done)
            if record:
                stats["bpA"] += time.perf_counter() - t0
                counts["bpA_shots"] += B

            t0 = time.perf_counter()
            conv_host = np.asarray(done)
            todo = np.nonzero(~conv_host)[0]
            if record:
                stats["host"] += time.perf_counter() - t0

            def bucket_indices(chunk, bucket):
                g = np.full(bucket, int(chunk[0]), dtype=np.int32)
                g[: len(chunk)] = chunk
                s = np.full(bucket, B, dtype=np.int32)
                s[: len(chunk)] = chunk
                return jnp.asarray(g), jnp.asarray(s)

            if it_b > 0 and len(todo):
                t0 = time.perf_counter()
                bucket = max(32, dec.bp_bucket)
                for lo in range(0, len(todo), bucket):
                    chunk = todo[lo : lo + bucket]
                    g_idx, s_idx = bucket_indices(chunk, bucket)
                    sub = lambda a: jnp.take(a, g_idx, axis=0)
                    mv_c, hist_c, err_c, done_c, it_c = dec._run_bp(
                        sub(mv), sub(synd), sub(vn_state), sub(cn_state),
                        sub(history), sub(error), jnp.zeros((bucket,), bool),
                        sub(iters), it_b,
                        history_mode="tail" if osd_on else "none",
                    )
                    upd = lambda full, part: full.at[s_idx].set(part, mode="drop")
                    mv = upd(mv, mv_c)
                    history = upd(history, hist_c)
                    error = upd(error, err_c)
                    iters = upd(iters, it_c)
                    done = upd(done, done_c)
                    if record:
                        counts["bpB_shots"] += bucket
                jax.block_until_ready(done)
                if record:
                    stats["bpB"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                conv_host = np.asarray(done)
                todo = np.nonzero(~conv_host)[0]
                if record:
                    stats["host"] += time.perf_counter() - t0

            error = error.astype(jnp.uint8)
            if dec.osd_method is not None and len(todo):
                t0 = time.perf_counter()
                last_call_iters = it_b if it_b > 0 else it_a
                rel = dec._reliability(history, last_call_iters)
                bucket = max(32, dec.osd_bucket)
                for lo in range(0, len(todo), bucket):
                    chunk = todo[lo : lo + bucket]
                    g_idx, s_idx = bucket_indices(chunk, bucket)
                    osd = osd_decode(
                        dec.H_words, jnp.take(synd, g_idx, axis=0),
                        jnp.take(rel, g_idx, axis=0), dec._llr_dev,
                        dec.patterns, m=dec.m, n=dec.n, rank=dec.rank,
                        k=dec.k, meta=dec._osd_meta, engine=dec.gj_engine,
                    )
                    error = error.at[s_idx].set(
                        osd["solution"].astype(jnp.uint8), mode="drop"
                    )
                    if record:
                        counts["osd_shots"] += bucket
                jax.block_until_ready(error)
                if record:
                    stats["osd"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            if spec.is_last:
                ncommit = spec.col_end - spec.col_start
            else:
                ncommit = spec.commit_col_end - spec.col_start
            committed = error[:, :ncommit]
            total_e_hat = total_e_hat.at[
                :, spec.col_start : spec.col_start + ncommit
            ].set(committed)
            corr = jnp.mod(
                jnp.dot(committed.astype(jnp.float32),
                        chk_t[spec.col_start : spec.col_start + ncommit],
                        preferred_element_type=jnp.float32),
                2.0,
            ).astype(jnp.uint8)
            new_det = new_det ^ corr
            jax.block_until_ready(new_det)
            if record:
                stats["feedback"] += time.perf_counter() - t0
        return total_e_hat

    log("warmup ...")
    t0 = time.perf_counter()
    run_once(record=False)
    log(f"warmup {time.perf_counter()-t0:.1f}s")
    log("timed ...")
    t0 = time.perf_counter()
    out = run_once(record=True)
    total = time.perf_counter() - t0
    log(f"total {total:.2f}s ({args.shots/total:.1f} shots/s)")
    for k, v in stats.items():
        log(f"  {k:>9}: {v:7.2f}s ({100*v/total:4.1f}%)")
    for k, v in counts.items():
        log(f"  {k:>11}: {v}")


if __name__ == "__main__":
    main()
