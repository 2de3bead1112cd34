#!/usr/bin/env python
"""Op-level profile of one W=4 GDG _ensemble_step launch at full BN.

Prints top HLO ops by device self time so the step's 10-30x gap to raw
chip bandwidth (tools/probe_gdg_w4_split.py vs the raw copy microbench)
is attributed to specific ops."""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=256)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--what", type=str, default="step",
                    choices=("step", "bp", "select"))
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
    carry, synd, llr_b, branch_of_row, order_b = _ensemble_init(
        garr, llr, synds, order, vn0, cn0, cd0, dead0, dec.NB,
        args.dtype, args.dtype,
    )
    budget_row = dec._tables["budget"][branch_of_row]
    T = dec._tables
    d = jnp.int32(5)
    kw = dict(num_iter=dec.num_iter_per_step, alpha=dec.gdg_factor,
              clip=dec.clip, low_error_mode=dec.low_error_mode,
              msg_dtype=dec.msg_dtype)

    if args.what == "step":
        tt = G.tile_branch_tables(
            {k: T[k] for k in ("flip_now", "reinit", "A", "A_sum", "budget")},
            args.shots)

        @jax.jit
        def fn(c, llr_b, synd, order_b, tt):
            return G._ensemble_step(
                garr, llr_b, synd, order_b, tt["budget_row"], tt["flipT"],
                tt["reinitT"], tt["AT"], tt["AsumT"], d, c, None, **kw)
        fargs = (carry, llr_b, synd, order_b, tt)
    elif args.what == "bp":
        @jax.jit
        def fn(c, llr_b, synd):
            (mv, history, error, vn_state, cn_state, cn_degree, dead,
             halted, *_r) = c
            return bp_run(
                garr, mv, llr_b, synd, vn_state, cn_state, history, error,
                halted, c[11], num_iter=dec.num_iter_per_step,
                alpha=dec.gdg_factor, clip=dec.clip, msg_dtype=dec.msg_dtype,
                return_synd=True, io_layout="slot_major",
                history_mode="tail", hist_update="slice",
                state_layout="transposed")
        fargs = (carry, llr_b, synd)
    else:
        tt = G.tile_branch_tables(
            {k: T[k] for k in ("flip_now", "reinit", "A", "A_sum", "budget")},
            args.shots)

        @jax.jit
        def fn(c, synd, order_b, tt):
            (mv, history, error, vn_state, cn_state, cn_degree, dead,
             halted, *_r) = c
            return G._select_and_decimate_t(
                garr, G._hist_stats_sm(history), synd, vn_state,
                cn_state, cn_degree, dead, ~halted,
                G._row_at(tt["AT"], 5), G._row_at(tt["AsumT"], 5),
                jnp.broadcast_to(False, halted.shape),
                low_error_mode=dec.low_error_mode,
                vn_deg=garr["vn_degree"], synd_hat_t=synd,
                scan_rank_t=order_b)
        fargs = (carry, synd, order_b, tt)

    out = jax.block_until_ready(fn(*fargs))
    tdir = tempfile.mkdtemp(prefix="w4step_")
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*fargs)
        jax.block_until_ready(out)
        print(f"traced 4x {args.what}: {(time.perf_counter()-t0)/4*1e3:.1f} "
              "ms each", flush=True)

    xs = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in xs:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            total = defaultdict(int)
            count = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_names.get(ev.metadata_id, "?")
                    total[nm] += ev.duration_ps
                    count[nm] += 1
            rows = sorted(total.items(), key=lambda kv: -kv[1])
            gtot = sum(total.values())
            print(f"== plane {plane.name}: {gtot/1e12*1e3:.1f} ms total")
            for nm, ps in rows[: args.top]:
                print(f"{ps/1e9/4:10.3f} ms {count[nm]:>6}x  {nm[:110]}")


if __name__ == "__main__":
    main()
