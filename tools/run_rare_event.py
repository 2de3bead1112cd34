#!/usr/bin/env python
"""Rare-event code-capacity campaigns (10^7-shot scale) with checkpointing.

The round-2 parity rows for cc [[288]] OSD-CS-10 and GDG passed 3-sigma on
ZERO observed failures at 2e6 shots (reference rates 6e-7 / 1e-7) —
statistically compatible but uninformative. This driver runs the same
decoders through ``run_checkpointed`` so a campaign can be interrupted and
resumed mid-flight (exercising checkpoint/elastic for real), and emits the
same one-line JSON as tools/validate_parity.py.

    python tools/run_rare_event.py cc-osdcs --shots 10000000
    python tools/run_rare_event.py cc-gdg   --shots 10000000 \
        --stop-after-batches 100   # simulate an interruption, then rerun

State lives in docs/ckpt_<config>/ (process 0 of 1); a rerun resumes.
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


REFS = {
    # config -> (which, ref_fails, ref_shots) for [[288]] p=0.02
    "cc-osdcs": ("osdcs", 6, 10_000_000),
    "cc-gdg": ("gdg", 1, 10_000_000),
    "cc-osd0": ("osd0", 121, 10_000_000),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(REFS))
    ap.add_argument("--shots", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--seed", type=int, default=29)
    ap.add_argument("--stop-after-batches", type=int, default=None,
                    help="abort after N batches (checkpoint stays; rerun "
                    "resumes) — exercises interruption/resume")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.codes import bb_code_by_n
    from slidingwindowdecoder_tpu.decoders import BPOSD, GDG
    from slidingwindowdecoder_tpu.parallel.checkpoint import (
        MonteCarloCheckpoint,
        run_checkpointed,
    )
    from slidingwindowdecoder_tpu.utils.metrics import rates_compatible

    which, ref_fails, ref_shots = REFS[args.config]
    N, p = 288, 0.02
    code, _, _ = bb_code_by_n(N)
    priors = np.full(code.N, p)
    osd_factor = 0.625  # simulation.py:44 for N>=288
    if which == "osd0":
        dec = BPOSD(code.hx, priors, max_iter=100,
                    ms_scaling_factor=osd_factor, osd_method="osd_0")
    elif which == "osdcs":
        dec = BPOSD(code.hx, priors, max_iter=100,
                    ms_scaling_factor=osd_factor, osd_method="osd_cs",
                    osd_order=10)
    else:  # gdg: simulation.py:67-83 parameterization
        dec = GDG(
            code.hx, priors, max_iter=24, ms_scaling_factor=0.625,
            gdg_factor=0.625, max_iter_per_step=6, max_step=40,
            max_tree_depth=4, max_side_depth=20, max_tree_branch_step=30,
            max_side_branch_step=20, new_n=code.N, low_error_mode=True,
            ensemble_bucket=int(os.environ.get("SWD_RARE_BUCKET", 1024)),
            ensemble_mode=os.environ.get("SWD_GDG_MODE", "spans"),
        )
    # fully device-resident batch step (sample -> decode -> logical count
    # on chip, ~8 bytes host traffic per batch); RNG is a pure function of
    # (seed, batch_index), so interrupt/resume replays identical streams
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.harness.device_campaign import make_cc_step

    step = make_cc_step(code, p, dec, args.batch, seed=args.seed)

    def run_batch(idx, shots, rng):
        failed, _ = step(jnp.int32(idx), jnp.int32(shots))
        failed = int(failed)
        if idx % 10 == 0:
            log(f"batch {idx}: +{failed} fails")
        return {"failed": failed, "shots": shots}

    if args.stop_after_batches is not None:
        calls = {"n": 0}
        inner = run_batch

        def run_batch(idx, shots, rng, inner=inner):  # noqa: F811
            if calls["n"] >= args.stop_after_batches:
                log(f"stopping after {calls['n']} batches (checkpointed)")
                raise SystemExit(3)
            calls["n"] += 1
            return inner(idx, shots, rng)

    ckpt_dir = os.path.join("docs", f"ckpt_{args.config}")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = MonteCarloCheckpoint(ckpt_dir, process_id=0)
    prior_state = ckpt.load()
    if prior_state:
        log(f"resuming from batch {prior_state['batch_index']} "
            f"({prior_state['shots_done']} shots done)")

    t0 = time.perf_counter()
    out = run_checkpointed(
        args.shots, args.batch, run_batch, ckpt, checkpoint_every=1,
        root_seed=args.seed,
    )
    dt = time.perf_counter() - t0
    fails = out["counts"]["failed"]
    shots = out["counts"]["shots"]
    print(json.dumps({
        "config": args.config,
        "fails": int(fails),
        "shots": int(shots),
        "ler": fails / shots,
        "ref_fails": ref_fails,
        "ref_shots": ref_shots,
        "ref_ler": ref_fails / ref_shots,
        "z3_compatible": bool(
            rates_compatible(fails, shots, ref_fails, ref_shots)
        ),
        "seconds": round(dt, 2),
        "shots_per_sec": round(shots / max(dt, 1e-9), 1),
        "resumed_from": prior_state["shots_done"] if prior_state else 0,
    }), flush=True)


if __name__ == "__main__":
    main()
