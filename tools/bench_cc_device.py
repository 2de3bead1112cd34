#!/usr/bin/env python
"""Benchmark the device-resident code-capacity campaign on real hardware.

Per config: build the parity-parameterized decoder (validate_parity.py),
run a short warmup batch (compile), then a timed campaign. Prints one JSON
line compatible with docs/parity_results.jsonl tooling.

    python tools/bench_cc_device.py cc-osd0 --shots 1000000 --batch 65536
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


def build_decoder(config, bp_bucket, osd_bucket, ens_bucket, msg_dtype):
    from slidingwindowdecoder_tpu.codes import (
        bb_code_by_n,
        create_QC_GHP_codes,
        create_cyclic_permuting_matrix,
    )
    from slidingwindowdecoder_tpu.decoders import BPGD, BPOSD, GDG

    if config.startswith("cc882"):
        code = create_QC_GHP_codes(
            63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
        )
        p = 0.04
    else:
        code, _, _ = bb_code_by_n(288)
        p = 0.02
    priors = np.full(code.N, p)
    kw = {}
    if msg_dtype:
        kw["msg_dtype"] = msg_dtype
    if config == "cc-osd0":
        dec = BPOSD(code.hx, priors, max_iter=100, ms_scaling_factor=0.625,
                    osd_method="osd_0", bp_bucket=bp_bucket,
                    osd_bucket=osd_bucket, **kw)
    elif config == "cc-osdcs":
        dec = BPOSD(code.hx, priors, max_iter=100, ms_scaling_factor=0.625,
                    osd_method="osd_cs", osd_order=10, bp_bucket=bp_bucket,
                    osd_bucket=osd_bucket, **kw)
    elif config == "cc-gdg":
        dec = GDG(code.hx, priors, max_iter=24, ms_scaling_factor=0.625,
                  gdg_factor=0.625, max_iter_per_step=6, max_step=40,
                  max_tree_depth=4, max_side_depth=20,
                  max_tree_branch_step=30, max_side_branch_step=20,
                  new_n=code.N, low_error_mode=True,
                  ensemble_bucket=ens_bucket, ensemble_mode="spans")
    elif config == "cc882-bpgd-all":
        # Misc.ipynb cell 10: BPGD on all shots, no BP preprocessing
        dec = BPGD(code.hx, priors, max_iter=0, max_iter_per_step=12,
                   gd_factor=0.8, max_step=code.N, new_n=code.N,
                   bucket=ens_bucket)
    else:
        raise SystemExit(f"unknown config {config}")
    return code, p, dec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shots", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--bp-bucket", type=int, default=1024)
    ap.add_argument("--osd-bucket", type=int, default=256)
    ap.add_argument("--ens-bucket", type=int, default=256)
    ap.add_argument("--msg-dtype", default=None)
    ap.add_argument("--seed", type=int, default=31)
    args = ap.parse_args()

    import jax

    if "cpu" in os.environ.get("SWD_PLATFORM", ""):
        jax.config.update("jax_platforms", "cpu")
    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.harness.device_campaign import (
        make_cc_step,
        run_cc_campaign_device,
    )

    code, p, dec = build_decoder(args.config, args.bp_bucket,
                                 args.osd_bucket, args.ens_bucket,
                                 args.msg_dtype)
    log(f"devices: {jax.devices()}")

    import jax.numpy as jnp

    # warmup / compile (batch index far past the campaign's range)
    step = make_cc_step(code, p, dec, args.batch, seed=args.seed)
    t0 = time.perf_counter()
    f, _ = step(jnp.int32(10**6), jnp.int32(args.batch))
    jax.block_until_ready(f)
    warmup = time.perf_counter() - t0
    log(f"warmup (compile + 1 batch): {warmup:.1f}s")

    res = run_cc_campaign_device(
        code, p, args.shots, dec, batch=args.batch, seed=args.seed,
        verbose=True, name=args.config,
    )
    print(json.dumps({
        "config": args.config,
        "batch": args.batch,
        "bp_bucket": args.bp_bucket,
        "osd_bucket": args.osd_bucket,
        "ens_bucket": args.ens_bucket,
        "msg_dtype": args.msg_dtype,
        "warmup_s": round(warmup, 1),
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in res.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
