#!/usr/bin/env python
"""Per-window OSD timing with real pipeline inputs, per-call blocking."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.gf2_solve import osd_decode

    code, circuit, dem, plan = build_bb_window_experiment(144, 0.004, 12, 3, 1, method=1)
    rng = np.random.default_rng(7)
    B = 1024
    det, obs, _ = sample_dem_numpy(dem, B, rng)

    for wi, spec in enumerate(plan.windows):
        dec = BPOSD(
            spec.mat, spec.prior, max_iter=24, ms_scaling_factor=1.0,
            osd_method="osd_cs", osd_order=10, osd_bucket=B,
            msg_dtype="bfloat16", phase_a_iters=None,
        )
        synd = jnp.asarray(det[:, spec.row_start:spec.row_end], jnp.uint8)
        rel = jnp.asarray(rng.standard_normal((B, dec.n)), jnp.float32)

        def call():
            return osd_decode(
                dec.H_words, synd, rel, dec._llr_dev, dec.patterns,
                m=dec.m, n=dec.n, rank=dec.rank, k=dec.k, meta=dec._osd_meta,
            )["solution"]

        jax.block_until_ready(call())  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(call())
        dt = (time.perf_counter() - t0) / 3
        log(
            f"win{wi}: m={dec.m} n={dec.n} rank={dec.rank} k={dec.k} "
            f"osd={dt*1e3:.1f} ms"
        )


if __name__ == "__main__":
    main()
