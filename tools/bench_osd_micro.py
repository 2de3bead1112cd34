#!/usr/bin/env python
"""Micro-benchmark: ordered Gauss-Jordan vs OSD-CS sweep on the window PCM."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )
    from slidingwindowdecoder_tpu.ops.gf2_solve import (
        gf2_rank_packed,
        ordered_gauss_jordan,
        osd_candidate_patterns,
        osd_decode,
        pack_rows_host,
    )

    code, circuit, dem, plan = build_bb_window_experiment(144, 0.004, 12, 3, 1, method=1)
    spec = plan.windows[0]
    H = spec.mat
    m, n = H.shape
    rank = gf2_rank_packed(H)
    k = n - rank
    print(f"window PCM {m}x{n}, rank {rank}, k {k}", file=sys.stderr)

    B = 1024
    rng = np.random.default_rng(0)
    synd = jnp.asarray(rng.integers(0, 2, (B, m)), jnp.uint8)
    rel = jnp.asarray(rng.random((B, n)), jnp.float32)
    llr = jnp.asarray(np.log((1 - spec.prior) / spec.prior), jnp.float32)
    Hw = jnp.asarray(pack_rows_host(H))
    pats = osd_candidate_patterns(k, 10, "osd_cs")

    order = jnp.argsort(rel, axis=1, stable=True).astype(jnp.int32)

    def timeit(label, fn, reps=5):
        fn()  # compile
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {dt*1e3:.1f} ms", file=sys.stderr)
        return dt

    gj_fn = lambda: ordered_gauss_jordan(Hw, synd, order, m=m, n=n, rank=rank)
    timeit("ordered_gauss_jordan", gj_fn)
    full_fn = lambda: osd_decode(Hw, synd, rel, llr, pats, m=m, n=n, rank=rank, k=k)[
        "solution"
    ]
    timeit("osd_decode (GJ + CS sweep)", full_fn)


if __name__ == "__main__":
    main()
