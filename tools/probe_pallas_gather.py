#!/usr/bin/env python
"""Feasibility probe: sublane gathers inside a Pallas TPU kernel.

Tests the primitives a VMEM-resident BP kernel needs:
  (a) jnp.take_along_axis(x, idx, axis=0) on a [S, L] block (dynamic_gather)
  (b) jnp.take(x, idx_1d, axis=0) with a static-content index vector
  (c) a fused 24-iteration permute+reduce loop, timed vs the XLA equivalent
"""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, L = 8192, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, L)), jnp.float32)
    perm = rng.permutation(S).astype(np.int32)
    idx2d = jnp.asarray(np.broadcast_to(perm[:, None], (S, L)).copy())
    idx1d = jnp.asarray(perm)

    # (a) take_along_axis
    def k_taa(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    try:
        out = pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx2d)
        ok = np.array_equal(np.asarray(out), np.asarray(x)[perm])
        log(f"(a) take_along_axis: compiles, correct={ok}")
    except Exception as e:
        log(f"(a) take_along_axis: FAIL {type(e).__name__}: {str(e)[:300]}")

    # (b) jnp.take with 1-D indices
    def k_take(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    try:
        out = pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx1d)
        ok = np.array_equal(np.asarray(out), np.asarray(x)[perm])
        log(f"(b) take 1d: compiles, correct={ok}")
    except Exception as e:
        log(f"(b) take 1d: FAIL {type(e).__name__}: {str(e)[:300]}")

    # (c) fused loop: 24 iterations of gather + running sum, Pallas vs XLA
    ITERS = 24

    def k_loop(x_ref, i_ref, o_ref):
        def body(_, acc):
            return jnp.take_along_axis(acc, i_ref[:], axis=0) * 0.5 + x_ref[:]

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    try:
        fn = pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        fn_j = jax.jit(lambda x, i: fn(x, i))
        jax.block_until_ready(fn_j(x, idx2d))
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn_j(x, idx2d)
        jax.block_until_ready(out)
        dt_p = (time.perf_counter() - t0) / 20
        log(f"(c) pallas 24-iter gather loop: {dt_p*1e6:.0f} us")
    except Exception as e:
        log(f"(c) pallas loop: FAIL {type(e).__name__}: {str(e)[:300]}")

    @jax.jit
    def xla_loop(x, i1d):
        def body(_, acc):
            return jnp.take(acc, i1d, axis=0) * 0.5 + x

        return jax.lax.fori_loop(0, ITERS, body, x)

    jax.block_until_ready(xla_loop(x, idx1d))
    t0 = time.perf_counter()
    for _ in range(20):
        out = xla_loop(x, idx1d)
    jax.block_until_ready(out)
    log(f"(c') xla 24-iter gather loop: {(time.perf_counter()-t0)/20*1e6:.0f} us")


if __name__ == "__main__":
    main()
