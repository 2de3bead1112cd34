"""Measure per-shot gather patterns for the compacted GDG ensemble.

The compacted ensemble (docs/GDG_W4_PERF.md fix) needs, per BP iteration,
two routings whose index tables vary PER SHOT (the sub-PCM is the shot's
reliability-order head, so the edge tables are per-shot data, unlike the
full graph's shared static tables):

  A. mc  [K*m_pad, B] --(idx [E_c, B])--> [E_c, B]    (CN-slot -> VN-edge)
  B. post [new_n, B]  --(idx [K*m_pad, B])--> [K*m_pad, B]  (posterior -> CN-slot)

Both are `take_along_axis(src, idx, axis=0)` on batch-minor arrays: the
gather walks the MAJOR axis with per-lane indices. This probe times that
pattern against the static shared-index gather the full-graph kernel uses
(jnp.take, measured ~235 GB/s on these shapes) and a plain elementwise
pass (the roofline), at the [[288]] W=4 ensemble shapes.

Run on the bench chip:  python tools/probe_pershot_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

# [[288]] W=4 window, new_n = 1152, dv = 6, post-shorten K ~ 16, m_pad = 576
SRC_FULL = 20160   # dc * m_pad of the full graph
OUT_FULL = 29376   # n * dv of the full graph
E_C = 6912         # new_n * dv
KM = 9216          # K * m_pad (16 * 576)
NN = 1152          # new_n
B = 256 * 47       # shots * lanes = 12032


def timeit(f, *args, reps=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bw(nbytes, secs):
    return nbytes / secs / 1e9


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    f32 = jnp.float32

    # sources
    src_full = jnp.asarray(rng.standard_normal((SRC_FULL, B)), f32)
    src_km = jnp.asarray(rng.standard_normal((KM, B)), f32)
    src_nn = jnp.asarray(rng.standard_normal((NN, B)), f32)

    # static shared indices (full-graph pattern)
    idx_static = jnp.asarray(rng.integers(0, SRC_FULL, OUT_FULL), jnp.int32)
    # per-shot indices
    idx_ec = jnp.asarray(rng.integers(0, KM, (E_C, B)), jnp.int32)
    idx_km = jnp.asarray(rng.integers(0, NN, (KM, B)), jnp.int32)
    idx_full_ps = jnp.asarray(rng.integers(0, SRC_FULL, (OUT_FULL, B)), jnp.int32)

    el = jax.jit(lambda x: x * 1.0001 + 0.5)
    t = timeit(el, src_full)
    print(f"elementwise [SRC_FULL,B] f32: {t*1e3:.3f} ms  "
          f"{bw(2*SRC_FULL*B*4, t):.0f} GB/s (r+w)")

    g_static = jax.jit(lambda s: jnp.take(s, idx_static, axis=0))
    t = timeit(g_static, src_full)
    print(f"static shared gather [{SRC_FULL},B]->[{OUT_FULL},B]: {t*1e3:.3f} ms  "
          f"{bw((SRC_FULL+OUT_FULL)*B*4, t):.0f} GB/s")

    g_ps = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=0))
    t = timeit(g_ps, src_km, idx_ec)
    print(f"per-shot TAA axis0 [{KM},B]->[{E_C},B]: {t*1e3:.3f} ms  "
          f"{bw((KM+2*E_C)*B*4, t):.0f} GB/s")

    t = timeit(g_ps, src_nn, idx_km)
    print(f"per-shot TAA axis0 [{NN},B]->[{KM},B]: {t*1e3:.3f} ms  "
          f"{bw((NN+2*KM)*B*4, t):.0f} GB/s")

    t = timeit(g_ps, src_full, idx_full_ps)
    print(f"per-shot TAA axis0 [{SRC_FULL},B]->[{OUT_FULL},B]: {t*1e3:.3f} ms  "
          f"{bw((SRC_FULL+2*OUT_FULL)*B*4, t):.0f} GB/s")

    # batch-major variant (expected pathological: lane-axis gather)
    src_bm = src_km.T.copy()           # [B, KM]
    idx_bm = idx_ec.T.copy()           # [B, E_C]
    g_bm = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1))
    t = timeit(g_bm, src_bm, idx_bm)
    print(f"per-shot TAA axis1 [B,{KM}]->[B,{E_C}]: {t*1e3:.3f} ms  "
          f"{bw((KM+2*E_C)*B*4, t):.0f} GB/s")

    # one-hot matmul route for the small-source gather (post -> CN slots):
    # idx in [0, NN); one-hot over NN on the MXU. [KM, B] indices need a
    # [KM, NN, ...] onehot per shot -> infeasible; instead test the shared
    # one-hot (static) as MXU reference
    onehot = jax.nn.one_hot(idx_static[:KM] % NN, NN, dtype=jnp.bfloat16)
    g_mm = jax.jit(lambda s: jnp.dot(onehot, s.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32))
    t = timeit(g_mm, src_nn)
    print(f"static one-hot matmul [{NN},B]->[{KM},B] bf16: {t*1e3:.3f} ms")

    print("done")


if __name__ == "__main__":
    main()
