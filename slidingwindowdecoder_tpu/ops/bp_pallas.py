"""Pallas TPU kernel for the min-sum check-node update.

Fuses the CN stage of ``ops.bp`` (`_cn_update_sm`) — clip, abs, sign
collection, min/second-min reduction, and message emission — into one
VMEM pass: the [dc, m_pad, B] message block is read exactly once from HBM
and the output written once, where the XLA pipeline pays ~3 reduction
reads plus intermediate materializations per iteration (the dominant HBM
traffic of the BP hot loop; see bposd profile: phase A+B ~58% of decode).

Semantics are bit-identical to ``_cn_update_sm`` (mod2sparse-reference
two-pass min-sum, bpgd.cpp:97-197):

- the min / second-min pair is computed by the standard streaming update
  (no argmin needed: at the slot holding the minimum the emitted magnitude
  is ``min2``; elsewhere ``min1``; under ties ``min1 == min2`` so the
  first-argmin rule of the reference emits the same value);
- zero counts as negative (``m <= 0``), clipping to ±clip inside the CN
  update only, sign seeded by the check parity, scaling by alpha applied
  after the sign;
- invalid slots (degree padding) emit exactly 0.

Restricted to the unmasked fast path (every VN undecided, every CN
active) — the BPOSD hot loop; masked (decimation) callers keep the XLA
path. The static slot unroll is over dc ~ 35, so the kernel is small and
compiles quickly (unlike the GJ kernel's rank-length loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 128
_BIG = 1e30  # matches ops.bp.BIG


def _cn_kernel(mv_ref, valid_ref, parity_ref, mc_ref, *, dc, m_pad, alpha,
               clip):
    Bc = parity_ref.shape[1]
    dt = mv_ref.dtype
    big = dt.type(_BIG)

    # Mosaic cannot relayout lane-replicated i1 vectors ("Invalid relayout
    # ... i1" on real TPU, docs/pallas_cn_decision.json): every mask here
    # is derived from FULL-LANE data (valid_ref is materialized at lane
    # width by the caller; no in-kernel broadcasts) and boolean state that
    # crosses an expression boundary is carried as int32 arithmetic.

    # pass 1: streaming (min1, min2) + sign accumulation over the dc slots
    min1 = jnp.full((m_pad, Bc), big, dt)
    min2 = jnp.full((m_pad, Bc), big, dt)
    nneg = jnp.zeros((m_pad, Bc), jnp.int32)
    for s in range(dc):
        valid = valid_ref[s, :, :] > 0  # [m_pad, Bc] full-lane int8
        mvc = jnp.clip(mv_ref[s, :, :], dt.type(-clip), dt.type(clip))
        a = jnp.where(valid, jnp.abs(mvc), big)
        neg = valid & (mvc <= 0)
        min2 = jnp.where(a < min1, min1, jnp.minimum(min2, a))
        min1 = jnp.minimum(min1, a)
        nneg = nneg + neg.astype(jnp.int32)

    # parity + sign count, kept as int32 (0/1) rather than i1
    total_odd = (parity_ref[...] + nneg) % 2  # [m_pad, Bc] int32

    # pass 2: emit per-slot messages
    for s in range(dc):
        valid = valid_ref[s, :, :] > 0
        mvc = jnp.clip(mv_ref[s, :, :], dt.type(-clip), dt.type(clip))
        a = jnp.where(valid, jnp.abs(mvc), big)
        neg_i = (valid & (mvc <= 0)).astype(jnp.int32)
        mag = jnp.where(a == min1, min2, min1)
        # sign flip as arithmetic: (-1)^(total_odd ^ neg)
        sgn = dt.type(1.0) - dt.type(2.0) * (total_odd ^ neg_i).astype(dt)
        mc = dt.type(alpha) * sgn * mag
        mc_ref[s, :, :] = jnp.where(valid, mc, dt.type(0))


@partial(jax.jit, static_argnames=("alpha", "clip", "interpret"))
def cn_update_pallas(mv_sm, cn_valid_sm, parity, *, alpha: float,
                     clip: float, interpret: bool = False):
    """Drop-in replacement for ``_cn_update_sm`` on the unmasked path.

    mv_sm: [dc, m_pad, B] messages (f32 or bf16); cn_valid_sm: [dc, m_pad]
    static bool edge mask; parity: [m_pad, B] int32 sign seed. B must be a
    multiple of 128 (callers' bucket sizes are powers of two >= 128).
    """
    dc, m_pad, B = mv_sm.shape
    kernel = partial(
        _cn_kernel, dc=dc, m_pad=m_pad, alpha=float(alpha), clip=float(clip)
    )
    grid = (B // BLOCK_B,)
    # the static validity mask is materialized at full lane width (int8,
    # one BLOCK_B-wide block reused by every grid step): in-kernel
    # broadcasts of [m_pad, 1] masks produce lane-replicated i1 layouts
    # that Mosaic cannot relayout (docs/pallas_cn_decision.json)
    valid_block = jnp.broadcast_to(
        cn_valid_sm.astype(jnp.int8)[:, :, None], (dc, m_pad, BLOCK_B)
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (dc, m_pad, BLOCK_B), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (dc, m_pad, BLOCK_B), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m_pad, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (dc, m_pad, BLOCK_B), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((dc, m_pad, B), mv_sm.dtype),
        interpret=interpret,
    )(mv_sm, valid_block, parity)


def cn_pallas_supported(dc: int, m_pad: int, B: int) -> bool:
    """Shape gate: lane-multiple batch and VMEM fit (two blocks + temps)."""
    if B % BLOCK_B:
        return False
    block_bytes = dc * m_pad * BLOCK_B * 4  # f32 worst case
    valid_bytes = dc * m_pad * BLOCK_B  # int8 full-lane mask block
    return (
        2 * block_bytes + valid_bytes + 4 * m_pad * BLOCK_B * 4
        < 12 * 1024 * 1024
    )
