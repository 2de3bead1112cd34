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
_PIN_THRESH = 1e32  # matches ops.bp.PIN_THRESH


def _cn_kernel(mv_ref, valid_ref, parity_ref, mc_ref, *, dc, m_pad, alpha,
               clip, pinned):
    Bc = parity_ref.shape[1]
    dt = mv_ref.dtype
    f32 = jnp.float32
    # the BIG sentinel as the STORAGE dtype rounds it (so a one-live-edge
    # check emits exactly the value _cn_update_sm's mdt.type(BIG) does)
    big = jnp.asarray(_BIG, dt).astype(f32)
    thresh = jnp.asarray(_PIN_THRESH, dt).astype(f32)

    # Mosaic restrictions on this target (docs/pallas_cn_decision.json):
    # lane-replicated i1 vectors cannot be relayouted, and int8/bf16
    # vector compares are unsupported. The static validity mask therefore
    # enters as f32 0/1 ([dc, m_pad, 1]; f32 broadcasts relayout fine) and
    # is used ARITHMETICALLY, and ALL in-kernel arithmetic runs in f32
    # (storage may be bf16: bf16 -> f32 is exact and monotone, bf16xbf16
    # products are exact in f32, and the single rounding at the output
    # write matches a native-bf16 multiply — results stay bit-identical
    # to `_cn_update_sm` in both dtypes).

    def slot_vals(s):
        """(a, neg) for slot s — shared by both passes; mirrors
        `_cn_update_sm` including the pinned-LLR branch (pinned edges
        carry +PIN: they present exactly `big` to the min and no sign)."""
        vf = jnp.broadcast_to(valid_ref[s, :, :], (m_pad, Bc))
        mvr = mv_ref[s, :, :].astype(f32)
        mvc = jnp.clip(mvr, -f32(clip), f32(clip))
        if pinned:
            mvc = jnp.where(mvr >= thresh, mvr, mvc)
        # valid: |mvc| exactly (x*1 + big*0); invalid: exactly big; the
        # final min matches _cn_update_sm's clamp of pins down to BIG
        a = jnp.minimum(jnp.abs(mvc) * vf + big * (f32(1) - vf), big)
        neg = (mvc <= 0).astype(jnp.int32) * vf.astype(jnp.int32)
        return a, neg

    # pass 1: streaming (min1, min2) + sign accumulation over the dc slots
    min1 = jnp.full((m_pad, Bc), big, f32)
    min2 = jnp.full((m_pad, Bc), big, f32)
    nneg = jnp.zeros((m_pad, Bc), jnp.int32)
    for s in range(dc):
        a, neg = slot_vals(s)
        min2 = jnp.where(a < min1, min1, jnp.minimum(min2, a))
        min1 = jnp.minimum(min1, a)
        nneg = nneg + neg

    # parity + sign count, kept as int32 (0/1) rather than i1
    total_odd = (parity_ref[...] + nneg) % 2  # [m_pad, Bc] int32

    # pass 2: emit per-slot messages
    for s in range(dc):
        vf = jnp.broadcast_to(valid_ref[s, :, :], (m_pad, Bc))
        a, neg = slot_vals(s)
        mag = jnp.where(a == min1, min2, min1)
        # sign flip as arithmetic: (-1)^(total_odd ^ neg); invalid slots
        # emit exactly 0 via the vf product. alpha is rounded to the
        # STORAGE dtype first (matching `mdt.type(alpha)` in
        # _cn_update_sm), so the single output rounding reproduces a
        # native storage-dtype multiply bit-for-bit.
        sgn = f32(1.0) - f32(2.0) * (total_odd ^ neg).astype(f32)
        alpha_c = jnp.asarray(alpha, dt).astype(f32)
        mc_ref[s, :, :] = (alpha_c * sgn * mag * vf).astype(dt)


@partial(jax.jit, static_argnames=("alpha", "clip", "interpret", "pinned"))
def cn_update_pallas(mv_sm, cn_valid_sm, parity, *, alpha: float,
                     clip: float, interpret: bool = False,
                     pinned: bool = False):
    """Drop-in replacement for ``_cn_update_sm`` (both the unmasked path
    and the pinned-LLR masked path used by the decimation decoders).

    mv_sm: [dc, m_pad, B] messages (f32 or bf16); cn_valid_sm: [dc, m_pad]
    static bool edge mask; parity: [m_pad, B] int32 sign seed. B must be a
    multiple of 128 (callers' bucket sizes are powers of two >= 128).
    """
    dc, m_pad, B = mv_sm.shape
    kernel = partial(
        _cn_kernel, dc=dc, m_pad=m_pad, alpha=float(alpha), clip=float(clip),
        pinned=bool(pinned),
    )
    grid = (B // BLOCK_B,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (dc, m_pad, BLOCK_B), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (dc, m_pad, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
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
        compiler_params=None if interpret else pltpu.CompilerParams(
            # in+out blocks double-buffered: 4x block (f32 flagship window
            # shape = 16.3 MB) exceeds the 16 MB default scoped limit
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(mv_sm, cn_valid_sm.astype(jnp.float32)[:, :, None], parity)


def cn_pallas_supported(dc: int, m_pad: int, B: int,
                        itemsize: int = 4) -> bool:
    """Shape gate: lane-multiple batch and VMEM fit (two blocks + temps).

    ``itemsize``: message dtype bytes (2 for bf16 — halves the block, so
    bf16 admits graphs up to ~2x the f32 envelope, e.g. the [[144]]
    global 936-row DEM)."""
    if B % BLOCK_B:
        return False
    block_bytes = dc * m_pad * BLOCK_B * itemsize
    # in+out double-buffered (4x block) + temps, against the 64 MB scoped
    # vmem limit the kernel requests (with headroom)
    return 4 * block_bytes + 8 * m_pad * BLOCK_B * 4 < 56 * 1024 * 1024
