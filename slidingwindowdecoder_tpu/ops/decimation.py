"""Batched guided-decimation primitives: vn_set_value and peel.

TPU-native equivalents of the reference's graph-peeling state machine
(bpgd.cpp:13-80 ``BPGD::peel`` / ``BPGD::vn_set_value`` and the mirrored
logic in osd_window.pyx:306-368): deciding a variable flips the parity of
its active checks and decrements their degrees; a check whose degree hits
zero must be satisfied (else the branch is contradicted/dead) and is
deactivated; degree-1 checks force their unique undecided neighbor, applied
to a fixpoint.

State is batched ([B, n] / [B, m]) with values:
  vn_state: -1 undecided, 0/1 decided;
  cn_state: -1 inactive, 0/1 residual parity;
  cn_degree: number of undecided neighbors of each active check;
  dead: branch contradiction flag.

Sequential-vs-parallel note: the reference applies decisions one at a time
inside scans, so a contradiction may abort a sweep midway; here all
decisions of a sweep apply at once and conflicts set ``dead``. A dead
branch's state is never used (it can never converge), so observable
behavior matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_decimation_state(garr, syndrome):
    """Fresh state: all VNs undecided, all CNs active with syndrome parity."""
    B = syndrome.shape[0]
    n = garr["vn_valid"].shape[0]
    vn_state = jnp.full((B, n), -1, jnp.int8)
    cn_state = syndrome.astype(jnp.int8)
    cn_degree = jnp.broadcast_to(garr["cn_degree"][None], (B, garr["cn_vn"].shape[0]))
    cn_degree = cn_degree.astype(jnp.int32)
    dead = jnp.zeros((B,), bool)
    return vn_state, cn_state, cn_degree, dead


def vn_set_values(garr, vn_state, cn_state, cn_degree, dead, set_mask, values):
    """Decide a set of VNs at once (values: [B, n] 0/1, applied where
    ``set_mask``). Returns updated (vn_state, cn_state, cn_degree, dead)."""
    cn_vn = garr["cn_vn"]
    cn_valid = garr["cn_valid"]
    B = vn_state.shape[0]
    values = values.astype(jnp.int8)

    # conflicts on already-decided VNs
    already = set_mask & (vn_state != -1)
    conflict = already & (vn_state != values)
    dead = dead | jnp.any(conflict, axis=-1)
    newly = set_mask & (vn_state == -1)

    vn_state = jnp.where(newly, values, vn_state)

    # one int8 edge gather encodes both "newly decided" (bit 0+) and the
    # decided value: 0 = untouched, 1 = set to 0, 2 = set to 1
    enc = newly.astype(jnp.int8) + (newly & (values == 1)).astype(jnp.int8)
    enc_e = jnp.pad(enc, ((0, 0), (0, 1)))[:, cn_vn] * cn_valid[None].astype(
        jnp.int8
    )

    active = cn_state != -1
    delta_deg = jnp.sum((enc_e != 0).astype(jnp.int32), axis=-1)
    parity_flip = jnp.sum((enc_e == 2).astype(jnp.int32), axis=-1) % 2
    new_degree = cn_degree - delta_deg
    new_parity = jnp.where(active, cn_state ^ parity_flip.astype(jnp.int8), cn_state)

    hit_zero = active & (new_degree == 0) & (delta_deg > 0)
    contradiction = hit_zero & (new_parity == 1)
    dead = dead | jnp.any(contradiction, axis=-1)
    cn_state = jnp.where(hit_zero & (new_parity == 0), jnp.int8(-1), new_parity)
    cn_degree = new_degree
    return vn_state, cn_state, cn_degree, dead


def peel(garr, vn_state, cn_state, cn_degree, dead, max_sweeps: int | None = None):
    """Iterate degree-1 forcing to a fixpoint.

    ``max_sweeps`` bounds the number of forcing sweeps (None = run to the
    fixpoint; termination is guaranteed since each productive sweep decides
    at least one VN, so the loop runs at most n+1 times).
    """
    vn_cn = garr["vn_cn"]
    vn_valid = garr["vn_valid"]
    m = garr["cn_vn"].shape[0]

    def sweep(state):
        vn_state, cn_state, cn_degree, dead, _ = state
        deg1 = (cn_state != -1) & (cn_degree == 1)
        # from the VN side: an undecided VN adjacent to a degree-1 active CN
        # is that CN's unique undecided neighbor. One int8 gather encodes
        # both facts: 0 = not forcing, 1 = deg-1 parity 0, 2 = deg-1 parity 1
        code = deg1.astype(jnp.int8) + (deg1 & (cn_state == 1)).astype(
            jnp.int8
        )
        code_e = jnp.pad(code, ((0, 0), (0, 1)))[:, vn_cn] * vn_valid[
            None
        ].astype(jnp.int8)
        undecided = (vn_state == -1)[:, :, None]
        force1 = jnp.any((code_e == 2) & undecided, axis=-1)
        force0 = jnp.any((code_e == 1) & undecided, axis=-1)
        dead = dead | jnp.any(force0 & force1, axis=-1)
        forced = (force0 ^ force1) & (vn_state == -1)
        vn_state, cn_state, cn_degree, dead = vn_set_values(
            garr, vn_state, cn_state, cn_degree, dead,
            forced, force1.astype(jnp.int8),
        )
        # reduce to a SCALAR here (vector core, fused into the sweep):
        # a vector reduce in the while cond would force a scalar-core
        # SMEM DMA of the whole pred[B] every sweep
        more = jnp.any(jnp.any(forced, axis=-1) & ~dead)
        return vn_state, cn_state, cn_degree, dead, more

    def body(state):
        sweeps, inner = state
        return sweeps + 1, sweep(inner)

    def cond(state):
        sweeps, (*_, more) = state
        if max_sweeps is not None:
            more &= sweeps < max_sweeps
        return more

    init = (jnp.int32(1), sweep((vn_state, cn_state, cn_degree, dead, None)))
    _, (vn_state, cn_state, cn_degree, dead, _) = jax.lax.while_loop(
        cond, body, init
    )
    return vn_state, cn_state, cn_degree, dead


# ---------------------------------------------------------------------------
# Transposed (batch-minor) variants — the ensemble hot path.
#
# The batch-major forms above put the shot/row axis on the TPU's MAJOR
# dimension, which makes every per-row reduction (`jnp.any(..., axis=-1)`,
# conflict checks, peel fixpoint tests) a cross-LANE reduce; XLA stages
# each one through SMEM with ~5.8 ms scalar-core copies at the W>=4
# ensemble widths (tools/profile_gdg_w4_step.py round 5 — those copies
# outweighed the whole BP burst). The _t forms keep every array
# batch-MINOR ([n, B] / [m_pad, B]) so per-row reductions run along
# sublanes and the edge gathers run along the major axis, like the BP
# kernel itself.
#
# Layout contract: vn arrays [n, B]; cn arrays [m_pad, B] with the pad
# rows inert (state -1, degree 0) — reductions over cn_vn_sm's dummy
# index n and vn_cn's dummy index m read zero rows by construction.
# ---------------------------------------------------------------------------


def init_decimation_state_t(garr, syndrome_t):
    """Fresh transposed state from a [m, B] (or [m_pad, B]) syndrome."""
    B = syndrome_t.shape[-1]
    n = garr["vn_valid"].shape[0]
    m = garr["cn_vn"].shape[0]
    m_pad = garr["cn_vn_sm"].shape[1]
    vn_t = jnp.full((n, B), -1, jnp.int8)
    cn_t = jnp.full((m_pad, B), -1, jnp.int8)
    cn_t = cn_t.at[:m].set(syndrome_t[:m].astype(jnp.int8))
    deg_t = jnp.zeros((m_pad, B), jnp.int32)
    deg_t = deg_t.at[:m].set(
        jnp.broadcast_to(garr["cn_degree"][:, None], (m, B))
    )
    dead = jnp.zeros((B,), bool)
    return vn_t, cn_t, deg_t, dead


def _gather_vn_to_cn(garr, x_t, fill_row=None):
    """[n, B] VN-side array -> [dc, m_pad, B] per-CN-slot array via the
    slot-major table (major-axis gather; dummy index n reads the fill)."""
    B = x_t.shape[-1]
    if fill_row is None:
        fill_row = jnp.zeros((1, B), x_t.dtype)
    src = jnp.concatenate([x_t, fill_row], axis=0)  # [n+1, B]
    dc, m_pad = garr["cn_vn_sm"].shape
    out = jnp.take(src, garr["cn_vn_sm"].reshape(-1), axis=0)
    return out.reshape(dc, m_pad, B)


def _gather_cn_to_vn(garr, x_t, fill_row=None):
    """[m_pad, B] CN-side array -> [n, dv, B] per-VN-slot array via the
    vn_cn table (dummy index m reads an inert row)."""
    m = garr["cn_vn"].shape[0]
    m_pad, B = x_t.shape
    if m == m_pad:
        if fill_row is None:
            fill_row = jnp.zeros((1, B), x_t.dtype)
        src = jnp.concatenate([x_t, fill_row], axis=0)
    else:
        src = x_t  # index m hits an inert pad row
    n, dv = garr["vn_cn"].shape
    out = jnp.take(src, garr["vn_cn"].reshape(-1), axis=0)
    return out.reshape(n, dv, B)


def vn_set_values_t(garr, vn_t, cn_t, deg_t, dead, set_mask_t, values_t):
    """Transposed ``vn_set_values``: set_mask_t/values_t are [n, B]."""
    values_t = values_t.astype(jnp.int8)
    already = set_mask_t & (vn_t != -1)
    conflict = already & (vn_t != values_t)
    dead = dead | jnp.any(conflict, axis=0)
    newly = set_mask_t & (vn_t == -1)
    vn_t = jnp.where(newly, values_t, vn_t)

    enc = newly.astype(jnp.int8) + (newly & (values_t == 1)).astype(jnp.int8)
    enc_e = _gather_vn_to_cn(garr, enc)  # [dc, m_pad, B] int8

    active = cn_t != -1
    # int8 accumulators: dc <= 127 so the counts fit, and XLA fuses the
    # reduction into the gather instead of materializing s32 edge arrays
    # (the int32 form wrote two full [dc*m_pad, B] s32 tensors per call,
    # ~1.9 GB each at the W>=4 ensemble widths)
    delta8 = jnp.sum(
        (enc_e != 0).astype(jnp.int8), axis=0, dtype=jnp.int8
    )  # [m_pad, B]
    pflip = jnp.sum(
        (enc_e == 2).astype(jnp.int8), axis=0, dtype=jnp.int8
    ) & jnp.int8(1)
    delta = delta8.astype(jnp.int32)
    new_deg = deg_t - delta
    new_par = jnp.where(active, cn_t ^ pflip, cn_t)
    hit_zero = active & (new_deg == 0) & (delta > 0)
    contradiction = hit_zero & (new_par == 1)
    dead = dead | jnp.any(contradiction, axis=0)
    cn_t = jnp.where(hit_zero & (new_par == 0), jnp.int8(-1), new_par)
    return vn_t, cn_t, new_deg, dead


def peel_t(garr, vn_t, cn_t, deg_t, dead, max_sweeps: int | None = None):
    """Transposed ``peel``: degree-1 forcing to a fixpoint."""

    def sweep(state):
        vn_t, cn_t, deg_t, dead, _ = state
        deg1 = (cn_t != -1) & (deg_t == 1)
        code = deg1.astype(jnp.int8) + (deg1 & (cn_t == 1)).astype(jnp.int8)
        code_e = _gather_cn_to_vn(garr, code)  # [n, dv, B]
        undecided = (vn_t == -1)[:, None, :]
        force1 = jnp.any((code_e == 2) & undecided, axis=1)
        force0 = jnp.any((code_e == 1) & undecided, axis=1)
        dead = dead | jnp.any(force0 & force1, axis=0)
        forced = (force0 ^ force1) & (vn_t == -1)
        vn_t, cn_t, deg_t, dead = vn_set_values_t(
            garr, vn_t, cn_t, deg_t, dead, forced, force1.astype(jnp.int8)
        )
        more = jnp.any(jnp.any(forced, axis=0) & ~dead)
        return vn_t, cn_t, deg_t, dead, more

    def body(state):
        sweeps, inner = state
        return sweeps + 1, sweep(inner)

    def cond(state):
        sweeps, (*_, more) = state
        if max_sweeps is not None:
            more &= sweeps < max_sweeps
        return more

    init = (jnp.int32(1), sweep((vn_t, cn_t, deg_t, dead, None)))
    _, (vn_t, cn_t, deg_t, dead, _) = jax.lax.while_loop(cond, body, init)
    return vn_t, cn_t, deg_t, dead


def unsatisfied_counts_t(garr, synd_hat_t, syndrome_t, cn_t):
    """Transposed ``num_flip``: synd_hat_t/syndrome_t [m_pad, B] (pad rows
    equal), cn_t [m_pad, B]; returns [n, B] int32."""
    unsat = (
        (synd_hat_t.astype(jnp.int32) != syndrome_t.astype(jnp.int32))
        & (cn_t != -1)
    ).astype(jnp.int8)
    unsat_e = _gather_cn_to_vn(garr, unsat)  # [n, dv, B]
    return jnp.sum(unsat_e, axis=1, dtype=jnp.int8).astype(jnp.int32)


def unsatisfied_counts(garr, error, syndrome, cn_state, synd_hat=None):
    """Per-VN count of adjacent active checks whose decoded syndrome bit
    disagrees with the target (``num_flip`` in bpgd.cpp:296-309).

    ``synd_hat`` (the decoded syndrome of ``error``) may be supplied when
    the caller already has it — ``bp_run(..., return_synd=True)`` computes
    it for free — saving the [B, m, dc] re-gather."""
    from .bp import check_syndrome

    if synd_hat is None:
        synd_hat = check_syndrome(garr, error)
    synd_hat = synd_hat.astype(jnp.int32)
    unsat = (synd_hat != syndrome.astype(jnp.int32)) & (cn_state != -1)
    unsat8 = unsat.astype(jnp.int8)
    pad_cn = lambda x: jnp.pad(x, ((0, 0), (0, 1)))
    unsat_e = pad_cn(unsat8)[:, garr["vn_cn"]] * garr["vn_valid"][None].astype(
        jnp.int8
    )
    return jnp.sum(unsat_e.astype(jnp.int32), axis=-1)
