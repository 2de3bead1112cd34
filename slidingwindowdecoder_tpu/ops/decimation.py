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
