"""Batched normalized min-sum belief propagation.

The TPU-native replacement for the reference's serial pointer-chasing BP
(osd_window.pyx:381-485 ``bp_decode_llr`` and bpgd.cpp:97-197
``BPGD::min_sum_log``): one fused, fixed-shape update over all edges of all
shots at once, expressed on the dense-padded Tanner tables from
``graphs.tanner``. Semantics reproduced exactly:

- two-pass CN rule == masked (min1, min2, first-argmin) reduction over the
  check-slot axis, sign seeded by the check's current parity, zero counted
  as negative (``m <= 0``), message clipping to ±clip *inside* the CN
  update only, normalization factor applied after the sign;
- VN rule: posterior = prior + sum of incoming, outgoing = posterior − own;
- posterior LLR history ring of length 4 indexed by ``iteration % 4``;
- hard decision ``posterior <= 0``; convergence = full-PCM syndrome match
  (decided VNs included); per-shot freeze after convergence, whole-batch
  early exit via ``lax.while_loop``.

Masking (for guided decimation / shortened decoding): ``vn_state`` values
−1/0/1 exclude decided variables from message passing, ``cn_state`` −1
deactivates cleared checks while 0/1 carries the residual parity used as
the CN sign seed (bpgd.cpp:104-141).

All functions are pure and jit/vmap/shard_map friendly; batch axis leads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e30  # stands in for the reference's 1e308 sentinel (f32-safe)


def bp_init_messages(garr, prior_llr, batch: int):
    """Initial VN->CN messages (CN-major layout): the channel prior.

    prior_llr: [n] or [B, n]. Decided VNs need no special treatment — their
    edges are masked out of every update.
    """
    cn_vn = garr["cn_vn"]
    n = garr["vn_valid"].shape[0]
    prior_llr = jnp.asarray(prior_llr, jnp.float32)
    if prior_llr.ndim == 1:
        prior_llr = jnp.broadcast_to(prior_llr, (batch, n))
    prior_pad = jnp.pad(prior_llr, ((0, 0), (0, 1)))
    return prior_pad[:, cn_vn]  # [B, m, dc]


def bp_iteration_bm(garr, mv, prior_llr_t, vn_state_t, cn_state_t, *, alpha, clip,
                    msg_dtype=jnp.float32):
    """One min-sum iteration in batch-minor layout.

    Batch lives on the LAST (lane) axis: ``mv`` is [m, dc, B], priors and
    states are [n|m, B]. The two layout permutations then gather *rows* of
    [E+1, B] arrays with static indices — contiguous lane vectors — instead
    of lane-axis gathers, which are pathologically slow on TPU.
    Returns (mv', posterior [n, B], error [n, B]).
    """
    cn_vn = garr["cn_vn"]
    cn_valid = garr["cn_valid"]
    m, dc = cn_vn.shape
    n, dv = garr["vn_valid"].shape
    B = mv.shape[-1]

    # ---- CN update ---------------------------------------------------------
    mvc = jnp.clip(mv.astype(jnp.float32), -clip, clip)
    vn_state_pad = jnp.concatenate(
        [vn_state_t, jnp.zeros((1, B), vn_state_t.dtype)], axis=0
    )
    edge_undecided = vn_state_pad[cn_vn] == -1  # [m, dc, B]
    cn_active = (cn_state_t != -1)[:, None, :]
    edge_valid = cn_valid[:, :, None] & edge_undecided & cn_active

    absx = jnp.where(edge_valid, jnp.abs(mvc), BIG)
    neg = edge_valid & (mvc <= 0.0)
    min1 = jnp.min(absx, axis=1)  # [m, B]
    arg1 = jnp.argmin(absx, axis=1)  # first occurrence, like the fwd pass
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, dc, 1), 1)
    is_arg = slot == arg1[:, None, :]
    absx2 = jnp.where(is_arg, BIG, absx)
    min2 = jnp.min(absx2, axis=1)

    parity = jnp.maximum(cn_state_t, 0).astype(jnp.int32)  # sign seed
    total_sign = (parity + jnp.sum(neg, axis=1).astype(jnp.int32)) % 2
    sign_excl = total_sign[:, None, :] ^ neg.astype(jnp.int32)
    mag = jnp.where(is_arg, min2[:, None, :], min1[:, None, :])
    mc = alpha * jnp.where(sign_excl == 1, -mag, mag)
    mc = jnp.where(edge_valid, mc, 0.0)

    # ---- VN update ---------------------------------------------------------
    # messages cross the two layout gathers (the bandwidth hot spot) in
    # msg_dtype; all arithmetic stays float32
    mc_g = mc.astype(msg_dtype)
    mc_flat = jnp.concatenate(
        [mc_g.reshape(m * dc, B), jnp.zeros((1, B), msg_dtype)], axis=0
    )
    mcv = jnp.take(mc_flat, garr["vn_from_cn"], axis=0).reshape(n, dv, B)
    mcv = mcv.astype(jnp.float32)
    posterior = prior_llr_t + jnp.sum(mcv, axis=1)  # [n, B]
    mvv = (posterior[:, None, :] - mcv).astype(msg_dtype)
    mvv_flat = jnp.concatenate(
        [mvv.reshape(n * dv, B), jnp.zeros((1, B), msg_dtype)], axis=0
    )
    mv_new = jnp.take(mvv_flat, garr["cn_from_vn"], axis=0).reshape(m, dc, B)

    hard = posterior <= 0.0
    error = jnp.where(vn_state_t == -1, hard.astype(jnp.int8), vn_state_t)
    return mv_new, posterior, error


def _check_syndrome_bm(garr, error_t):
    """[n, B] error -> [m, B] decoded syndrome (batch-minor)."""
    B = error_t.shape[-1]
    err_pad = jnp.concatenate([error_t, jnp.zeros((1, B), error_t.dtype)], axis=0)
    bits = err_pad[garr["cn_vn"]] * garr["cn_valid"][:, :, None]
    return jnp.sum(bits.astype(jnp.int32), axis=1) % 2


def check_syndrome(garr, error):
    """Decoded syndrome over the full PCM (decided VNs included). [B, n]."""
    return _check_syndrome_bm(garr, error.T).T


@partial(jax.jit, static_argnames=("num_iter", "alpha", "clip", "msg_dtype"))
def bp_run(
    garr,
    mv,
    prior_llr,
    syndrome,
    vn_state,
    cn_state,
    history,
    error,
    done,
    iters,
    *,
    num_iter: int,
    alpha: float = 1.0,
    clip: float = 50.0,
    msg_dtype: str = "float32",
):
    """Run up to ``num_iter`` BP iterations with per-shot convergence freeze.

    All array args are batched (leading B). ``history`` is [B, n, 4] and is
    written at slot ``i % 4`` each iteration (i local to this call, matching
    the reference's per-call iteration counter). Returns the updated
    ``(mv, history, error, done, iters)``.
    """
    B = mv.shape[0]
    n = garr["vn_valid"].shape[0]
    syndrome_t = syndrome.astype(jnp.int32).T  # [m, B]
    prior_llr = jnp.asarray(prior_llr, jnp.float32)
    if prior_llr.ndim == 1:
        prior_t = jnp.broadcast_to(prior_llr[:, None], (n, B))
    else:
        prior_t = prior_llr.T
    mdt = jnp.dtype(msg_dtype)
    # batch-minor internal layout: shots on the lane axis
    mv_t = jnp.transpose(mv, (1, 2, 0)).astype(mdt)
    hist_t = jnp.transpose(history, (1, 2, 0))  # [n, 4, B]
    err_t = error.T
    vn_state_t = vn_state.T
    cn_state_t = cn_state.T

    def cond(state):
        i, mv, hist, err, done, iters = state
        return (i < num_iter) & ~jnp.all(done)

    def body(state):
        i, mv, hist, err, done, iters = state
        mv_new, posterior, err_new = bp_iteration_bm(
            garr, mv, prior_t, vn_state_t, cn_state_t, alpha=alpha, clip=clip,
            msg_dtype=mdt,
        )
        active = ~done  # shots still iterating at the START of this iteration
        mv = jnp.where(active[None, None, :], mv_new, mv)
        slot_hot = jax.lax.broadcasted_iota(jnp.int32, (1, 4, 1), 1) == (i % 4)
        hist_mask = (active[None, :] & (vn_state_t == -1))[:, None, :] & slot_hot
        hist = jnp.where(hist_mask, posterior[:, None, :], hist)
        err = jnp.where(active[None, :], err_new, err)
        synd_hat = _check_syndrome_bm(garr, err)
        conv = jnp.all(synd_hat == syndrome_t, axis=0)
        iters = iters + active.astype(jnp.int32)
        done = done | conv
        return (i + 1, mv, hist, err, done, iters)

    state = (jnp.int32(0), mv_t, hist_t, err_t, done, iters)
    _, mv_t, hist_t, err_t, done, iters = jax.lax.while_loop(cond, body, state)
    return (
        jnp.transpose(mv_t, (2, 0, 1)).astype(jnp.float32),
        jnp.transpose(hist_t, (2, 0, 1)),
        err_t.T,
        done,
        iters,
    )


def fresh_bp_state(garr, batch: int):
    """Zeroed (history, error, done, iters) for a new decode call."""
    n = garr["vn_valid"].shape[0]
    return (
        jnp.zeros((batch, n, 4), jnp.float32),
        jnp.zeros((batch, n), jnp.int8),
        jnp.zeros((batch,), bool),
        jnp.zeros((batch,), jnp.int32),
    )


def decode_bp(
    garr,
    prior_llr,
    syndrome,
    *,
    num_iter: int,
    alpha: float = 1.0,
    clip: float = 50.0,
    vn_state=None,
    cn_state=None,
    msg_dtype: str = "float32",
):
    """Plain (unmasked) batched BP decode from scratch.

    Returns dict with error, converged, iterations, history, posterior-sum
    ordering key (llr_sum), and final messages (for downstream OSD reuse).
    """
    B = syndrome.shape[0]
    n = garr["vn_valid"].shape[0]
    if vn_state is None:
        vn_state = jnp.full((B, n), -1, jnp.int8)
    if cn_state is None:
        cn_state = syndrome.astype(jnp.int8)
    mv = bp_init_messages(garr, prior_llr, B)
    history, error, done, iters = fresh_bp_state(garr, B)
    mv, history, error, done, iters = bp_run(
        garr,
        mv,
        prior_llr,
        syndrome,
        vn_state,
        cn_state,
        history,
        error,
        done,
        iters,
        num_iter=num_iter,
        alpha=alpha,
        clip=clip,
        msg_dtype=msg_dtype,
    )
    return {
        "error": error,
        "converged": done,
        "iterations": iters,
        "history": history,
        "llr_sum": jnp.sum(history, axis=-1),
        "mv": mv,
    }
