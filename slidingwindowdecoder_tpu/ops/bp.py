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

Performance structure (profiled on TPU v5e):

- *Slot-major edge layout*: CN-major edge arrays live as [dc, m_pad, B]
  with the batch on the lane axis and ``m_pad`` a multiple of 32, so the
  flatten to [dc*m_pad, B] feeding the VN gather is a free bitcast for
  every dtype tiling (the naive [m, dc, B] layout costs ~7 ms/iter in
  materialized reshape/pad copies at B=16k).
- *Posterior identity*: the VN→CN messages for the next iteration are
  ``posterior[vn(edge)] − mc[edge]``, so the CN-major → VN-major → CN-major
  round trip collapses to one small-source gather of the [n, B] posterior;
  the same gathered array also yields the hard decisions per edge, making
  the per-iteration syndrome check free of its own gather.
- *Hoisted masks*: the decided-VN edge masks are loop-invariant per
  ``bp_run`` call and computed once (the naive form re-gathers them every
  iteration); the unmasked fast path (``masked=False``) uses the static
  graph mask only.
- *Optional work-skipping*: ``freeze_messages=False`` drops the converged-
  shot message freeze (valid when downstream only consumes non-converged
  shots' messages, as in BPOSD's phase compaction); ``history_mode="tail"``
  writes the 4-slot posterior history only over the final 4 iterations
  (valid when downstream only reads non-converged shots' histories).

All functions are pure and jit/vmap/shard_map friendly; public arrays are
batch-major (leading B).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e30  # stands in for the reference's 1e308 sentinel (f32-safe)
# pinned-LLR masking sentinels: pinned (decided/invalid) edges carry
# +-PIN; anything past PIN_THRESH is a pin. Strictly above the largest
# live value the schedule can produce (a one-live-edge check emits a
# BIG-magnitude message, so live |mv| can reach ~BIG + prior; dv*BIG
# bounds a live posterior — ``bp_run`` asserts dv*BIG < PIN_THRESH at
# trace time) and comparison-consistent after bfloat16 rounding (PIN and
# PIN_THRESH round to distinct bf16 values that preserve the ordering
# live < PIN_THRESH <= pin).
PIN = 1e33
PIN_THRESH = 1e32


def bp_init_messages(garr, prior_llr, batch: int):
    """Initial VN->CN messages (batch-major CN layout): the channel prior.

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


def bp_init_messages_sm(garr, prior_llr, batch: int, msg_dtype="float32"):
    """Initial VN->CN messages in slot-major [dc, m_pad, B] layout.

    ``prior_llr``: [n] (one prior per VN, shared across the batch — the
    GDG ensemble's case). Invalid slots carry 0; they are masked out of
    every update anyway.
    """
    cn_vn_sm = garr["cn_vn_sm"]  # [dc, m_pad]
    n = garr["vn_valid"].shape[0]
    mdt = jnp.dtype(msg_dtype)
    prior = jnp.asarray(prior_llr, mdt)
    prior_pad = jnp.concatenate([prior, jnp.zeros((1,), mdt)])
    base = jnp.take(prior_pad, cn_vn_sm, mode="clip")  # [dc, m_pad]
    base = jnp.where(garr["cn_valid_sm"], base, mdt.type(0))
    return jnp.broadcast_to(base[:, :, None], (*base.shape, batch))


def _cn_update_sm(mv, edge_valid, parity, *, alpha, clip, pinned=False):
    """Check-node update, slot-major.

    mv: [dc, m_pad, B] messages (any float dtype); edge_valid: bool
    [dc, m_pad, B] or [dc, m_pad, 1]; parity: [m_pad, B] int32 sign seed.
    Returns mc in mv's dtype (zero at invalid slots). All arithmetic stays
    in the message dtype — in bfloat16 mode this halves the HBM traffic of
    every [dc, m_pad, B] intermediate (the dominant arrays of the
    iteration); bf16 shares f32's exponent range so the BIG sentinel and
    the ±clip window are exactly representable.

    ``pinned``: messages >= PIN_THRESH are masked-out pins (+PIN) —
    preserve them through the clip so they lose the min and carry no sign
    (the pinned-LLR masking of ``bp_run``'s masked mode).
    """
    dc = mv.shape[0]
    mdt = mv.dtype
    mvc = jnp.clip(mv, mdt.type(-clip), mdt.type(clip))
    if pinned:
        mvc = jnp.where(mv >= mdt.type(PIN_THRESH), mv, mvc)
    # clamp to BIG so pinned edges present exactly the oracle's sentinel
    # to the min (a check whose every other edge is pinned/invalid emits
    # magnitude BIG, matching the reference's masked fallback)
    absx = jnp.minimum(jnp.where(edge_valid, jnp.abs(mvc), mdt.type(BIG)),
                       mdt.type(BIG))
    neg = edge_valid & (mvc <= 0)
    min1 = jnp.min(absx, axis=0)  # [m_pad, B]
    arg1 = jnp.argmin(absx, axis=0)  # first occurrence == fwd-pass order
    slot = jax.lax.broadcasted_iota(jnp.int32, (dc, 1, 1), 0)
    is_arg = slot == arg1[None, :, :]
    min2 = jnp.min(jnp.where(is_arg, mdt.type(BIG), absx), axis=0)
    total_sign = (parity + jnp.sum(neg, axis=0).astype(jnp.int32)) % 2
    sign_flip = (total_sign[None, :, :] ^ neg.astype(jnp.int32)) == 1
    mag = jnp.where(is_arg, min2[None, :, :], min1[None, :, :])
    mc = mdt.type(alpha) * jnp.where(sign_flip, -mag, mag)
    return jnp.where(edge_valid, mc, mdt.type(0))


def _check_syndrome_bm(garr, error_t):
    """[n, B] error -> [m, B] decoded syndrome (batch-minor)."""
    B = error_t.shape[-1]
    err_pad = jnp.concatenate([error_t, jnp.zeros((1, B), error_t.dtype)], axis=0)
    bits = err_pad[garr["cn_vn"]] * garr["cn_valid"][:, :, None]
    return jnp.sum(bits.astype(jnp.int32), axis=1) % 2


def check_syndrome(garr, error):
    """Decoded syndrome over the full PCM (decided VNs included). [B, n]."""
    return _check_syndrome_bm(garr, error.T).T


@partial(
    jax.jit,
    static_argnames=(
        "num_iter",
        "alpha",
        "clip",
        "msg_dtype",
        "masked",
        "freeze_messages",
        "history_mode",
        "posterior_matmul",
        "cn_engine",
        "return_synd",
        "io_layout",
        "early_exit",
        "hist_update",
        "state_layout",
    ),
)
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
    masked: bool = True,
    freeze_messages: bool = True,
    history_mode: str = "full",
    posterior_matmul: bool = False,
    cn_engine: str = "xla",
    return_synd: bool = False,
    io_layout: str = "batch_major",
    early_exit: bool = True,
    hist_update: str = "masked",
    state_layout: str = "batch_major",
):
    """Run up to ``num_iter`` BP iterations with per-shot convergence freeze.

    ``early_exit=False`` runs the fixed ``num_iter`` trips as a
    ``fori_loop`` (bit-identical results — the per-row freeze masks
    finished rows); use for short bursts where an all-done exit rarely
    fires and the while-loop's per-trip drain costs more than it saves.

    All array args are batched (leading B). ``history`` is [B, n, 4] and is
    written at slot ``i % 4`` each iteration (i local to this call, matching
    the reference's per-call iteration counter). Returns the updated
    ``(mv, history, error, done, iters)``.

    ``masked=False`` asserts every VN is undecided and every CN active
    (vn_state all −1, cn_state == syndrome) and skips the per-edge decided
    masks. ``freeze_messages=False`` lets converged shots' messages keep
    evolving (cheaper; only valid when downstream ignores them).
    ``history_mode="tail"`` records history only during the final 4
    iterations (identical for every shot that runs them; converged shots'
    histories are junk — only valid when downstream ignores those too).

    ``io_layout="slot_major"`` exchanges ``mv`` as [dc, m_pad, B] in the
    message dtype and ``history`` as [n, 4, B] — the internal layouts —
    skipping the entry/exit transposes and the f32 round-trip entirely.
    For a caller that holds BP state across many short ``bp_run`` bursts
    (the GDG ensemble: D_max steps x num_iter iterations) this removes
    four full copies of the two largest arrays per burst and lets a
    bfloat16 message carry stay bfloat16 at rest.
    """
    transposed = state_layout == "transposed"
    B = syndrome.shape[-1] if transposed else syndrome.shape[0]
    n = garr["vn_valid"].shape[0]
    m = garr["cn_vn"].shape[0]
    cn_vn_sm = garr["cn_vn_sm"]  # [dc, m_pad]
    cn_valid_sm = garr["cn_valid_sm"]
    vn_from_cn_sm = garr["vn_from_cn_sm"]  # [n, dv]
    dc, m_pad = cn_vn_sm.shape

    if cn_engine == "auto":
        # fused Pallas CN on real TPU when the shape fits its envelope
        # (measured 1.6-1.9x the XLA CN stage at the flagship window
        # shape, bit-identical in both dtypes); XLA elsewhere (CPU tests
        # run the interpret-mode kernel separately). The MASKED
        # (pinned-LLR) variant is correct in interpret mode and compiles
        # on-chip, but its execution faults the TPU worker on the [[288]]
        # W=4 ensemble graphs (round-5 A/B: gdg-288-41 crashes with
        # pallas, completes with xla) — auto therefore only selects
        # pallas on the unmasked path; pass cn_engine="pallas" to force.
        from .bp_pallas import cn_pallas_supported

        # A second fault class appeared on the [[288]]-family graphs
        # (m_pad 576/864) even unmasked, so auto further restricts to
        # the hardware-validated envelope m_pad <= 384 (the [[144]]
        # window family the bench exercises end-to-end). Forcing
        # cn_engine="pallas" bypasses both gates.
        cn_engine = (
            "pallas"
            if not masked
            and m_pad <= 384
            and jax.default_backend() == "tpu"
            and cn_pallas_supported(dc, m_pad, B, jnp.dtype(msg_dtype).itemsize)
            else "xla"
        )

    mdt = jnp.dtype(msg_dtype)
    prior_llr = jnp.asarray(prior_llr, jnp.float32)
    if prior_llr.ndim == 1:
        prior_t = jnp.broadcast_to(prior_llr[:, None], (n, B))
    else:
        prior_t = prior_llr.T

    def pad_m(x, fill):
        return jnp.pad(x, ((0, m_pad - m), (0, 0)), constant_values=fill)

    if transposed:
        # state_layout="transposed": syndrome/cn_state arrive [m_pad, B]
        # (pad rows 0 / -1), vn_state/error arrive [n, B] — the ensemble
        # carry layouts — skipping every entry/exit transpose
        syndrome_t = syndrome.astype(jnp.int32)
        cn_state_t = cn_state.astype(jnp.int32)
        vn_state_t = vn_state
        err_t = error
    else:
        syndrome_t = pad_m(syndrome.astype(jnp.int32).T, 0)  # [m_pad, B]
        cn_state_t = pad_m(cn_state.astype(jnp.int32).T, -1)
        vn_state_t = vn_state.T  # [n, B]
        err_t = error.T
    parity = jnp.maximum(cn_state_t, 0)

    if io_layout == "slot_major":
        mv_sm = mv.astype(mdt)  # already [dc, m_pad, B]
        hist_t = history  # already [n, 4, B]
    else:
        # batch-major [B, m, dc] carry -> slot-major [dc, m_pad, B]
        mv_sm = jnp.pad(
            jnp.transpose(mv, (2, 1, 0)), ((0, 0), (0, m_pad - m), (0, 0))
        ).astype(mdt)
        hist_t = jnp.transpose(history, (1, 2, 0))  # [n, 4, B]
    vn_undecided = vn_state_t == -1

    # ---- loop-invariant edge masks ------------------------------------------
    syndrome_odd = syndrome_t == 1
    sv = cn_valid_sm[:, :, None]  # [dc, m_pad, 1] static
    if masked:
        # pin safety: a live posterior is bounded by dv*BIG + prior, which
        # must stay below PIN_THRESH or live messages would be
        # misclassified as pins (trace-time check; dv < ~100 in practice)
        dv_max = int(vn_from_cn_sm.shape[1])
        assert dv_max * BIG < PIN_THRESH, (
            f"max VN degree {dv_max} too large for pinned-LLR masking: "
            f"dv*BIG ({dv_max * BIG:.2e}) must stay below PIN_THRESH "
            f"({PIN_THRESH:.0e})"
        )
    if masked:
        # pinned-LLR masking: instead of reading a per-edge pred
        # [dc, m_pad, B] mask in every pass of every iteration, decided
        # VNs' edges are pinned to +BIG once at burst entry — a +BIG
        # message loses every min comparison (the same sentinel the
        # masked min already used) and contributes no sign (the decided
        # parity lives in cn_state, which vn_set_values maintains) — and
        # decided POSTERIORS are pinned to the decided sign, so the
        # syndrome check needs no separate dec_odd correction. Static
        # invalid slots are pinned too. Live-edge arithmetic is
        # bit-identical to the explicit-mask form; the iteration then
        # touches no per-batch mask array at all.
        vs_edge = jnp.take(vn_state_t, cn_vn_sm, axis=0, mode="clip")
        pin_entry = (vs_edge != -1) | ~sv
        mv_sm = jnp.where(pin_entry, mdt.type(PIN), mv_sm)
        vn_pin = jnp.where(
            vn_state_t == 1, mdt.type(-PIN), mdt.type(PIN)
        )  # [n, B]; only read where vn decided
    else:
        vn_pin = None
    edge_valid = sv  # static; the masked per-batch mask is gone
    THRESH = mdt.type(PIN_THRESH)

    def iteration(mv_sm):
        """One BP iteration. Returns (mv_new, posterior, err_new, conv).

        Traffic-shaped for HBM: the CN stage stays in the message dtype,
        the VN gather reads from a zero-padded source (no mask
        materialization; invalid VN slots index the trailing zero row),
        the dv-reduction accumulates in f32 inside the reduce, and the
        posterior is rounded to the message dtype *once* so the [dc,
        m_pad, B] post_edge gather moves half the bytes in bf16 mode. Hard
        decisions come from the same rounded posterior the edges see, so
        the per-VN error and the per-edge syndrome check never disagree.
        """
        if cn_engine in ("pallas", "pallas_interpret"):
            from .bp_pallas import cn_update_pallas

            mc_g = cn_update_pallas(
                mv_sm, cn_valid_sm, parity, alpha=alpha, clip=clip,
                interpret=cn_engine == "pallas_interpret",
                pinned=masked,
            )
        else:
            mc_g = _cn_update_sm(
                mv_sm, edge_valid, parity, alpha=alpha, clip=clip,
                pinned=masked,
            )
        mc_flat = mc_g.reshape(dc * m_pad, B)  # bitcast (m_pad % 32 == 0)
        if posterior_matmul:
            # per-VN message sum as one MXU matmul against the static 0/1
            # incidence. Static-invalid slots carry mc == 0; under
            # pinned-LLR masking a decided VN's edges DO carry nonzero mc,
            # which is harmless because decided posteriors are overwritten
            # by vn_pin below before anything reads them
            posterior = prior_t + jnp.dot(
                garr["vn_inc"], mc_flat, preferred_element_type=jnp.float32
            )
        else:
            mcv = jnp.take(
                mc_flat, vn_from_cn_sm, axis=0, mode="fill", fill_value=0
            )  # [n, dv, B] mdt; invalid VN slots hit the fill, not a copy
            posterior = prior_t + jnp.sum(mcv, axis=1, dtype=jnp.float32)
        post_f = posterior.astype(mdt)
        # masked mode: decided posteriors pinned to the decided sign —
        # the hard decision, the per-edge syndrome signs, AND the next
        # iteration's pinned messages (via post_edge) all inherit the
        # decided value from this single [n, B] where
        post_dec = jnp.where(vn_undecided, post_f, vn_pin) if masked else post_f
        post_edge = jnp.take(post_dec, cn_vn_sm, axis=0, mode="clip")
        if masked:
            # live edges: standard VN update; pinned (|post|=BIG) and
            # static-invalid edges: re-pinned to +BIG
            mv_new = jnp.where(
                edge_valid & (jnp.abs(post_edge) < THRESH),
                post_edge - mc_g,
                mdt.type(PIN),
            )
        else:
            mv_new = post_edge - mc_g

        # decoded parity per check as a +/-1 product (exact in any float
        # dtype) — one cheap reduce-multiply instead of an int32 sum;
        # pinned decided posteriors make the product carry the decided
        # parity with no separate correction term
        hard = post_dec <= 0
        hard_edge_sgn = jnp.where(
            edge_valid & (post_edge <= 0), mdt.type(-1), mdt.type(1)
        )
        synd_odd = jnp.prod(hard_edge_sgn, axis=0) < 0  # [m_pad, B]
        err_new = hard.astype(jnp.int8)
        conv = jnp.all(synd_odd == syndrome_odd, axis=0)
        return mv_new, posterior, err_new, conv, synd_odd

    def body(with_history):
        def _body(state):
            i, mv_sm, hist, err, done, iters, sodd, _all = state
            mv_new, posterior, err_new, conv, synd_odd = iteration(mv_sm)
            active = ~done  # shots still iterating at the START of this iter
            if freeze_messages:
                mv_sm = jnp.where(active[None, None, :], mv_new, mv_sm)
            else:
                mv_sm = mv_new
            if with_history:
                if hist_update == "slice":
                    # write ONLY the [n, 1, B] ring slot (the masked form
                    # materializes the whole [n, 4, B] ring every
                    # iteration — the largest single HBM stream of a
                    # short burst). Valid when downstream reads the
                    # history only for (still-active rows x undecided
                    # VNs): frozen rows' messages are frozen, so their
                    # re-written posterior is the fixed converged value,
                    # and decided VNs' slots receive raw (unpinned)
                    # posteriors that no eligible-masked reader sees.
                    hist = jax.lax.dynamic_update_slice(
                        hist,
                        posterior[:, None, :].astype(hist.dtype),
                        (jnp.int32(0), i % 4, jnp.int32(0)),
                    )
                else:
                    slot_hot = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 4, 1), 1
                    ) == (i % 4)
                    hist_mask = (
                        (active[None, :] & vn_undecided)[:, None, :] & slot_hot
                    )
                    hist = jnp.where(
                        hist_mask, posterior[:, None, :].astype(hist.dtype), hist
                    )
            err = jnp.where(active[None, :], err_new, err)
            if return_synd:
                sodd = jnp.where(active[None, :], synd_odd, sodd)
            iters = iters + active.astype(jnp.int32)
            done = done | conv
            # the all-done reduce lives in the BODY (vector core, fused)
            # and the while cond reads only carried scalars — a vector
            # reduce in the cond forces a scalar-core SMEM DMA of the
            # full pred[B] every iteration (~6 ms/copy on the W>=4
            # ensemble shapes, tools/profile_gdg_w4_step.py)
            return (i + 1, mv_sm, hist, err, done, iters, sodd, jnp.all(done))

        return _body

    def run_span(state, end, with_history, trips=None):
        if not early_exit:
            # fixed-trip fori form: no convergence-dependent trip count
            # (results identical — the per-row freeze does the masking);
            # lets XLA schedule across iterations instead of draining at
            # every all-done check
            b = body(with_history)
            return jax.lax.fori_loop(0, trips, lambda _, s: b(s), state)

        def cond(state):
            return (state[0] < end) & ~state[7]

        return jax.lax.while_loop(cond, body(with_history), state)

    # rows already done at entry keep the target syndrome (correct: their
    # decoded syndrome matches); rows stepped at least once get the decoded
    # parity of their last executed iteration
    state = (jnp.int32(0), mv_sm, hist_t, err_t, done, iters, syndrome_odd,
             jnp.all(done))
    if history_mode == "tail" and num_iter > 4:
        state = run_span(state, num_iter - 4, with_history=False,
                         trips=num_iter - 4)
        state = run_span(state, num_iter, with_history=True, trips=4)
    elif history_mode in ("full", "tail"):
        state = run_span(state, num_iter, with_history=True, trips=num_iter)
    elif history_mode == "none":
        state = run_span(state, num_iter, with_history=False, trips=num_iter)
    else:
        raise ValueError(f"unknown history_mode {history_mode!r}")
    _, mv_sm, hist_t, err_t, done, iters, sodd, _ = state

    err_out = err_t if transposed else err_t.T
    if io_layout == "slot_major":
        out = (mv_sm, hist_t, err_out, done, iters)
    else:
        mv_out = jnp.transpose(mv_sm[:, :m, :], (2, 1, 0)).astype(jnp.float32)
        out = (
            mv_out,
            jnp.transpose(hist_t, (2, 0, 1)),
            err_out,
            done,
            iters,
        )
    if return_synd:
        synd_out = (
            sodd.astype(jnp.int8) if transposed  # [m_pad, B], pad rows 0
            else sodd[:m].T.astype(jnp.int8)
        )
        return out + (synd_out,)
    return out


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
    masked: bool | None = None,
    freeze_messages: bool = True,
    history_mode: str = "full",
    cn_engine: str = "xla",
):
    """Plain batched BP decode from scratch.

    Returns dict with error, converged, iterations, history, posterior-sum
    ordering key (llr_sum), and final messages (for downstream OSD reuse).
    """
    B = syndrome.shape[0]
    n = garr["vn_valid"].shape[0]
    if masked is None:
        masked = vn_state is not None or cn_state is not None
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
        masked=masked,
        freeze_messages=freeze_messages,
        history_mode=history_mode,
        cn_engine=cn_engine,
    )
    return {
        "error": error,
        "converged": done,
        "iterations": iters,
        "history": history,
        "llr_sum": jnp.sum(history, axis=-1),
        "mv": mv,
    }
