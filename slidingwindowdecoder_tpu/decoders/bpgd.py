"""Plain BP guided decimation (single-branch BPGD baseline).

Batched counterpart of ``bpgd_decoder`` (bp_guessing_decoder.pyx:473-570):
pre-BP on the full graph; if unconverged, shorten to the ``new_n`` most
unreliable columns and loop (6 masked BP iterations -> decimate the single
most *reliable* variable to its posterior sign -> peel) for up to
``max_step`` steps (Yao et al. variant, bpgd.cpp:258-286 — note the
reference scores reliability by posterior-history slot 3, not the sum; we
reproduce that).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graphs.tanner import compile_graph, graph_device_arrays
from ..ops.bp import bp_init_messages, bp_run, decode_bp, fresh_bp_state
from ..ops.decimation import init_decimation_state, peel, vn_set_values
from .base import DecodeResult, as_batch, pad_pow2


@partial(jax.jit, static_argnames=("num_iter", "max_step", "alpha", "clip",
                                   "msg_dtype", "cn_engine"))
def bpgd_loop(
    garr,
    llr,
    syndrome,
    vn_state,
    cn_state,
    cn_degree,
    dead,
    *,
    num_iter: int,
    max_step: int,
    alpha: float,
    clip: float,
    msg_dtype: str = "float32",
    cn_engine: str = "xla",
):
    """The guided-decimation step loop with a persistent slot-major BP
    carry: messages stay [dc, m_pad, B] in the message dtype and history
    [n, 4, B] across the max_step bursts (io_layout='slot_major'), so the
    per-step bp_run calls skip the batch-major entry/exit transposes of
    the two largest arrays — the same carry scheme as the GDG ensemble."""
    from ..ops.bp import bp_init_messages_sm

    B, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    llr_b = jnp.broadcast_to(llr, (B, n))
    mv = bp_init_messages_sm(garr, llr, B, msg_dtype)
    hist_t = jnp.zeros((n, 4, B), jnp.float32)
    _, error, _, iters = fresh_bp_state(garr, B)
    halted = dead
    converged = jnp.zeros((B,), bool)

    def step(carry):
        d = carry[0]
        sub = _bpgd_step(
            garr, llr_b, syndrome, carry[1:11], num_iter=num_iter,
            alpha=alpha, clip=clip, msg_dtype=msg_dtype,
            cn_engine=cn_engine,
        )
        # all-halted reduced to a carried SCALAR in the body: a vector
        # reduce in the while cond forces a scalar-core SMEM DMA of the
        # whole pred[B] per step (tools/profile_gdg_w4_step.py)
        return (d + 1, *sub, jnp.all(sub[7]))

    # early exit once every shot has halted: a step only mutates active
    # shots, so the result is bit-identical to the full max_step unroll
    # (the reference's per-shot loop breaks the same way, pyx:540-552)
    carry = (jnp.int32(0), mv, hist_t, error, vn_state, cn_state, cn_degree,
             dead, halted, converged, iters, jnp.all(halted))
    carry = jax.lax.while_loop(
        lambda c: (c[0] < max_step) & ~c[11], step, carry
    )
    (_, mv, hist_t, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, iters, _ah) = carry
    pm = jnp.sum(llr_b * (error == 1), axis=-1)
    return {
        "error": error.astype(jnp.uint8),
        "converged": converged,
        "min_pm": pm,
        "iterations": iters,
    }


def _bpgd_step(garr, llr_b, syndrome, carry, *, num_iter, alpha, clip,
               msg_dtype, cn_engine="xla"):
    """One guided-decimation step (BP burst -> decimate most-reliable ->
    peel) on the slot-major carry. Halted rows are frozen, so running a
    step on a finished row is a no-op — shared by the while-loop and
    span-compacted forms."""
    (mv, hist_t, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, iters) = carry
    B, n = vn_state.shape
    halted_in = halted  # rows finished before this step stay fully frozen
    active = ~halted
    mv, hist_t, error, bp_done, iters = bp_run(
        garr, mv, llr_b, syndrome, vn_state, cn_state, hist_t, error,
        ~active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
        msg_dtype=msg_dtype, io_layout="slot_major", hist_update="slice",
        cn_engine=cn_engine,
    )
    newly = bp_done & active
    converged = converged | newly
    halted = halted | newly
    active = active & ~newly

    # decimate the most reliable variable: largest |posterior| using
    # history slot 3 (bpgd.cpp:269), to value (posterior > 0 ? 0 : 1)
    post = hist_t[:, 3, :].T  # [B, n]
    score = jnp.where((vn_state == -1) & active[:, None], jnp.abs(post), -1.0)
    vn = jnp.argmax(score, axis=-1).astype(jnp.int32)
    has = jnp.max(score, axis=-1) >= 0.0
    value = (post[jnp.arange(B), vn] <= 0.0).astype(jnp.int8)
    halted = halted | (active & ~has)
    do_set = active & has
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (B, n), 1) == vn[:, None]
    ) & do_set[:, None]
    vn_state, cn_state, cn_degree, dead = vn_set_values(
        garr, vn_state, cn_state, cn_degree, dead,
        onehot, jnp.broadcast_to(value[:, None], (B, n)),
    )
    vn_state, cn_state, cn_degree, dead = peel(
        garr, vn_state, cn_state, cn_degree, dead
    )
    halted = halted | dead
    # decided values reflected in the running error — but never for rows
    # already finished at step entry (a compacted boundary bucket may
    # straddle pre-converged rows whose error must survive untouched;
    # newly-converged rows' bp_run error already includes decided VNs)
    error = jnp.where(
        (vn_state != -1) & ~halted_in[:, None], vn_state, error
    )
    return (mv, hist_t, error, vn_state, cn_state, cn_degree, dead,
            halted, converged, iters)


@partial(jax.jit, static_argnames=("num_iter", "alpha", "clip", "msg_dtype",
                                   "spans", "row_bucket", "cn_engine"))
def bpgd_spans(
    garr,
    llr,
    syndrome,
    vn_state,
    cn_state,
    cn_degree,
    dead,
    *,
    num_iter: int,
    alpha: float,
    clip: float,
    msg_dtype: str = "float32",
    spans: tuple = (),
    row_bucket: int = 2048,
    error0=None,
    halted0=None,
    converged0=None,
    cn_engine: str = "xla",
):
    """Span-compacted decimation loop: the depth loop is cut into static
    ``spans`` with a row re-compaction between them — halted shots are
    sorted out of the walk, so the pool shrinks as shots converge instead
    of every bucket paying its slowest member to the end (the same scheme
    as gdg_ensemble_spans, with a single lane per shot). Results are
    bit-identical to ``bpgd_loop``: steps freeze finished rows, and each
    bucket's inner while exits early once all of its rows halt.

    ``error0/halted0/converged0`` seed rows that finished before the loop
    (pre-BP convergence): they are never gathered into a bucket and carry
    their state through untouched."""
    B, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    from ..ops.bp import bp_init_messages_sm

    mv = bp_init_messages_sm(garr, llr, B, msg_dtype)
    hist_t = jnp.zeros((n, 4, B), jnp.float32)
    _, error, _, iters = fresh_bp_state(garr, B)
    if error0 is not None:
        error = error0.astype(jnp.int8)
    halted = dead if halted0 is None else (halted0 | dead)
    converged = (
        jnp.zeros((B,), bool) if converged0 is None else converged0
    )
    carry = (mv, hist_t, error, vn_state, cn_state, cn_degree, dead, halted,
             converged, iters)
    bucket = next(d for d in range(min(row_bucket, B), 0, -1) if B % d == 0)
    llr_c = jnp.broadcast_to(llr, (bucket, n))
    llr_b = jnp.broadcast_to(llr, (B, n))

    for sp in spans:
        if bucket == B:
            def stepB(c):
                sub = _bpgd_step(
                    garr, llr_b, syndrome, c[1:11], num_iter=num_iter,
                    alpha=alpha, clip=clip, msg_dtype=msg_dtype,
                    cn_engine=cn_engine)
                return (c[0] + 1, *sub, jnp.all(sub[7]))

            _, *carry = jax.lax.while_loop(
                lambda c: (c[0] < sp) & ~c[11], stepB,
                (jnp.int32(0), *carry, jnp.all(carry[7])),
            )
            carry = tuple(carry[:10])
            continue
        finished = carry[7]
        order = jnp.argsort(finished, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~finished).astype(jnp.int32))

        def body(state, sp=sp, order=order):
            b, carry = state
            idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
            take = lambda a: jnp.take(a, idx, axis=0)

            # mv/hist_t are slot-major with the row axis LAST (the lane
            # axis); route the gather through transposes (lane-axis
            # dynamic gathers execute pathologically on this backend,
            # docs/GDG_W4_CRASH.md)
            def take_sm(a):
                t = jnp.moveaxis(a, -1, 0)
                return jnp.moveaxis(jnp.take(t, idx, axis=0), 0, -1)

            sub = tuple(
                take_sm(a) if i < 2 else take(a) for i, a in enumerate(carry)
            )
            synd_c = take(syndrome)

            def step1(c):
                s2 = _bpgd_step(
                    garr, llr_c, synd_c, c[1:11], num_iter=num_iter,
                    alpha=alpha, clip=clip, msg_dtype=msg_dtype,
                    cn_engine=cn_engine)
                return (c[0] + 1, *s2, jnp.all(s2[7]))

            _, *sub = jax.lax.while_loop(
                lambda c: (c[0] < sp) & ~c[11], step1,
                (jnp.int32(0), *sub, jnp.all(sub[7])),
            )
            sub = sub[:10]

            def scatter_sm(a, s):
                at = jnp.moveaxis(a, -1, 0)
                st = jnp.moveaxis(s, -1, 0)
                return jnp.moveaxis(at.at[idx].set(st), 0, -1)

            carry = tuple(
                scatter_sm(a, s) if i < 2 else a.at[idx].set(s)
                for i, (a, s) in enumerate(zip(carry, sub))
            )
            return (b + 1, carry)

        _, carry = jax.lax.while_loop(
            lambda s: s[0] * bucket < n_todo, body, (jnp.int32(0), carry)
        )

    (mv, hist_t, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, iters) = carry
    pm = jnp.sum(llr_b * (error == 1), axis=-1)
    return {
        "error": error.astype(jnp.uint8),
        "converged": converged,
        "min_pm": pm,
        "iterations": iters,
    }


def default_bpgd_spans(max_step: int) -> tuple:
    """Geometric span schedule: frequent early compactions while the pool
    is draining fast, long tail spans once only stragglers remain."""
    spans, s, total = [], 8, 0
    while total < max_step:
        sp = min(s, max_step - total)
        spans.append(sp)
        total += sp
        s = min(s * 2, 128)
    return tuple(spans)


class BPGD:
    """Batched single-branch guided-decimation decoder."""

    def __init__(
        self,
        pcm,
        channel_probs,
        *,
        max_iter: int = 50,
        max_iter_per_step: int = 6,
        max_step: int = 25,
        ms_scaling_factor: float = 1.0,
        gd_factor: float = 1.0,
        new_n: int | None = None,
        clip: float = 50.0,
        bucket: int = 256,
        msg_dtype: str = "float32",
        mode: str = "spans",
        decim_spans=None,
        row_bucket: int = 2048,
        cn_engine: str = "auto",
    ):
        pcm = np.asarray(pcm)
        self.m, self.n = pcm.shape
        channel_probs = np.asarray(channel_probs, dtype=np.float64)
        if np.any((channel_probs <= 0) | (channel_probs >= 1)):
            raise ValueError("channel_probs must lie strictly in (0, 1)")
        self.max_iter = int(max_iter)
        self.alpha = float(ms_scaling_factor)
        self.gd_factor = float(gd_factor)
        self.clip = float(clip)
        self.num_iter_per_step = int(max_iter_per_step)
        self.max_step = int(max_step)
        self.new_n = min(self.n, 2 * self.m) if new_n is None else min(new_n, self.n)
        self.bucket = int(bucket)
        self.msg_dtype = str(msg_dtype)
        if mode not in ("loop", "spans"):
            raise ValueError("mode must be 'loop' or 'spans'")
        self.mode = mode
        self.decim_spans = (
            default_bpgd_spans(self.max_step)
            if decim_spans is None
            else tuple(int(s) for s in decim_spans)
        )
        if sum(self.decim_spans) != self.max_step:
            raise ValueError(
                f"decim_spans must sum to max_step={self.max_step}"
            )
        self.row_bucket = int(row_bucket)
        self.cn_engine = str(cn_engine)
        self.graph = compile_graph(pcm)
        self.garr = graph_device_arrays(self.graph)
        self.llr = np.log((1 - channel_probs) / channel_probs).astype(np.float32)
        self._llr_dev = jnp.asarray(self.llr)

    def _shorten_state(self, synds, llr_sum):
        B = synds.shape[0]
        vn_state, cn_state, cn_degree, dead = init_decimation_state(
            self.garr, jnp.asarray(synds)
        )
        if self.new_n < self.n:
            order = jnp.argsort(jnp.asarray(llr_sum), axis=1, stable=True)
            rank_pos = (
                jnp.zeros((B, self.n), jnp.int32)
                .at[jnp.arange(B)[:, None], order]
                .set(jnp.broadcast_to(jnp.arange(self.n, dtype=jnp.int32), (B, self.n)))
            )
            drop = rank_pos >= self.new_n
            vn_state, cn_state, cn_degree, dead = vn_set_values(
                self.garr, vn_state, cn_state, cn_degree, dead,
                drop, jnp.zeros((B, self.n), jnp.int8),
            )
            vn_state, cn_state, cn_degree, dead = peel(
                self.garr, vn_state, cn_state, cn_degree, dead
            )
        return vn_state, cn_state, cn_degree, dead

    def core(self, synds):
        """Pure device-side decode: traceable under jit / shard_map.

        Pre-BP on the full batch, then the guided-decimation loop only on
        the survivors, walked in sorted fixed-size buckets (the BPOSD
        compaction pattern): survivors sort to the front, light-syndrome
        shots together, and each bucket's decimation while_loop exits as
        soon as all of its shots halt — so the batch pays the per-bucket
        worst case, not ``max_step`` everywhere (the reference's per-shot
        early break, bp_guessing_decoder.pyx:540-552, recovered batched).
        """
        B = synds.shape[0]
        synds = synds.astype(jnp.uint8)
        pre = decode_bp(
            self.garr,
            self._llr_dev,
            synds,
            num_iter=self.max_iter,
            alpha=self.alpha,
            clip=self.clip,
            cn_engine=self.cn_engine,
        )
        done = pre["converged"]
        error = pre["error"].astype(jnp.uint8)
        iters = pre["iterations"]
        min_pm = jnp.sum(
            jnp.where(error == 1, self._llr_dev[None, :], 0.0), axis=-1
        )
        llr_sum = pre["llr_sum"]

        if self.mode == "spans":
            # span-compacted walk over the whole batch: pre-converged rows
            # enter frozen (halted0) and carry their pre-BP error through
            vn0, cn0, cd0, dead0 = self._shorten_state(synds, llr_sum)
            err0 = jnp.where(
                done[:, None], error.astype(jnp.int8),
                jnp.where(vn0 != -1, vn0, jnp.int8(0)),
            )
            out = bpgd_spans(
                self.garr, self._llr_dev, synds, vn0, cn0, cd0, dead0,
                num_iter=self.num_iter_per_step, alpha=self.gd_factor,
                clip=self.clip, msg_dtype=self.msg_dtype,
                spans=self.decim_spans, row_bucket=self.row_bucket,
                error0=err0, halted0=done, converged0=done,
                cn_engine=self.cn_engine,
            )
            return {
                "error": out["error"],
                "converged": out["converged"],
                "iterations": iters + jnp.where(done, 0, out["iterations"]),
                "min_pm": jnp.where(done, min_pm, out["min_pm"]),
            }

        bucket = min(self.bucket, B)
        while B % bucket:
            bucket -= 1
        synd_weight = jnp.sum(synds, axis=1, dtype=jnp.int32)
        key = done.astype(jnp.int32) * jnp.int32(self.m + 2) + synd_weight
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~done).astype(jnp.int32))

        def body(carry):
            b, error, done, min_pm, iters = carry
            idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
            take = lambda a: jnp.take(a, idx, axis=0)
            s = take(synds)
            vn0, cn0, cd0, dead0 = self._shorten_state(s, take(llr_sum))
            out = bpgd_loop(
                self.garr,
                self._llr_dev,
                s,
                vn0,
                cn0,
                cd0,
                dead0,
                num_iter=self.num_iter_per_step,
                max_step=self.max_step,
                alpha=self.gd_factor,
                clip=self.clip,
                msg_dtype=self.msg_dtype,
                cn_engine=self.cn_engine,
            )
            # boundary buckets may straddle converged shots: keep theirs
            done_c = take(done)
            err_new = jnp.where(done_c[:, None], take(error), out["error"])
            pm_new = jnp.where(done_c, take(min_pm), out["min_pm"])
            conv_new = jnp.where(done_c, True, out["converged"])
            it_new = take(iters) + jnp.where(done_c, 0, out["iterations"])
            return (
                b + 1,
                error.at[idx].set(err_new),
                done.at[idx].set(conv_new),
                min_pm.at[idx].set(pm_new),
                iters.at[idx].set(it_new),
            )

        _, error, done, min_pm, iters = jax.lax.while_loop(
            lambda c: c[0] * bucket < n_todo,
            body,
            (jnp.int32(0), error, done, min_pm, iters),
        )
        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
        }

    def decode_batch_device(self, synds):
        """Jitted ``core``: one device program per batch shape."""
        if not hasattr(self, "_core_jit"):
            self._core_jit = jax.jit(self.core)
        return self._core_jit(synds)

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        B = syndromes.shape[0]
        pad_to = self.row_bucket if self.mode == "spans" else self.bucket
        Bp = max(B, pad_pow2(min(B, pad_to), floor=8))
        Bp = -(-Bp // min(pad_to, Bp)) * min(pad_to, Bp)
        if Bp != B:
            syndromes = np.concatenate(
                [syndromes, np.zeros((Bp - B, self.m), syndromes.dtype)]
            )
        out = self.decode_batch_device(jnp.asarray(syndromes, jnp.uint8))
        return DecodeResult(
            error=np.asarray(out["error"])[:B],
            converged=np.asarray(out["converged"])[:B],
            iterations=np.asarray(out["iterations"])[:B],
            min_pm=np.asarray(out["min_pm"])[:B],
        )

    def decode(self, syndrome) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
