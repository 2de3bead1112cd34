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


@partial(jax.jit, static_argnames=("num_iter", "max_step", "alpha", "clip"))
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
):
    B, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    llr_b = jnp.broadcast_to(llr, (B, n))
    mv = bp_init_messages(garr, llr_b, B)
    history, error, _, iters = fresh_bp_state(garr, B)
    halted = dead
    converged = jnp.zeros((B,), bool)

    def step(carry):
        (d, mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
         converged, iters) = carry
        active = ~halted
        mv, history, error, bp_done, iters = bp_run(
            garr, mv, llr_b, syndrome, vn_state, cn_state, history, error,
            ~active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
        )
        newly = bp_done & active
        converged = converged | newly
        halted = halted | newly
        active = active & ~newly

        # decimate the most reliable variable: largest |posterior| using
        # history slot 3 (bpgd.cpp:269), to value (posterior > 0 ? 0 : 1)
        post = history[..., 3]
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
        error = jnp.where(vn_state != -1, vn_state, error)
        return (d + 1, mv, history, error, vn_state, cn_state, cn_degree,
                dead, halted, converged, iters)

    # early exit once every shot has halted: a step only mutates active
    # shots, so the result is bit-identical to the full max_step unroll
    # (the reference's per-shot loop breaks the same way, pyx:540-552)
    carry = (jnp.int32(0), mv, history, error, vn_state, cn_state, cn_degree,
             dead, halted, converged, iters)
    carry = jax.lax.while_loop(
        lambda c: (c[0] < max_step) & ~jnp.all(c[8]), step, carry
    )
    (_, mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, iters) = carry
    pm = jnp.sum(llr_b * (error == 1), axis=-1)
    return {
        "error": error.astype(jnp.uint8),
        "converged": converged,
        "min_pm": pm,
        "iterations": iters,
    }


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
        )
        done = pre["converged"]
        error = pre["error"].astype(jnp.uint8)
        iters = pre["iterations"]
        min_pm = jnp.sum(
            jnp.where(error == 1, self._llr_dev[None, :], 0.0), axis=-1
        )
        llr_sum = pre["llr_sum"]

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
        Bp = max(B, pad_pow2(min(B, self.bucket), floor=8))
        Bp = -(-Bp // min(self.bucket, Bp)) * min(self.bucket, Bp)
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
