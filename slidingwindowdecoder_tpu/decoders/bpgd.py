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

    def step(d, carry):
        (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
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
        return (mv, history, error, vn_state, cn_state, cn_degree, dead,
                halted, converged, iters)

    carry = (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
             converged, iters)
    carry = jax.lax.fori_loop(0, max_step, step, carry)
    (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
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

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        B = syndromes.shape[0]
        Bp = pad_pow2(B)
        synds = np.zeros((Bp, self.m), dtype=np.uint8)
        synds[:B] = syndromes
        pre = decode_bp(
            self.garr,
            self._llr_dev,
            jnp.asarray(synds),
            num_iter=self.max_iter,
            alpha=self.alpha,
            clip=self.clip,
        )
        converged = np.asarray(pre["converged"])[:B].copy()
        error = np.asarray(pre["error"]).astype(np.uint8)[:B]
        iters = np.asarray(pre["iterations"])[:B].copy()
        min_pm = (error * self.llr[None, :]).sum(axis=1).astype(np.float32)

        todo = np.nonzero(~converged)[0]
        if len(todo):
            llr_sum = np.asarray(pre["llr_sum"])[:B]
            bucket = min(self.bucket, pad_pow2(len(todo), floor=8))
            for lo in range(0, len(todo), bucket):
                chunk = todo[lo : lo + bucket]
                s = np.zeros((bucket, self.m), dtype=np.uint8)
                ls = np.zeros((bucket, self.n), dtype=np.float32)
                s[: len(chunk)] = syndromes[chunk]
                ls[: len(chunk)] = llr_sum[chunk]
                vn0, cn0, cd0, dead0 = self._shorten_state(s, ls)
                out = bpgd_loop(
                    self.garr,
                    self._llr_dev,
                    jnp.asarray(s),
                    vn0,
                    cn0,
                    cd0,
                    dead0,
                    num_iter=self.num_iter_per_step,
                    max_step=self.max_step,
                    alpha=self.gd_factor,
                    clip=self.clip,
                )
                error[chunk] = np.asarray(out["error"])[: len(chunk)]
                converged[chunk] = np.asarray(out["converged"])[: len(chunk)]
                min_pm[chunk] = np.asarray(out["min_pm"])[: len(chunk)]
                iters[chunk] += np.asarray(out["iterations"])[: len(chunk)]

        return DecodeResult(
            error=error, converged=converged, iterations=iters, min_pm=min_pm
        )

    def decode(self, syndrome) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
