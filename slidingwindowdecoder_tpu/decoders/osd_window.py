"""Shortened-PCM BP+OSD decoder (the reference's own ``osd_window``).

Batched re-design of osd_window.pyx:158-284: (1) a short pre-BP pass on the
full window PCM; (2) for unconverged shots, *shorten* by deciding the
most-reliable columns (largest 4-iteration posterior sum) to zero and
peeling; (3) a long post-BP pass on the masked graph with fresh messages;
(4) if still unconverged, OSD over the full PCM with decided columns pinned
to the extremes of the reliability order (±1000, osd_window.pyx:205-213).

Decided values steer only the column ordering of the OSD stage — the
elimination itself runs over all columns, exactly as the reference's
``mod2sparse_decomp_osd`` does on the full H.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graphs.tanner import compile_graph, graph_device_arrays
from ..ops.bp import bp_init_messages, bp_run, fresh_bp_state
from ..ops.decimation import init_decimation_state, peel, vn_set_values
from ..ops.gf2_solve import (
    gf2_rank_packed,
    analyze_patterns,
    osd_candidate_patterns,
    osd_decode,
    pack_rows_host,
)
from .base import DecodeResult, as_batch

PIN = 1000.0  # reliability pin for decided columns (osd_window.pyx:205-213)


class OSDWindow:
    """Batched shortened BP+OSD decoder for one (window) PCM."""

    def __init__(
        self,
        pcm,
        channel_probs,
        *,
        pre_max_iter: int = 8,
        post_max_iter: int = 100,
        ms_scaling_factor: float = 1.0,
        new_n: int | None = None,
        osd_method: str = "osd_0",
        osd_order: int = 0,
        clip: float = 50.0,
        bucket: int = 512,
        osd_bucket: int = 256,
        gj_engine: str = "auto",
    ):
        pcm = np.asarray(pcm)
        self.m, self.n = pcm.shape
        channel_probs = np.asarray(channel_probs, dtype=np.float64)
        if np.any((channel_probs <= 0) | (channel_probs >= 1)):
            raise ValueError("channel_probs must lie strictly in (0, 1)")
        self.pre_max_iter = int(pre_max_iter)
        self.post_max_iter = int(post_max_iter)
        self.alpha = float(ms_scaling_factor)
        self.clip = float(clip)
        self.new_n = min(self.n, 2 * self.m) if new_n is None else min(new_n, self.n)
        self.bucket = int(bucket)
        self.osd_bucket = int(osd_bucket)

        method = str(osd_method).lower()
        if method in ("osd_0", "osd0", "0"):
            method, osd_order = "osd_0", 0
        elif method in ("osd_e", "osde", "e", "1"):
            method = "osd_e"
        elif method in ("osd_cs", "osdcs", "cs", "2"):
            method = "osd_cs"
        else:
            raise ValueError(f"unknown osd_method {osd_method!r}")
        self.osd_method = method
        self.osd_order = int(osd_order)

        self.graph = compile_graph(pcm)
        self.garr = graph_device_arrays(self.graph)
        self.llr = np.log((1 - channel_probs) / channel_probs).astype(np.float32)
        self._llr_dev = jnp.asarray(self.llr)

        self.rank = gf2_rank_packed(pcm)
        self.k = self.new_n - self.rank
        if self.osd_order > self.k:
            raise ValueError(
                f"osd_order must be <= new_n - rank = {self.k} "
                f"(osd_window.pyx:89 bound), got {osd_order}"
            )
        self.H_words = jnp.asarray(pack_rows_host(pcm))
        self.patterns = (
            osd_candidate_patterns(max(self.k, 1), self.osd_order, method)[:, : self.k]
            if self.k > 0
            else np.zeros((0, 0), np.uint8)
        )
        self._osd_meta = analyze_patterns(self.patterns, self.k)
        # "auto" == "xla": measured faster on the production window shapes
        # (see ops/gf2_pallas.py note)
        self.gj_engine = "xla" if gj_engine == "auto" else gj_engine
        self._core_jit = None

    def _bp(self, mv, synds, vn_state, cn_state, history, error, done, iters, n_it):
        return bp_run(
            self.garr, mv, self._llr_dev, synds, vn_state, cn_state, history,
            error, done, iters, num_iter=n_it, alpha=self.alpha, clip=self.clip,
        )

    def _shorten_post(self, synd_c, hist_c):
        """One compacted bucket: shorten -> post-BP (fixed shape).

        Returns (error [b, n] int8, post_conv, dead, iters, rel) where
        ``rel`` is the OSD reliability order (post-BP history sum, decided
        columns pinned to ±PIN). Per-shot results are independent of the
        other shots in the bucket.
        """
        bucket = synd_c.shape[0]
        n = self.n
        # (2) shorten: decide the most reliable columns to zero + peel
        llr_sum = jnp.sum(hist_c, axis=-1)
        order = jnp.argsort(llr_sum, axis=1, stable=True)
        rank_pos = (
            jnp.zeros((bucket, n), jnp.int32)
            .at[jnp.arange(bucket)[:, None], order]
            .set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bucket, n)))
        )
        drop = rank_pos >= self.new_n
        vn_c, cn_c, cd_c, dead_c = init_decimation_state(self.garr, synd_c)
        vn_c, cn_c, cd_c, dead_c = vn_set_values(
            self.garr, vn_c, cn_c, cd_c, dead_c, drop,
            jnp.zeros((bucket, n), jnp.int8),
        )
        vn_c, cn_c, cd_c, dead_c = peel(self.garr, vn_c, cn_c, cd_c, dead_c)

        # (3) post-BP on the masked graph, fresh messages and history.
        # Messages are discarded after this call and only non-converged
        # shots' histories feed OSD, so the converged-shot freeze and the
        # pre-tail history writes are skipped (same argument as BPOSD).
        mv_c = bp_init_messages(self.garr, self._llr_dev, bucket)
        hist2 = jnp.zeros((bucket, n, 4), jnp.float32)
        err_c = jnp.where(vn_c != -1, vn_c, jnp.int8(0))
        it_c = jnp.zeros((bucket,), jnp.int32)
        mv_c, hist2, err_c, done_c, it_c = bp_run(
            self.garr, mv_c, self._llr_dev, synd_c, vn_c, cn_c, hist2,
            err_c, dead_c, it_c, num_iter=self.post_max_iter,
            alpha=self.alpha, clip=self.clip, freeze_messages=False,
            history_mode="tail",
        )
        # dead shots keep the (partially decimated) BP decision
        post_conv = done_c & ~dead_c

        rel = jnp.sum(hist2, axis=-1)
        rel = jnp.where(vn_c == 1, -PIN, jnp.where(vn_c == 0, PIN, rel))
        return err_c, post_conv, dead_c, it_c, rel

    def core(self, synds):
        """Pure device-side decode: traceable under jit / shard_map, no
        host syncs (the reference contract is osd_window.pyx:158-284).
        Two compacted sorted-bucket walks, as in BPOSD.core: pre-BP
        survivors run shorten+post-BP in buckets; the (much rarer)
        post-BP survivors then run the expensive OSD in their own smaller
        buckets — the previous single walk ran the full OSD on every
        post-BP bucket even when post-BP converged everything."""
        import jax

        from .bposd import _divisor_bucket

        B = synds.shape[0]
        synds = synds.astype(jnp.uint8)
        n = self.n
        vn_state = jnp.full((B, n), -1, jnp.int8)
        cn_state = synds.astype(jnp.int8)
        mv = bp_init_messages(self.garr, self._llr_dev, B)
        history, error, done, iters = fresh_bp_state(self.garr, B)

        # (1) pre-BP on the full graph
        mv, history, error, done, iters = self._bp(
            mv, synds, vn_state, cn_state, history, error, done, iters,
            self.pre_max_iter,
        )
        error = error.astype(jnp.int8)

        # --- walk 1: shorten + post-BP over pre-BP survivors ---------------
        bucket = _divisor_bucket(B, self.bucket)
        synd_weight = jnp.sum(synds, axis=1, dtype=jnp.int32)
        key = done.astype(jnp.int32) * jnp.int32(self.m + 2) + synd_weight
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~done).astype(jnp.int32))
        rel = jnp.zeros((B, n), jnp.float32)
        dead = jnp.zeros((B,), bool)

        def body(carry):
            b, error, done, iters, rel, dead = carry
            idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
            take = lambda a: jnp.take(a, idx, axis=0)
            synd_c = take(synds)
            done_c = take(done)
            err_c, post_conv, dead_c, it_c, rel_c = self._shorten_post(
                synd_c, take(history)
            )
            # boundary buckets may straddle converged shots: keep theirs
            err_new = jnp.where(done_c[:, None], take(error), err_c)
            done_new = done_c | post_conv
            it_new = take(iters) + jnp.where(done_c, 0, it_c)
            dead_new = jnp.where(done_c, False, dead_c)
            return (
                b + 1,
                error.at[idx].set(err_new),
                done.at[idx].set(done_new),
                iters.at[idx].set(it_new),
                rel.at[idx].set(rel_c),
                dead.at[idx].set(dead_new),
            )

        _, error, done, iters, rel, dead = jax.lax.while_loop(
            lambda c: c[0] * bucket < n_todo,
            body,
            (jnp.int32(0), error, done, iters, rel, dead),
        )

        # --- walk 2: OSD over post-BP survivors only -----------------------
        # (dead shots keep the partial BP decision, as the reference's
        # contradiction abort does, osd_window.pyx:321-343)
        need_osd = ~done & ~dead
        obucket = _divisor_bucket(B, self.osd_bucket)
        order2 = jnp.argsort(~need_osd, stable=True).astype(jnp.int32)
        n_osd = jnp.sum(need_osd.astype(jnp.int32))

        def osd_body(carry):
            b, error = carry
            idx = jax.lax.dynamic_slice(order2, (b * obucket,), (obucket,))
            take = lambda a: jnp.take(a, idx, axis=0)
            osd = osd_decode(
                self.H_words, take(synds), take(rel), self._llr_dev,
                self.patterns, m=self.m, n=n, rank=self.rank, k=self.k,
                meta=self._osd_meta, engine=self.gj_engine,
            )
            use_c = take(need_osd)
            err_new = jnp.where(
                use_c[:, None], osd["solution"].astype(jnp.int8), take(error)
            )
            return b + 1, error.at[idx].set(err_new)

        _, error = jax.lax.while_loop(
            lambda c: c[0] * obucket < n_osd,
            osd_body,
            (jnp.int32(0), error),
        )
        osd_applied = need_osd

        error = error.astype(jnp.uint8)
        min_pm = jnp.sum(self._llr_dev[None, :] * (error == 1), axis=-1)
        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
            "osd_applied": osd_applied,
        }

    def decode_batch_device(self, synds):
        if self._core_jit is None:
            import jax

            self._core_jit = jax.jit(self.core)
        return self._core_jit(synds)

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        B = syndromes.shape[0]
        # pad to a bucket multiple: awkward B would force tiny divisor
        # buckets; zero-syndrome pad rows converge in pre-BP immediately
        pad_to = max(self.bucket, self.osd_bucket)
        B_pad = -(-B // pad_to) * pad_to if B > pad_to else B
        if B_pad != B:
            syndromes = np.concatenate(
                [syndromes, np.zeros((B_pad - B, self.m), syndromes.dtype)]
            )
        out = self.decode_batch_device(jnp.asarray(syndromes, jnp.uint8))
        return DecodeResult(
            error=np.asarray(out["error"])[:B],
            converged=np.asarray(out["converged"])[:B],
            iterations=np.asarray(out["iterations"])[:B],
            min_pm=np.asarray(out["min_pm"])[:B],
            osd_applied=np.asarray(out["osd_applied"])[:B],
        )

    def decode(self, syndrome) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
