"""Batched BP + ordered-statistics decoder.

The TPU-native counterpart of the reference's workhorse ``BpOsdDecoder``
(Roffe's ldpc package, driven at osd.py:142-150 and simulation.py:39-47):
normalized min-sum BP to ``max_iter``, then OSD-0 / OSD-E / OSD-CS
post-processing on the shots BP failed to converge.

Throughput structure (this is the hot path of the whole framework):

- *Device-resident*: ``decode_batch_device`` consumes and produces device
  arrays so the sliding-window pipeline never round-trips shot-sized data
  through the host; only tiny convergence bitmaps come back to drive
  compaction.
- *Two-phase BP with compaction*: the reference decodes shot-at-a-time, so
  its per-shot cost is the per-shot iteration count; a lockstep batch would
  pay ``max_iter`` for everyone. Phase A runs a short budget on the full
  batch (most shots converge in a few iterations); survivors are compacted
  into fixed-size buckets that run the remaining budget — restoring
  reference-equivalent results (same messages, continued) at near
  reference-average cost.
- *OSD only on the non-converged bucket* with a single compiled shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graphs.tanner import compile_graph, graph_device_arrays
from ..ops.bp import bp_init_messages, bp_run, fresh_bp_state
from ..ops.gf2_solve import (
    analyze_patterns,
    gf2_rank_packed,
    osd_candidate_patterns,
    osd_decode,
    pack_rows_host,
)
from .base import DecodeResult, as_batch


class BPOSD:
    """Batched BP+OSD decoder for one parity-check matrix.

    Args:
      pcm: [m, n] binary parity-check matrix (dense numpy).
      channel_probs: [n] prior error probabilities.
      max_iter: total BP iterations (reference default 100 / osd.py uses 200).
      ms_scaling_factor: min-sum normalization alpha.
      osd_method: "osd_0" | "osd_e" | "osd_cs" ("off" disables OSD).
      osd_order: search depth (OSD-CS default 10, as in osd.py:149).
      reliability: "last" orders columns by the final BP posterior (ldpc
        package behavior); "history_sum" uses the 4-iteration posterior sum
        (osd_window behavior, osd_window.pyx:174-176).
      phase_a_iters: BP iterations run on the full batch before compaction.
    """

    def __init__(
        self,
        pcm,
        channel_probs,
        *,
        max_iter: int = 100,
        ms_scaling_factor: float = 1.0,
        osd_method: str = "osd_cs",
        osd_order: int = 10,
        reliability: str = "last",
        clip: float = 50.0,
        osd_bucket: int = 512,
        phase_a_iters: int | None = 24,
        msg_dtype: str = "float32",
    ):
        pcm = np.asarray(pcm)
        self.m, self.n = pcm.shape
        channel_probs = np.asarray(channel_probs, dtype=np.float64)
        if channel_probs.shape != (self.n,):
            raise ValueError(f"channel_probs must have shape ({self.n},)")
        if np.any((channel_probs <= 0) | (channel_probs >= 1)):
            raise ValueError("channel_probs must lie strictly in (0, 1)")
        self.max_iter = int(max_iter)
        self.alpha = float(ms_scaling_factor)
        self.clip = float(clip)
        if reliability not in ("last", "history_sum"):
            raise ValueError("reliability must be 'last' or 'history_sum'")
        self.reliability = reliability
        self.msg_dtype = str(msg_dtype)
        if phase_a_iters is None or phase_a_iters >= self.max_iter:
            self.phase_iters = (self.max_iter, 0)
        else:
            self.phase_iters = (int(phase_a_iters), self.max_iter - int(phase_a_iters))
        # Phase B runs in spans with re-compaction between them: survivors of
        # an early span are re-packed into fewer buckets before the long tail
        # (most shots that converge at all do so early, so the span boundary
        # sheds most of the padded bucket slots).
        it_b = self.phase_iters[1]
        if it_b > 96:
            self.phase_b_spans: tuple[int, ...] = (48, it_b - 48)
        elif it_b > 0:
            self.phase_b_spans = (it_b,)
        else:
            self.phase_b_spans = ()

        method = str(osd_method).lower()
        if method in ("osd_0", "osd0", "0"):
            method, osd_order = "osd_0", 0
        elif method in ("osd_e", "osde", "e", "exhaustive", "1"):
            method = "osd_e"
        elif method in ("osd_cs", "osdcs", "cs", "combination_sweep", "2"):
            method = "osd_cs"
        elif method in ("-1", "off", "none"):
            method = None
        else:
            raise ValueError(f"unknown osd_method {osd_method!r}")
        self.osd_method = method
        self.osd_order = int(osd_order)
        self.osd_bucket = int(osd_bucket)

        self.graph = compile_graph(pcm)
        self.garr = graph_device_arrays(self.graph)
        self.llr = np.log((1 - channel_probs) / channel_probs).astype(np.float32)
        self._llr_dev = jnp.asarray(self.llr)

        if method is not None:
            self.rank = gf2_rank_packed(pcm)
            self.k = self.n - self.rank
            if self.osd_order > self.k:
                raise ValueError(
                    f"osd_order must be <= n - rank = {self.k}, got {osd_order}"
                )
            self.H_words = jnp.asarray(pack_rows_host(pcm))
            self.patterns = osd_candidate_patterns(self.k, self.osd_order, method)
            self._osd_meta = analyze_patterns(self.patterns, self.k)
        self._pcm = pcm

    # -- device stages -------------------------------------------------------

    def _run_bp(self, mv, synds, vn_state, cn_state, history, error, done, iters,
                num_iter, *, history_mode="full", freeze_messages=True):
        return bp_run(
            self.garr,
            mv,
            self._llr_dev,
            synds,
            vn_state,
            cn_state,
            history,
            error,
            done,
            iters,
            num_iter=num_iter,
            alpha=self.alpha,
            clip=self.clip,
            msg_dtype=self.msg_dtype,
            history_mode=history_mode,
            freeze_messages=freeze_messages,
        )

    def _phase_flags(self, phase: str) -> dict:
        """Work-skipping flags per BP phase.

        Downstream only ever consumes (a) converged shots' *error* (frozen
        by the active mask regardless of message freezing) and (b)
        non-converged shots' *history* from their final BP call (the OSD
        reliability order). So messages never need the convergence freeze,
        phase A's history is dead whenever phase B exists (every
        non-converged shot gets re-run there), and the live phase only
        needs the final 4 posterior slots ("tail").
        """
        it_a, it_b = self.phase_iters
        if phase == "a":
            live = it_b == 0 and self.osd_method is not None
        else:
            live = self.osd_method is not None
        return {
            "freeze_messages": False,
            "history_mode": "tail" if live else "none",
        }

    def _reliability(self, history, total_iters: int):
        if self.reliability == "history_sum":
            return jnp.sum(history, axis=-1)
        return history[..., (total_iters - 1) % 4]

    def decode_batch_device(self, synds):
        """Fully device-side decode. ``synds``: [B, m] device array.

        Returns dict of device arrays: error [B, n] uint8, converged [B]
        bool, iterations [B] int32, min_pm [B] f32.
        """
        B = synds.shape[0]
        n = self.n
        vn_state = jnp.full((B, n), -1, jnp.int8)
        cn_state = synds.astype(jnp.int8)
        mv = bp_init_messages(self.garr, self._llr_dev, B)
        history, error, done, iters = fresh_bp_state(self.garr, B)

        it_a, it_b = self.phase_iters
        mv, history, error, done, iters = self._run_bp(
            mv, synds, vn_state, cn_state, history, error, done, iters, it_a,
            **self._phase_flags("a"),
        )

        # difficulty proxy for homogeneous buckets: syndrome weight (heavier
        # syndromes converge later or never). Sorting todo by it clusters
        # easy shots together so whole-bucket early exit actually fires.
        synd_weight = np.asarray(jnp.sum(synds, axis=1, dtype=jnp.int32))
        conv_host = np.asarray(done)  # tiny [B] transfer drives compaction
        todo = np.nonzero(~conv_host)[0]
        todo = todo[np.argsort(synd_weight[todo], kind="stable")]

        def bucket_indices(chunk, bucket):
            # gather clamps padding to a real row; scatter drops it (index B)
            g = np.full(bucket, int(chunk[0]), dtype=np.int32)
            g[: len(chunk)] = chunk
            s = np.full(bucket, B, dtype=np.int32)
            s[: len(chunk)] = chunk
            return jnp.asarray(g), jnp.asarray(s)

        bucket = max(32, self.osd_bucket)  # fixed shape: one compile per span
        for si, span in enumerate(self.phase_b_spans):
            if not len(todo):
                break
            # Only the final span's history survives into the OSD reliability
            # order; intermediate spans skip the history writes entirely.
            flags = self._phase_flags("b")
            if si + 1 < len(self.phase_b_spans):
                flags["history_mode"] = "none"
            for lo in range(0, len(todo), bucket):
                chunk = todo[lo : lo + bucket]
                g_idx, s_idx = bucket_indices(chunk, bucket)
                sub = lambda a: jnp.take(a, g_idx, axis=0)
                mv_c, hist_c, err_c, done_c, it_c = self._run_bp(
                    sub(mv),
                    sub(synds),
                    sub(vn_state),
                    sub(cn_state),
                    sub(history),
                    sub(error),
                    jnp.zeros((bucket,), bool),
                    sub(iters),
                    span,
                    **flags,
                )
                upd = lambda full, part: full.at[s_idx].set(part, mode="drop")
                mv = upd(mv, mv_c)
                history = upd(history, hist_c)
                error = upd(error, err_c)
                iters = upd(iters, it_c)
                done = upd(done, done_c)
            conv_host = np.asarray(done)
            todo = np.nonzero(~conv_host)[0]
            todo = todo[np.argsort(synd_weight[todo], kind="stable")]

        error = error.astype(jnp.uint8)
        min_pm = jnp.sum(self._llr_dev[None, :] * (error == 1), axis=-1)
        osd_applied = np.zeros(B, dtype=bool)

        if self.osd_method is not None and len(todo):
            # posterior slots: the non-converged shots' histories were last
            # written by their final BP call (the last phase-B span)
            last_call_iters = self.phase_b_spans[-1] if it_b > 0 else it_a
            rel = self._reliability(history, last_call_iters)
            bucket = max(32, self.osd_bucket)  # fixed shape: one compile
            for lo in range(0, len(todo), bucket):
                chunk = todo[lo : lo + bucket]
                g_idx, s_idx = bucket_indices(chunk, bucket)
                osd = osd_decode(
                    self.H_words,
                    jnp.take(synds, g_idx, axis=0),
                    jnp.take(rel, g_idx, axis=0),
                    self._llr_dev,
                    self.patterns,
                    m=self.m,
                    n=self.n,
                    rank=self.rank,
                    k=self.k,
                    meta=self._osd_meta,
                )
                error = error.at[s_idx].set(
                    osd["solution"].astype(jnp.uint8), mode="drop"
                )
                min_pm = min_pm.at[s_idx].set(osd["min_pm"], mode="drop")
            osd_applied[todo] = True

        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
            "osd_applied": osd_applied,
        }

    # -- host API ------------------------------------------------------------

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        out = self.decode_batch_device(jnp.asarray(syndromes, jnp.uint8))
        return DecodeResult(
            error=np.asarray(out["error"]),
            converged=np.asarray(out["converged"]),
            iterations=np.asarray(out["iterations"]),
            min_pm=np.asarray(out["min_pm"]),
            osd_applied=out["osd_applied"],
        )

    def decode(self, syndrome) -> np.ndarray:
        """Single-shot convenience mirroring the reference ``decode`` API."""
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
