"""Batched BP + ordered-statistics decoder.

The TPU-native counterpart of the reference's workhorse ``BpOsdDecoder``
(Roffe's ldpc package, driven at osd.py:142-150 and simulation.py:39-47):
normalized min-sum BP to ``max_iter``, then OSD-0 / OSD-E / OSD-CS
post-processing on the shots BP failed to converge.

Throughput structure (this is the hot path of the whole framework):

- *Single traced program*: ``core`` is a pure function of the syndrome
  batch — no host round-trips anywhere. It runs under ``jit`` on one chip
  and unchanged under ``shard_map`` over a shots mesh (each shard compacts
  locally; there are no collectives, so shards proceed independently).
- *Two-phase BP with device-side compaction*: the reference decodes
  shot-at-a-time, so its per-shot cost is the per-shot iteration count; a
  lockstep batch would pay ``max_iter`` for everyone. Phase A runs a short
  budget on the full batch (most shots converge in a few iterations);
  survivors are sorted to the front (argsort on the convergence mask, with
  syndrome weight as a difficulty tiebreak so buckets are homogeneous) and
  a ``while_loop`` walks fixed-size buckets of them for the remaining
  budget — each bucket exits as soon as all of its shots converge, so easy
  buckets stop early and only the hard tail runs the full budget.
- *OSD only on the non-converged shots*, via the same sorted-bucket walk
  with a single compiled shape.

Per-shot results are bit-identical regardless of bucket composition: BP
and OSD are shot-independent, so compaction is purely a scheduling choice.
"""

from __future__ import annotations

import math

import jax
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


def _divisor_bucket(B: int, want: int) -> int:
    """Largest bucket size <= want that divides B (so the sorted-bucket
    walk never overlaps a processed shot; trace-time, B/want static).

    A true largest-divisor search, not gcd: gcd(5632, 2048) = 512 but the
    largest divisor of 5632 that is <= 2048 is 1408 — gcd badly
    under-buckets non-power-of-two batches (worst case prime B -> 1)."""
    want = max(1, min(want, B))
    return next(d for d in range(want, 0, -1) if B % d == 0)


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
      bp_bucket / osd_bucket: compacted bucket sizes for phase B and OSD.
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
        bp_bucket: int = 512,
        osd_bucket: int = 512,
        phase_a_iters: int | None = 24,
        phase_b_spans="auto",
        msg_dtype: str = "float32",
        gj_engine: str = "auto",
        cn_engine: str = "auto",
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
        # phase B runs in spans with a re-compaction (sort + bucket walk)
        # between them: shots that converge in an early span stop paying for
        # the never-converging (OSD-bound) tail that forces later buckets to
        # run the full budget. Spans are multiples of 4 so the history ring
        # slots line up and the trajectory is bit-identical to one long run.
        it_b = self.phase_iters[1]
        if phase_b_spans is None or it_b == 0:
            self.phase_b_spans = (it_b,) if it_b else ()
        elif phase_b_spans == "auto":
            self.phase_b_spans = (48, it_b - 48) if it_b > 96 else (it_b,)
        else:
            spans = tuple(int(s) for s in phase_b_spans)
            if sum(spans) != it_b or any(s <= 0 for s in spans):
                raise ValueError(
                    f"phase_b_spans must be positive and sum to {it_b}"
                )
            if any(s % 4 for s in spans[:-1]):
                raise ValueError(
                    "non-final phase_b_spans must be multiples of 4 "
                    "(history ring alignment)"
                )
            self.phase_b_spans = spans

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
        self.bp_bucket = int(bp_bucket)
        self.osd_bucket = int(osd_bucket)

        self.graph = compile_graph(pcm)
        self.garr = graph_device_arrays(self.graph)
        # bf16 mode replaces the VN-side row gather (slow path on this
        # backend) with an MXU matmul against the static incidence when
        # the constant is small enough to stay resident
        self._posterior_matmul = (
            self.msg_dtype == "bfloat16"
            and self.n * self.graph.dc * self.graph.m_pad <= 64_000_000
        )
        if self._posterior_matmul:
            from ..graphs.tanner import vn_incidence_host

            self.garr = dict(self.garr)
            self.garr["vn_inc"] = jnp.asarray(
                vn_incidence_host(self.graph), jnp.bfloat16
            )
        self.llr = np.log((1 - channel_probs) / channel_probs).astype(np.float32)
        self._llr_dev = jnp.asarray(self.llr)
        # "auto" resolves inside bp_run: the fused Pallas CN kernel when
        # on a real TPU and the shape fits (round-5 rewrite removed the
        # Mosaic i1-relayout and int8/bf16-compare failure modes; the
        # kernel is bit-identical in both dtypes and 1.6-1.9x the XLA CN
        # stage at the flagship window shape), XLA otherwise.
        self.cn_engine = cn_engine

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
            # "auto" == "xla": measured faster than the Pallas engine on the
            # production window shapes (XLA already keeps the GJ fori-loop
            # state on-chip; see ops/gf2_pallas.py note)
            self.gj_engine = "xla" if gj_engine == "auto" else gj_engine
        self._pcm = pcm
        self._core_jit = jax.jit(self.core)

    # -- device stages -------------------------------------------------------

    def _run_bp(self, mv, synds, vn_state, cn_state, history, error, done, iters,
                num_iter, *, history_mode):
        # BPOSD never decimates: every VN stays undecided and every CN active,
        # so the unmasked fast path applies. Converged shots' messages are
        # never consumed downstream (history drives OSD; errors are frozen by
        # the active mask), so the message freeze is skipped too.
        B = synds.shape[0]
        cn_engine = self.cn_engine if B % 128 == 0 else "xla"
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
            masked=False,
            freeze_messages=False,
            history_mode=history_mode,
            posterior_matmul=self._posterior_matmul,
            cn_engine=cn_engine,
        )

    def _reliability(self, history, total_iters: int):
        if self.reliability == "history_sum":
            return jnp.sum(history, axis=-1)
        return history[..., (total_iters - 1) % 4]

    def _core_bp(self, synds):
        """Phases A+B (no OSD): pure, traced. Returns (error, done, iters,
        min_pm, rel) — ``rel`` is the OSD reliability ordering key, or
        None when OSD is off."""
        B = synds.shape[0]
        n = self.n
        m = self.m
        it_a, it_b = self.phase_iters
        osd_on = self.osd_method is not None
        synds = synds.astype(jnp.uint8)

        vn_state = jnp.full((B, n), -1, jnp.int8)
        cn_state = synds.astype(jnp.int8)
        mv = bp_init_messages(self.garr, self._llr_dev, B)
        history, error, done, iters = fresh_bp_state(self.garr, B)

        # phase A history is dead whenever phase B exists (every shot that
        # reaches OSD is re-run there); the live phase only needs the final
        # 4 posterior slots ("tail").
        live_a = it_b == 0 and osd_on
        mv, history, error, done, iters = self._run_bp(
            mv, synds, vn_state, cn_state, history, error, done, iters, it_a,
            history_mode="tail" if live_a else "none",
        )

        if it_b > 0:
            bucket = _divisor_bucket(B, self.bp_bucket)
            # survivors first, easy (light-syndrome) shots together so
            # whole-bucket early exit actually fires; re-sorted before every
            # span so early-span convergers drop out of the walk entirely
            synd_weight = jnp.sum(synds, axis=1, dtype=jnp.int32)
            for si, sp in enumerate(self.phase_b_spans):
                last_span = si == len(self.phase_b_spans) - 1
                hmode = "tail" if (osd_on and last_span) else "none"
                key = done.astype(jnp.int32) * jnp.int32(m + 2) + synd_weight
                order = jnp.argsort(key, stable=True).astype(jnp.int32)
                n_todo = jnp.sum((~done).astype(jnp.int32))

                def bp_body(carry, sp=sp, hmode=hmode):
                    b, mv, history, error, done, iters = carry
                    idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
                    take = lambda a: jnp.take(a, idx, axis=0)
                    sub_synds = take(synds)
                    mv_c, hist_c, err_c, done_c, it_c = self._run_bp(
                        take(mv),
                        sub_synds,
                        jnp.full((bucket, n), -1, jnp.int8),
                        sub_synds.astype(jnp.int8),
                        take(history),
                        take(error),
                        take(done),
                        take(iters),
                        sp,
                        history_mode=hmode,
                    )
                    upd = lambda a, v: a.at[idx].set(v)
                    return (
                        b + 1,
                        upd(mv, mv_c),
                        upd(history, hist_c),
                        upd(error, err_c),
                        upd(done, done_c),
                        upd(iters, it_c),
                    )

                _, mv, history, error, done, iters = jax.lax.while_loop(
                    lambda c: c[0] * bucket < n_todo,
                    bp_body,
                    (jnp.int32(0), mv, history, error, done, iters),
                )

        error = error.astype(jnp.uint8)
        min_pm = jnp.sum(
            jnp.where(error == 1, self._llr_dev[None, :], 0.0), axis=-1
        )
        if osd_on:
            # posterior slots: non-converged shots' histories were last
            # written by their final BP call
            last_iters = it_b if it_b > 0 else it_a
            rel = self._reliability(history, last_iters)
        else:
            rel = None
        return synds, error, done, iters, min_pm, rel

    def core(self, synds):
        """Pure device-side decode: traceable under jit / shard_map.

        ``synds``: [B, m] uint8/bool. Returns dict of device arrays: error
        [B, n] uint8, converged [B] bool, iterations [B] int32, min_pm [B]
        f32, osd_applied [B] bool. Contains no host syncs; per-shot results
        do not depend on B or on the other shots in the batch.

        NOTE (round 5): when this whole computation compiles as ONE
        program, XLA stages the OSD elimination state through scoped-vmem
        async copies at ~100x the cost of the standalone OSD program (the
        eager-composed form runs the same osd_decode at 0.3 ms per
        256-bucket vs 32 ms fused — tools/ probes). Single-device entry
        points therefore use ``decode_batch_device`` (host-staged OSD);
        ``core`` remains the pure form for shard_map/multi-chip use.
        """
        B = synds.shape[0]
        m, n = self.m, self.n
        osd_on = self.osd_method is not None
        synds, error, done, iters, min_pm, rel = self._core_bp(synds)
        osd_applied = jnp.zeros((B,), bool)

        if osd_on:
            obucket = _divisor_bucket(B, self.osd_bucket)
            order2 = jnp.argsort(done.astype(jnp.int32), stable=True).astype(
                jnp.int32
            )
            n_osd = jnp.sum((~done).astype(jnp.int32))

            def osd_body(carry):
                b, error, min_pm = carry
                idx = jax.lax.dynamic_slice(order2, (b * obucket,), (obucket,))
                take = lambda a: jnp.take(a, idx, axis=0)
                osd = osd_decode(
                    self.H_words,
                    take(synds),
                    take(rel),
                    self._llr_dev,
                    self.patterns,
                    m=m,
                    n=n,
                    rank=self.rank,
                    k=self.k,
                    meta=self._osd_meta,
                    engine=self.gj_engine,
                )
                # boundary buckets may straddle converged shots: keep theirs
                done_c = take(done)
                err_new = jnp.where(
                    done_c[:, None], take(error), osd["solution"].astype(jnp.uint8)
                )
                pm_new = jnp.where(done_c, take(min_pm), osd["min_pm"])
                return b + 1, error.at[idx].set(err_new), min_pm.at[idx].set(pm_new)

            _, error, min_pm = jax.lax.while_loop(
                lambda c: c[0] * obucket < n_osd,
                osd_body,
                (jnp.int32(0), error, min_pm),
            )
            osd_applied = ~done

        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
            "osd_applied": osd_applied,
        }

    def decode_batch_device(self, synds, *, osd_stage: str = "fused"):
        """Jitted ``core`` (default). ``osd_stage="host"`` instead runs
        the jitted BP phases + a host-staged OSD loop of standalone
        programs — useful for diagnosing compiled-OSD regressions (the
        round-5 sortless OSD made the fused form fast; before it, the
        fused OSD paid ~10x its standalone cost in scoped-vmem staging).
        Results are bit-identical between the two stagings.
        """
        if self.osd_method is None or osd_stage == "fused":
            return self._core_jit(synds)
        if not hasattr(self, "_bp_core_jit"):
            self._bp_core_jit = jax.jit(self._core_bp)
        synds_d, error, done, iters, min_pm, rel = self._bp_core_jit(synds)
        done_h = np.asarray(done)  # the one host sync
        todo = np.nonzero(~done_h)[0]
        B = synds_d.shape[0]
        obucket = min(self.osd_bucket, max(32, len(todo)))
        for lo in range(0, len(todo), obucket):
            chunk = todo[lo : lo + obucket]
            g = np.full(obucket, int(chunk[0]), np.int32)
            g[: len(chunk)] = chunk
            scat = np.full(obucket, B, np.int32)  # out-of-range pad: dropped
            scat[: len(chunk)] = chunk
            g_idx, s_idx = jnp.asarray(g), jnp.asarray(scat)
            osd = osd_decode(
                self.H_words,
                jnp.take(synds_d, g_idx, axis=0),
                jnp.take(rel, g_idx, axis=0),
                self._llr_dev,
                self.patterns,
                m=self.m,
                n=self.n,
                rank=self.rank,
                k=self.k,
                meta=self._osd_meta,
                engine=self.gj_engine,
            )
            error = error.at[s_idx].set(
                osd["solution"].astype(jnp.uint8), mode="drop"
            )
            min_pm = min_pm.at[s_idx].set(osd["min_pm"], mode="drop")
        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
            "osd_applied": ~done,
        }

    # -- host API ------------------------------------------------------------

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        B = syndromes.shape[0]
        # pad to a bucket multiple so the compacted walks use full-size
        # buckets (an awkward B would otherwise force a smaller divisor
        # bucket); zero-syndrome pad rows converge on their first phase-A
        # iteration and never enter a bucket
        pad_to = max(self.bp_bucket, self.osd_bucket)
        B_pad = -(-B // pad_to) * pad_to if B > pad_to else B
        if B_pad != B:
            syndromes = np.concatenate(
                [syndromes, np.zeros((B_pad - B, self.m), syndromes.dtype)]
            )
        out = self.decode_batch_device(jnp.asarray(syndromes, jnp.uint8))
        if B_pad != B:
            out = {k: v[:B] for k, v in out.items()}
        return DecodeResult(
            error=np.asarray(out["error"]),
            converged=np.asarray(out["converged"]),
            iterations=np.asarray(out["iterations"]),
            min_pm=np.asarray(out["min_pm"]),
            osd_applied=np.asarray(out["osd_applied"]),
        )

    def decode(self, syndrome) -> np.ndarray:
        """Single-shot convenience mirroring the reference ``decode`` API."""
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
