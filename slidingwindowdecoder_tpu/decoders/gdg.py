"""Guided decimation with guessing (GDG) as a vmapped branch ensemble.

The reference implements GDG as 15-32 pthreads exploring a decision tree
(bpgd.cpp:419-688): a *main* path decimating the favored value each step,
*tree* threads forcing every +/- combination of the first ``max_tree_depth``
decisions, each tree thread replaying one anti-decision side branch at depth
``max_tree_depth``, and *side* threads continuing the main path with the
anti-decision at depths [tree_depth, side_depth). All converged branches
race to a mutex-guarded (min_pm, error).

Here every branch is a *data-parallel lane*: branch b differs from the main
path only through a static per-(branch, depth) flip table, so the whole
ensemble is one batched masked-BP + decimation loop over B*NB rows, and the
mutex race becomes a per-shot argmin over branch path metrics. Side
branches re-derive the main prefix instead of receiving a snapshot
(deterministic recompute == the snapshot copy, bpgd.cpp:651-664), and reset
their BP messages to priors at the flip depth exactly as the reference's
``set_masks``/``reset`` + ``init`` do.

Branch thresholds (A, A_sum) follow bpgd.cpp:431-468,588,631 and
bpgd.hpp:111: main path (-3, -16 at depth 0 else -12); once a branch takes
any anti-favored decision it switches to (0, -10).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graphs.tanner import compile_graph, graph_device_arrays
from ..ops.bp import bp_init_messages, bp_run, decode_bp, fresh_bp_state
from ..ops.decimation import (
    init_decimation_state,
    peel,
    unsatisfied_counts,
    vn_set_values,
)
from .base import DecodeResult, as_batch, pad_pow2

MAX_PM = 1e4  # reference sentinel (bpgd.cpp:11)


def build_branch_tables(
    max_step: int,
    max_tree_depth: int,
    max_side_depth: int,
    max_tree_branch_step: int,
    max_side_branch_step: int,
):
    """Static per-branch flip/threshold/budget tables.

    Branch layout: [main | tree (2^td - 1) | tree-side (2^td - 1) | side
    (sd - td)]; total = 2*(2^td - 1) + (sd - td) + 1 — the reference's
    ``max_guess`` + 1 (bp_guessing_decoder.pyx:181).
    """
    td, sd = max_tree_depth, max_side_depth
    branches = []  # (flip_depths: set, budget, reinit_depth or -1)
    branches.append((frozenset(), max_step, -1))  # main
    for tid in range(1, 2**td):
        bits = {d for d in range(td) if (tid >> (td - 1 - d)) & 1}
        budget = max_tree_branch_step + td + 1  # bpgd.cpp:449 loop bound
        branches.append((frozenset(bits), budget, -1))
    for tid in range(1, 2**td):
        bits = {d for d in range(td) if (tid >> (td - 1 - d)) & 1}
        budget = td + 1 + max_tree_branch_step
        branches.append((frozenset(bits | {td}), budget, td))
    for j in range(sd - td):
        fd = td + j
        branches.append((frozenset({fd}), fd + 1 + max_side_branch_step, fd))

    NB = len(branches)
    D_max = max(b[1] for b in branches)
    flip_now = np.zeros((NB, D_max), dtype=bool)
    reinit = np.zeros((NB, D_max), dtype=bool)
    budget = np.zeros(NB, dtype=np.int32)
    A_arr = np.zeros((NB, D_max), dtype=np.float32)
    Asum_arr = np.zeros((NB, D_max), dtype=np.float32)
    for b, (bits, bud, rd) in enumerate(branches):
        budget[b] = bud
        first_flip = min(bits) if bits else D_max + 1
        for d in range(D_max):
            flip_now[b, d] = d in bits
            on_side = d > first_flip
            A_arr[b, d] = 0.0 if on_side else -3.0
            Asum_arr[b, d] = -10.0 if on_side else (-16.0 if d == 0 else -12.0)
        if rd >= 0:
            reinit[b, rd] = True
    return {
        "flip_now": flip_now,
        "reinit": reinit,
        "budget": budget,
        "A": A_arr,
        "A_sum": Asum_arr,
        "num_branches": NB,
        "D_max": D_max,
    }


@partial(
    jax.jit,
    static_argnames=("num_iter", "D_max", "NB", "alpha", "clip", "low_error_mode",
                     "msg_dtype"),
)
def gdg_ensemble(
    garr,
    llr,
    syndrome,  # [BK, m] (one row per shot; will be tiled over branches)
    vn_state0,
    cn_state0,
    cn_degree0,
    dead0,
    flip_now,  # [NB, D_max] bool
    reinit,  # [NB, D_max] bool
    budget,  # [NB] int32
    A_arr,  # [NB, D_max]
    Asum_arr,  # [NB, D_max]
    *,
    num_iter: int,
    D_max: int,
    NB: int,
    alpha: float,
    clip: float,
    low_error_mode: bool,
    msg_dtype: str = "float32",
):
    """Run the branch ensemble; returns per-shot best error / pm / converged."""
    BK, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    BN = BK * NB

    tile = lambda x: jnp.repeat(x, NB, axis=0)  # shot-major [BK*NB, ...]
    synd = tile(syndrome)
    vn_state = tile(vn_state0)
    cn_state = tile(cn_state0)
    cn_degree = tile(cn_degree0)
    dead = tile(dead0[:, None])[:, 0]
    llr_b = jnp.broadcast_to(llr, (BN, n))

    branch_of_row = jnp.tile(jnp.arange(NB, dtype=jnp.int32), BK)
    budget_row = budget[branch_of_row]

    mv = bp_init_messages(garr, llr_b, BN)
    history, error, _, iters = fresh_bp_state(garr, BN)
    halted = dead
    converged = jnp.zeros((BN,), bool)
    conv_pm = jnp.full((BN,), MAX_PM, jnp.float32)
    conv_error = jnp.zeros((BN, n), jnp.int8)
    vn_deg = garr["vn_degree"]
    C_thr, D_thr = 30.0, 3.0

    def step(d, carry):
        (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
         converged, conv_pm, conv_error, iters) = carry
        active = ~halted & (d < budget_row)

        # --- masked BP (num_iter iterations, early per-row freeze) ---------
        mv, history, error, bp_done, iters = bp_run(
            garr, mv, llr_b, synd, vn_state, cn_state, history, error,
            ~active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
            msg_dtype=msg_dtype,
        )
        newly_conv = bp_done & active
        pm = jnp.sum(llr_b * (error == 1), axis=-1)
        conv_pm = jnp.where(newly_conv, pm, conv_pm)
        conv_error = jnp.where(newly_conv[:, None], error, conv_error)
        converged = converged | newly_conv
        halted = halted | newly_conv
        active = active & ~newly_conv

        # --- select_vn: aggressive decimation + guess choice ---------------
        A = A_arr[branch_of_row, d][:, None]
        A_sum = Asum_arr[branch_of_row, d]
        hist_min = jnp.min(history, axis=-1)
        hist_max = jnp.max(history, axis=-1)
        hist_sum = jnp.sum(history, axis=-1)
        num_flip = unsatisfied_counts(garr, error, synd, cn_state)
        eligible = (vn_state == -1) & (vn_deg[None, :] > 2) & active[:, None]

        if low_error_mode:
            mC = jnp.zeros_like(eligible)
            mD = jnp.zeros_like(eligible)
            mA = jnp.zeros_like(eligible)
        else:
            mC = eligible & (hist_min >= C_thr) & (d < 4)
            mD = eligible & ~mC & (num_flip >= 3) & (hist_min >= D_thr)
            mA = (
                eligible
                & ~mC
                & ~mD
                & (hist_max <= A)
                & (hist_sum < A_sum[:, None])
            )
        agg = mC | mD | mA

        # guess candidates evaluated before the peel (reference scan order)
        cand = eligible & ~agg
        all_neg = jnp.all(history <= 0.0, axis=-1)
        big = jnp.float32(MAX_PM)
        key_any = jnp.where(cand, hist_sum, big)
        key_neg = jnp.where(cand & all_neg, hist_sum, big)
        has_neg = jnp.any(key_neg < big, axis=-1)
        has_any = jnp.any(key_any < big, axis=-1)
        vn_neg = jnp.argmin(key_neg, axis=-1)
        vn_any = jnp.argmin(key_any, axis=-1)
        guess_vn = jnp.where(has_neg, vn_neg, vn_any).astype(jnp.int32)
        sum_any = jnp.min(key_any, axis=-1)
        favor = jnp.where(
            has_neg, jnp.int8(1), (sum_any <= 0.0).astype(jnp.int8)
        )

        # apply aggressive decimation, then peel
        vn_state, cn_state, cn_degree, dead = vn_set_values(
            garr, vn_state, cn_state, cn_degree, dead, agg, mA.astype(jnp.int8)
        )
        vn_state, cn_state, cn_degree, dead = peel(
            garr, vn_state, cn_state, cn_degree, dead
        )

        # no candidate -> branch ends (reference guess_vn == -1 break)
        halted = halted | (active & ~has_neg & ~has_any)

        # --- decision: favored, possibly flipped for this branch -----------
        flip = flip_now[branch_of_row, d]
        value = (favor ^ flip.astype(jnp.int8)).astype(jnp.int8)
        do_set = active & ~halted & ~dead
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (BN, n), 1) == guess_vn[:, None]
        ) & do_set[:, None]
        vn_state, cn_state, cn_degree, dead = vn_set_values(
            garr, vn_state, cn_state, cn_degree, dead,
            onehot, jnp.broadcast_to(value[:, None], (BN, n)),
        )
        vn_state, cn_state, cn_degree, dead = peel(
            garr, vn_state, cn_state, cn_degree, dead
        )
        halted = halted | dead

        # side branches restart BP messages from the priors at their flip
        re = reinit[branch_of_row, d] & do_set
        mv = jnp.where(re[:, None, None], bp_init_messages(garr, llr_b, BN), mv)

        # keep decided values reflected in the running error vector
        error = jnp.where(vn_state != -1, vn_state, error)
        return (mv, history, error, vn_state, cn_state, cn_degree, dead,
                halted, converged, conv_pm, conv_error, iters)

    carry = (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
             converged, conv_pm, conv_error, iters)
    carry = jax.lax.fori_loop(0, D_max, step, carry)
    (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, conv_pm, conv_error, iters) = carry

    # --- reduce over branches: min-pm among converged; main as fallback ----
    conv_pm_b = conv_pm.reshape(BK, NB)
    conv_err_b = conv_error.reshape(BK, NB, n)
    converged_b = converged.reshape(BK, NB)
    any_conv = jnp.any(converged_b, axis=1)
    best = jnp.argmin(jnp.where(converged_b, conv_pm_b, MAX_PM), axis=1)
    best_err = jnp.take_along_axis(conv_err_b, best[:, None, None], axis=1)[:, 0]
    main_err = error.reshape(BK, NB, n)[:, 0]
    final_err = jnp.where(any_conv[:, None], best_err, main_err)
    best_pm = jnp.min(jnp.where(converged_b, conv_pm_b, MAX_PM), axis=1)
    total_iters = jnp.sum(iters.reshape(BK, NB), axis=1)
    return {
        "error": final_err.astype(jnp.uint8),
        "converged": any_conv,
        "min_pm": best_pm,
        "iterations": total_iters,
    }


class GDG:
    """Batched GDG decoder mirroring ``bpgdg_decoder`` (multi-thread
    semantics, bp_guessing_decoder.pyx:160-251).

    Shortening is realized by *deciding* the n - new_n most-reliable columns
    to 0 on the full masked graph (equivalent to the reference's column
    sub-PCM; SURVEY.md §2.1) followed by a peel.
    """

    def __init__(
        self,
        pcm,
        channel_probs,
        *,
        max_iter: int = 50,
        max_iter_per_step: int = 6,
        max_step: int = 25,
        max_tree_depth: int = 3,
        max_side_depth: int = 10,
        max_tree_branch_step: int = 10,
        max_side_branch_step: int = 10,
        ms_scaling_factor: float = 1.0,
        gdg_factor: float = 1.0,
        new_n: int | None = None,
        low_error_mode: bool = False,
        clip: float = 50.0,
        ensemble_bucket: int = 64,
        msg_dtype: str = "float32",
    ):
        pcm = np.asarray(pcm)
        self.m, self.n = pcm.shape
        channel_probs = np.asarray(channel_probs, dtype=np.float64)
        if np.any((channel_probs <= 0) | (channel_probs >= 1)):
            raise ValueError("channel_probs must lie strictly in (0, 1)")
        self.max_iter = int(max_iter)
        self.alpha = float(ms_scaling_factor)
        self.gdg_factor = float(gdg_factor)
        self.clip = float(clip)
        self.num_iter_per_step = int(max_iter_per_step)
        self.low_error_mode = bool(low_error_mode)
        self.msg_dtype = str(msg_dtype)
        self.new_n = min(self.n, 2 * self.m) if new_n is None else min(new_n, self.n)
        self.ensemble_bucket = int(ensemble_bucket)

        self.graph = compile_graph(pcm)
        self.garr = graph_device_arrays(self.graph)
        self.llr = np.log((1 - channel_probs) / channel_probs).astype(np.float32)
        self._llr_dev = jnp.asarray(self.llr)

        tables = build_branch_tables(
            max_step,
            max_tree_depth,
            max_side_depth,
            max_tree_branch_step,
            max_side_branch_step,
        )
        self.NB = tables["num_branches"]
        self.D_max = tables["D_max"]
        self._tables = {
            k: jnp.asarray(v)
            for k, v in tables.items()
            if k in ("flip_now", "reinit", "budget", "A", "A_sum")
        }

    def _shorten_state(self, synds, llr_sum):
        """Decide the most-reliable n - new_n columns to 0, then peel."""
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
            msg_dtype=self.msg_dtype,
        )
        converged = np.asarray(pre["converged"])[:B].copy()
        error = np.asarray(pre["error"]).astype(np.uint8)[:B]
        iters = np.asarray(pre["iterations"])[:B].copy()
        min_pm = (error * self.llr[None, :]).sum(axis=1).astype(np.float32)

        todo = np.nonzero(~converged)[0]
        if len(todo):
            llr_sum = np.asarray(pre["llr_sum"])[:B]
            bucket = min(self.ensemble_bucket, pad_pow2(len(todo), floor=8))
            for lo in range(0, len(todo), bucket):
                chunk = todo[lo : lo + bucket]
                s = np.zeros((bucket, self.m), dtype=np.uint8)
                ls = np.zeros((bucket, self.n), dtype=np.float32)
                s[: len(chunk)] = syndromes[chunk]
                ls[: len(chunk)] = llr_sum[chunk]
                vn0, cn0, cd0, dead0 = self._shorten_state(s, ls)
                out = gdg_ensemble(
                    self.garr,
                    self._llr_dev,
                    jnp.asarray(s),
                    vn0,
                    cn0,
                    cd0,
                    dead0,
                    self._tables["flip_now"],
                    self._tables["reinit"],
                    self._tables["budget"],
                    self._tables["A"],
                    self._tables["A_sum"],
                    num_iter=self.num_iter_per_step,
                    D_max=self.D_max,
                    NB=self.NB,
                    alpha=self.gdg_factor,
                    clip=self.clip,
                    low_error_mode=self.low_error_mode,
                    msg_dtype=self.msg_dtype,
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
