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
from ..ops.bp import (
    bp_init_messages,
    bp_init_messages_sm,
    bp_run,
    decode_bp,
    fresh_bp_state,
)
from ..ops.decimation import (
    init_decimation_state,
    peel,
    peel_t,
    unsatisfied_counts,
    unsatisfied_counts_t,
    vn_set_values,
    vn_set_values_t,
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

    # Snapshot structure (the reference hands side threads a state copy at
    # their flip depth, bpgd.cpp:651-664; here the prefix is either
    # recomputed — fused/host_loop forms — or copied at a span boundary in
    # the spans form): a lane whose decisions equal another lane's until
    # depth d can lie DORMANT until d and copy that lane's state there.
    #   tree-side lane (bits | {td}) == its tree lane (bits) until td
    #   side lane {fd}               == the main lane until fd
    copy_from = np.full(NB, -1, dtype=np.int32)
    copy_at = np.full(NB, -1, dtype=np.int32)
    for tid in range(1, 2**td):
        copy_from[(2**td - 1) + tid] = tid  # tree-side <- its tree lane
        copy_at[(2**td - 1) + tid] = td
    for j in range(sd - td):
        b = 2 * (2**td - 1) + 1 + j
        copy_from[b] = 0  # side lane <- main
        copy_at[b] = td + j
    return {
        "flip_now": flip_now,
        "reinit": reinit,
        "budget": budget,
        "A": A_arr,
        "A_sum": Asum_arr,
        "copy_from": copy_from,
        "copy_at": copy_at,
        "num_branches": NB,
        "D_max": D_max,
    }


def _select_and_decimate(
    garr,
    hist_stats,  # (hist_min, hist_max, hist_sum, all_neg), each [B, n]
    error,
    synd,
    vn_state,
    cn_state,
    cn_degree,
    dead,
    active,
    A_col,  # [B, 1] threshold A per row
    A_sum_row,  # [B] threshold A_sum per row
    c_allowed,  # [B] bool: depth < 4 gate on the C rule
    *,
    low_error_mode: bool,
    vn_deg,
    synd_hat=None,  # decoded syndrome of `error`, if the caller has it
    scan_rank=None,  # [B, n] reliability rank of each VN (tie-break)
):
    """The reference ``select_vn`` scan (bpgd.cpp:288-351 == pyx:340-442):
    aggressive C/D/A decimation applied at once + peel, then the guess
    choice (min history-sum, preferring all-negative histories).

    Returns (vn_state, cn_state, cn_degree, dead, guess_vn, favor,
    has_cand). Shared by the vmapped ensemble and the serial work-queue.
    """
    C_thr, D_thr = 30.0, 3.0
    B, n = vn_state.shape
    hist_min, hist_max, hist_sum, all_neg = hist_stats
    eligible = (vn_state == -1) & (vn_deg[None, :] > 2) & active[:, None]

    if low_error_mode:
        mC = jnp.zeros_like(eligible)
        mD = jnp.zeros_like(eligible)
        mA = jnp.zeros_like(eligible)
    else:
        num_flip = unsatisfied_counts(
            garr, error, synd, cn_state, synd_hat=synd_hat
        )
        mC = eligible & (hist_min >= C_thr) & c_allowed[:, None]
        mD = eligible & ~mC & (num_flip >= 3) & (hist_min >= D_thr)
        mA = (
            eligible
            & ~mC
            & ~mD
            & (hist_max <= A_col)
            & (hist_sum < A_sum_row[:, None])
        )
    agg = mC | mD | mA

    # guess candidates evaluated before the peel (reference scan order)
    cand = eligible & ~agg
    big = jnp.float32(MAX_PM)
    key_any = jnp.where(cand, hist_sum, big)
    key_neg = jnp.where(cand & all_neg, hist_sum, big)
    has_neg = jnp.any(key_neg < big, axis=-1)
    has_any = jnp.any(key_any < big, axis=-1)
    if scan_rank is None:
        vn_neg = jnp.argmin(key_neg, axis=-1)
        vn_any = jnp.argmin(key_any, axis=-1)
    else:
        # the reference scans VNs in reliability order (the column-permuted
        # sub-PCM, pyx:357) with strict `<`, so an exact history-sum tie
        # goes to the earliest-scanned (most unreliable) candidate: among
        # the exact-minimum keys, pick the smallest scan rank. Elementwise
        # + reductions only — a per-row permutation gather
        # (take_along_axis) here crashes the TPU worker on the large W>=4
        # window graphs (docs/GDG_W4_CRASH.md).
        big_i = jnp.int32(1 << 30)
        kmin_neg = jnp.min(key_neg, axis=-1, keepdims=True)
        kmin_any = jnp.min(key_any, axis=-1, keepdims=True)
        vn_neg = jnp.argmin(
            jnp.where(key_neg <= kmin_neg, scan_rank, big_i), axis=-1
        )
        vn_any = jnp.argmin(
            jnp.where(key_any <= kmin_any, scan_rank, big_i), axis=-1
        )
    guess_vn = jnp.where(has_neg, vn_neg, vn_any).astype(jnp.int32)
    sum_any = jnp.min(key_any, axis=-1)
    favor = jnp.where(has_neg, jnp.int8(1), (sum_any <= 0.0).astype(jnp.int8))

    vn_state, cn_state, cn_degree, dead = vn_set_values(
        garr, vn_state, cn_state, cn_degree, dead, agg, mA.astype(jnp.int8)
    )
    vn_state, cn_state, cn_degree, dead = peel(
        garr, vn_state, cn_state, cn_degree, dead
    )
    return vn_state, cn_state, cn_degree, dead, guess_vn, favor, has_neg | has_any


def _select_and_decimate_t(
    garr,
    hist_stats,  # (hist_min, hist_max, hist_sum, all_neg), each [n, B]
    synd_t,  # [m_pad, B]
    vn_t,
    cn_t,
    deg_t,
    dead,
    active,  # [B]
    A_row,  # [B]
    A_sum_row,  # [B]
    c_allowed,  # [B]
    *,
    low_error_mode: bool,
    vn_deg,
    synd_hat_t,  # [m_pad, B] decoded syndrome (pad rows match synd_t)
    scan_rank_t,  # [n, B]
):
    """Transposed ``_select_and_decimate`` — the ensemble hot path.

    Identical decision semantics (see the batch-major docstring); every
    array is batch-minor so the per-row any/min/argmin reductions run
    along the major axis instead of across lanes (the batch-major form's
    lane reductions stage through SMEM at ~5.8 ms each on the W>=4
    ensemble widths, tools/profile_gdg_w4_step.py round 5)."""
    C_thr, D_thr = 30.0, 3.0
    n, B = vn_t.shape
    hist_min, hist_max, hist_sum, all_neg = hist_stats
    eligible = (vn_t == -1) & (vn_deg[:, None] > 2) & active[None, :]

    if low_error_mode:
        mC = jnp.zeros_like(eligible)
        mD = jnp.zeros_like(eligible)
        mA = jnp.zeros_like(eligible)
    else:
        num_flip = unsatisfied_counts_t(garr, synd_hat_t, synd_t, cn_t)
        mC = eligible & (hist_min >= C_thr) & c_allowed[None, :]
        mD = eligible & ~mC & (num_flip >= 3) & (hist_min >= D_thr)
        mA = (
            eligible
            & ~mC
            & ~mD
            & (hist_max <= A_row[None, :])
            & (hist_sum < A_sum_row[None, :])
        )
    agg = mC | mD | mA

    cand = eligible & ~agg
    big = jnp.float32(MAX_PM)
    key_any = jnp.where(cand, hist_sum, big)
    key_neg = jnp.where(cand & all_neg, hist_sum, big)
    has_neg = jnp.any(key_neg < big, axis=0)
    has_any = jnp.any(key_any < big, axis=0)
    # reliability-order tie-break (see the batch-major form)
    big_i = jnp.int32(1 << 30)
    kmin_neg = jnp.min(key_neg, axis=0, keepdims=True)
    kmin_any = jnp.min(key_any, axis=0, keepdims=True)
    vn_neg = jnp.argmin(
        jnp.where(key_neg <= kmin_neg, scan_rank_t, big_i), axis=0
    )
    vn_any = jnp.argmin(
        jnp.where(key_any <= kmin_any, scan_rank_t, big_i), axis=0
    )
    guess_vn = jnp.where(has_neg, vn_neg, vn_any).astype(jnp.int32)
    sum_any = jnp.min(key_any, axis=0)
    favor = jnp.where(has_neg, jnp.int8(1), (sum_any <= 0.0).astype(jnp.int8))

    vn_t, cn_t, deg_t, dead = vn_set_values_t(
        garr, vn_t, cn_t, deg_t, dead, agg, mA.astype(jnp.int8)
    )
    vn_t, cn_t, deg_t, dead = peel_t(garr, vn_t, cn_t, deg_t, dead)
    return vn_t, cn_t, deg_t, dead, guess_vn, favor, has_neg | has_any


def _hist_stats_bm(history):
    """(min, max, sum, all_neg) from batch-major history [B, n, 4].
    Stats are f32 regardless of the ring's storage dtype."""
    f32 = lambda x: x.astype(jnp.float32)
    return (
        f32(jnp.min(history, axis=-1)),
        f32(jnp.max(history, axis=-1)),
        jnp.sum(history, axis=-1, dtype=jnp.float32),
        jnp.all(history <= 0.0, axis=-1),
    )


def _hist_stats_sm(hist_t):
    """(min, max, sum, all_neg), each [n, B], from slot-major history
    [n, 4, B]. Stats are f32 regardless of the ring's storage dtype and
    stay batch-MINOR (the ensemble's select consumes them transposed)."""
    f32 = lambda x: x.astype(jnp.float32)
    return (
        f32(jnp.min(hist_t, axis=1)),
        f32(jnp.max(hist_t, axis=1)),
        jnp.sum(hist_t, axis=1, dtype=jnp.float32),
        jnp.all(hist_t <= 0.0, axis=1),
    )


def tile_branch_tables(tables, BK: int):
    """Per-ROW branch tables, depth-major: [D_max, BN] slices of the
    [NB, D_max] per-branch tables tiled over shots (row r is branch
    r %% NB, matching ``branch_of_row``), plus the [BN] budget.

    Rationale (tools/profile_gdg_w4_step.py, round 5): the step used to
    look these up as ``A_arr[branch_of_row, d]`` — XLA lowers that
    [NB, D_max]-source gather with per-row indices to a SCALAR-CORE loop
    with SMEM staging copies (~5.8 ms per lookup at BN=12032, 4 lookups
    per step — more than the whole BP burst). A depth-major tiled table
    turns each lookup into a [1, BN] dynamic row slice: pure vector
    copies, no gather anywhere."""
    tile_cols = lambda a: jnp.tile(jnp.asarray(a).T, (1, BK))  # [D_max, BN]
    return {
        "flipT": tile_cols(tables["flip_now"]),
        "reinitT": tile_cols(tables["reinit"]),
        "AT": tile_cols(tables["A"]),
        "AsumT": tile_cols(tables["A_sum"]),
        "budget_row": jnp.tile(jnp.asarray(tables["budget"]), BK),
    }


def _row_at(tT, d):
    """Row d of a depth-major [D_max, BN] table -> [BN] (static or traced d)."""
    return jax.lax.dynamic_index_in_dim(tT, d, axis=0, keepdims=False)


def _ensemble_init(garr, llr, syndrome, scan_rank, vn_state0, cn_state0,
                   cn_degree0, dead0, NB: int, msg_dtype: str = "float32",
                   hist_dtype: str = "float32"):
    """Tile per-shot state over the NB branch lanes (shot-major rows).

    The BP carry lives in the kernel-native layouts: messages slot-major
    [dc, m_pad, BN] in the message dtype (bfloat16 stays bfloat16 at
    rest), history [n, 4, BN] in ``hist_dtype`` — the history ring's
    per-iteration rewrite is the single largest HBM stream of the
    ensemble step (4n vs dc*m_pad slots), so a bfloat16 ring halves it —
    and the per-step bursts skip the entry/exit transposes
    (io_layout="slot_major")."""
    BK, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    m_pad = garr["cn_vn_sm"].shape[1]
    BN = BK * NB
    # transposed state: columns are shot-major (each shot's NB lanes are
    # consecutive), matching ``branch_of_row = arange(BN) % NB``
    tile_t = lambda x_t: jnp.repeat(x_t, NB, axis=-1)

    def pad_cn_t(x, fill):
        x_t = x.T
        return jnp.pad(
            x_t, ((0, m_pad - m), (0, 0)), constant_values=fill
        )

    synd = tile_t(pad_cn_t(syndrome.astype(jnp.int8), 0))  # [m_pad, BN]
    rank_b = tile_t(scan_rank.T)  # [n, BN]
    dead = jnp.repeat(dead0, NB, axis=0)
    branch_of_row = jnp.tile(jnp.arange(NB, dtype=jnp.int32), BK)
    mv_sm = bp_init_messages_sm(garr, llr, BN, msg_dtype)
    hist_t = jnp.zeros((n, 4, BN), jnp.dtype(hist_dtype))
    error = jnp.zeros((n, BN), jnp.int8)
    iters = jnp.zeros((BN,), jnp.int32)
    carry = (
        mv_sm, hist_t, error, tile_t(vn_state0.T),
        tile_t(pad_cn_t(cn_state0, -1)),
        tile_t(pad_cn_t(cn_degree0, 0)),
        dead, dead,  # halted starts as dead
        jnp.zeros((BN,), bool),
        jnp.full((BN,), MAX_PM, jnp.float32),
        jnp.zeros((n, BN), jnp.int8),
        iters,
    )
    return carry, synd, llr, branch_of_row, rank_b


@partial(
    jax.jit,
    static_argnames=("num_iter", "alpha", "clip", "low_error_mode",
                     "msg_dtype", "cn_engine"),
)
def _ensemble_step(
    garr,
    llr_b,
    synd,
    scan_rank,
    budget_row,
    flipT,
    reinitT,
    AT,
    AsumT,
    d,
    carry,
    start_row=None,
    *,
    num_iter: int,
    alpha: float,
    clip: float,
    low_error_mode: bool,
    msg_dtype: str,
    cn_engine: str = "xla",
):
    """One ensemble decimation step: masked BP burst, select_vn, decimate,
    peel, side-branch message reinit. Shared by the fused fori/while form
    (``gdg_ensemble``), the host-stepped form (``gdg_ensemble_hostloop``)
    and the spans form. ``start_row`` (spans form only) keeps dormant
    lanes — lanes that will copy another lane's snapshot at their
    activation depth — frozen before that depth."""
    (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, conv_pm, conv_error, iters) = carry
    n, BN = vn_state.shape
    active = ~halted & (d < budget_row)
    if start_row is not None:
        active = active & (d >= start_row)

    # --- masked BP (num_iter iterations, early per-row freeze); the
    # mv/history carry is slot-major and stays in the message dtype.
    # history_mode="tail": the ring only needs the burst's final 4
    # iterations — identical to "full" for every row that finishes the
    # burst (ring slot = iter % 4), and rows that converge mid-burst
    # halt, so their (stale) ring is never read by select_vn. Saves the
    # ring rewrite (the step's largest HBM stream) on the early
    # iterations of longer bursts. -------------------------------------
    mv, history, error, bp_done, iters, synd_hat = bp_run(
        garr, mv, llr_b, synd, vn_state, cn_state, history, error,
        ~active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
        msg_dtype=msg_dtype, return_synd=True, io_layout="slot_major",
        history_mode="tail", hist_update="slice", cn_engine=cn_engine,
        state_layout="transposed",
    )
    newly_conv = bp_done & active
    pm = jnp.sum(llr_b[:, None] * (error == 1), axis=0)
    conv_pm = jnp.where(newly_conv, pm, conv_pm)
    conv_error = jnp.where(newly_conv[None, :], error, conv_error)
    converged = converged | newly_conv
    halted = halted | newly_conv
    active = active & ~newly_conv

    # --- select_vn: aggressive decimation + guess choice ---------------
    (
        vn_state,
        cn_state,
        cn_degree,
        dead,
        guess_vn,
        favor,
        has_cand,
    ) = _select_and_decimate_t(
        garr,
        _hist_stats_sm(history),
        synd,
        vn_state,
        cn_state,
        cn_degree,
        dead,
        active,
        _row_at(AT, d),
        _row_at(AsumT, d),
        jnp.broadcast_to(d < 4, active.shape),
        low_error_mode=low_error_mode,
        vn_deg=garr["vn_degree"],
        synd_hat_t=synd_hat,
        scan_rank_t=scan_rank,
    )

    # no candidate -> branch ends (reference guess_vn == -1 break)
    halted = halted | (active & ~has_cand)

    # --- decision: favored, possibly flipped for this branch -----------
    flip = _row_at(flipT, d)
    value = (favor ^ flip.astype(jnp.int8)).astype(jnp.int8)
    do_set = active & ~halted & ~dead
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n, BN), 0) == guess_vn[None, :]
    ) & do_set[None, :]
    vn_state, cn_state, cn_degree, dead = vn_set_values_t(
        garr, vn_state, cn_state, cn_degree, dead,
        onehot, jnp.broadcast_to(value[None, :], (n, BN)),
    )
    vn_state, cn_state, cn_degree, dead = peel_t(
        garr, vn_state, cn_state, cn_degree, dead
    )
    halted = halted | dead

    # side branches restart BP messages from the priors at their flip
    re = _row_at(reinitT, d) & do_set
    mv = jnp.where(
        re[None, None, :],
        bp_init_messages_sm(garr, llr_b, BN, msg_dtype),
        mv,
    )

    # keep decided values reflected in the running error vector
    error = jnp.where(vn_state != -1, vn_state, error)
    return (mv, history, error, vn_state, cn_state, cn_degree, dead,
            halted, converged, conv_pm, conv_error, iters)


@partial(jax.jit, static_argnames=("BK", "NB"))
def _ensemble_reduce(carry, BK: int, NB: int):
    """Min-pm argmin over converged branches; main-lane error fallback.
    Consumes the transposed carry; returns batch-major outputs."""
    (_, _, error, _, _, _, _, _, converged, conv_pm, conv_error,
     iters) = carry
    n = error.shape[0]
    conv_pm_b = conv_pm.reshape(BK, NB)
    converged_b = converged.reshape(BK, NB)
    any_conv = jnp.any(converged_b, axis=1)
    best = jnp.argmin(jnp.where(converged_b, conv_pm_b, MAX_PM), axis=1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (BK, NB), 1) == best[:, None]
    ).astype(jnp.int8)
    conv_err_r = conv_error.reshape(n, BK, NB)
    best_err = jnp.sum(
        conv_err_r * onehot[None, :, :], axis=2, dtype=jnp.int32
    )  # [n, BK]
    main_err = error.reshape(n, BK, NB)[:, :, 0].astype(jnp.int32)
    final_err = jnp.where(any_conv[None, :], best_err, main_err)
    best_pm = jnp.min(jnp.where(converged_b, conv_pm_b, MAX_PM), axis=1)
    total_iters = jnp.sum(iters.reshape(BK, NB), axis=1)
    return {
        "error": final_err.T.astype(jnp.uint8),
        "converged": any_conv,
        "min_pm": best_pm,
        "iterations": total_iters,
    }


def gdg_ensemble_hostloop(
    garr,
    llr,
    syndrome,  # [BK, m]
    scan_rank,
    vn_state0,
    cn_state0,
    cn_degree0,
    dead0,
    flip_now,
    reinit,
    budget,
    A_arr,
    Asum_arr,
    *,
    num_iter: int,
    D_max: int,
    NB: int,
    alpha: float,
    clip: float,
    low_error_mode: bool,
    msg_dtype: str = "float32",
    hist_dtype: str = "float32",
    cn_engine: str = "xla",
):
    """Host-stepped branch ensemble: a Python loop over jitted
    ``_ensemble_step`` programs with an all-halted early exit per step.

    Semantically identical to ``gdg_ensemble`` (same step function, same
    reduce), but the compiled unit is ONE decimation step instead of the
    whole fori(D_max) nest — the program whose fused form crashes the TPU
    worker on large (W>=4) window graphs, and the early exit is free
    because the loop is already on the host."""
    BK, _ = syndrome.shape
    carry, synd, llr_b, branch_of_row, rank_b = _ensemble_init(
        garr, llr, syndrome, scan_rank, vn_state0, cn_state0, cn_degree0,
        dead0, NB, msg_dtype, hist_dtype
    )
    tt = tile_branch_tables(
        {"flip_now": flip_now, "reinit": reinit, "A": A_arr,
         "A_sum": Asum_arr, "budget": budget}, BK)
    budget_row = tt["budget_row"]
    for d in range(D_max):
        carry = _ensemble_step(
            garr, llr_b, synd, rank_b, budget_row, tt["flipT"],
            tt["reinitT"], tt["AT"], tt["AsumT"], jnp.int32(d), carry,
            num_iter=num_iter, alpha=alpha, clip=clip,
            low_error_mode=low_error_mode, msg_dtype=msg_dtype,
            cn_engine=cn_engine,
        )
        # a row is finished when halted (converged / dead / no candidate)
        # OR when its per-branch step budget is exhausted — budget-exhausted
        # rows never set halted, they just go inactive
        if bool(jnp.all(carry[7] | (d + 1 >= budget_row))):
            break
    return _ensemble_reduce(carry, BK, NB)


@partial(
    jax.jit,
    static_argnames=("num_iter", "D_max", "NB", "alpha", "clip", "low_error_mode",
                     "msg_dtype", "hist_dtype", "early_exit", "cn_engine"),
)
def gdg_ensemble(
    garr,
    llr,
    syndrome,  # [BK, m] (one row per shot; will be tiled over branches)
    scan_rank,  # [BK, n] reliability rank per VN (tie-break, pyx:357)
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
    hist_dtype: str = "float32",
    early_exit: bool = False,
    cn_engine: str = "xla",
):
    """Run the branch ensemble; returns per-shot best error / pm / converged."""
    BK, m = syndrome.shape
    carry, synd, llr_b, branch_of_row, rank_b = _ensemble_init(
        garr, llr, syndrome, scan_rank, vn_state0, cn_state0, cn_degree0,
        dead0, NB, msg_dtype, hist_dtype
    )
    tt = tile_branch_tables(
        {"flip_now": flip_now, "reinit": reinit, "A": A_arr,
         "A_sum": Asum_arr, "budget": budget}, BK)
    budget_row = tt["budget_row"]

    step = partial(
        _ensemble_step,
        garr, llr_b, synd, rank_b, budget_row, tt["flipT"],
        tt["reinitT"], tt["AT"], tt["AsumT"],
        num_iter=num_iter, alpha=alpha, clip=clip,
        low_error_mode=low_error_mode, msg_dtype=msg_dtype,
        cn_engine=cn_engine,
    )

    if early_exit:
        # while-form of fori(0, D_max): exits as soon as every branch row
        # has finished (halted, or its step budget is exhausted) — with
        # difficulty-sorted buckets most buckets stop well short of the
        # full step budget. NOTE on large windows: the fused program (in
        # BOTH loop forms, any ensemble_bucket) crashes the TPU worker on
        # the [[288]] W=4 and [[144]] (5,2) sliding-window graphs
        # (UNAVAILABLE restart); use ensemble_mode="host_loop" there
        # (``gdg_ensemble_hostloop``), which runs this exact step function
        # one compiled step at a time.
        # the any-active reduce lives in the body (vector core); the cond
        # reads only carried scalars (a vector reduce in the cond forces
        # a scalar-core SMEM DMA per step, tools/profile_gdg_w4_step.py)
        def _ee_body(s):
            d, c, _ = s
            c = step(d, c)
            return (d + 1, c, jnp.any(~c[7] & (d + 1 < budget_row)))

        _, carry, _ = jax.lax.while_loop(
            lambda s: (s[0] < D_max) & s[2],
            _ee_body,
            (jnp.int32(0), carry, jnp.any(~carry[7] & (0 < budget_row))),
        )
    else:
        carry = jax.lax.fori_loop(0, D_max, step, carry)
    return _ensemble_reduce(carry, BK, NB)


@partial(
    jax.jit,
    static_argnames=("num_iter", "NB", "alpha", "clip", "low_error_mode",
                     "msg_dtype", "hist_dtype", "spans", "row_bucket",
                     "copy_plan", "cn_engine"),
)
def gdg_ensemble_spans(
    garr,
    llr,
    syndrome,  # [BK, m]
    scan_rank,
    vn_state0,
    cn_state0,
    cn_degree0,
    dead0,
    flip_now,
    reinit,
    budget,
    A_arr,
    Asum_arr,
    *,
    num_iter: int,
    NB: int,
    alpha: float,
    clip: float,
    low_error_mode: bool,
    msg_dtype: str = "float32",
    hist_dtype: str = "float32",
    spans: tuple = (),
    row_bucket: int = 2048,
    copy_plan: tuple | None = None,
    cn_engine: str = "xla",
):
    """Span-compacted ensemble: the same ``_ensemble_step`` as the fused
    form, but the depth loop is cut into static ``spans`` with a ROW-level
    re-compaction between spans — rows (shot × branch lanes) are sorted
    unfinished-first and only the buckets covering unfinished rows are
    stepped, so halted / budget-exhausted lanes stop consuming BP
    bandwidth. On the [[144]] W=3 window graphs only ~45% of row-steps are
    active under the fused fori(D_max) loop (tools/probe_gdg_steps.py), so
    compaction roughly halves the ensemble's HBM traffic at a ~6%
    gather/scatter cost per span.

    Results are identical to ``gdg_ensemble``: boundary buckets may
    straddle finished rows, whose state the step function freezes
    (``active = ~halted & (d < budget_row)``)."""
    BK, m = syndrome.shape
    carry, synd, llr_b, branch_of_row, rank_b = _ensemble_init(
        garr, llr, syndrome, scan_rank, vn_state0, cn_state0, cn_degree0,
        dead0, NB, msg_dtype, hist_dtype
    )
    tt = tile_branch_tables(
        {"flip_now": flip_now, "reinit": reinit, "A": A_arr,
         "A_sum": Asum_arr, "budget": budget}, BK)
    budget_row = tt["budget_row"]
    BN = BK * NB

    # --- lane dormancy (copy_plan = (copy_at, copy_from) per lane): a
    # side/tree-side lane shares another lane's decision prefix until its
    # activation depth, so instead of recomputing that prefix it stays
    # frozen and COPIES its source lane's state at the span boundary of
    # its activation depth (the reference's snapshot handoff,
    # bpgd.cpp:651-664). Trajectories from activation onward are
    # bit-identical to the recompute forms. All masks/permutations are
    # trace-time constants.
    start_row = None
    start_np = None
    if copy_plan is not None:
        copy_at_np = np.asarray(copy_plan[0], np.int32)
        copy_from_np = np.asarray(copy_plan[1], np.int32)
        lanes_np = np.arange(BN) % NB
        start_np = np.maximum(copy_at_np[lanes_np], 0)
        start_row = jnp.asarray(start_np)
        bounds = set(np.cumsum((0,) + spans).tolist())
        acts = set(int(a) for a in copy_at_np if a >= 0)
        if not acts <= bounds:
            raise ValueError(
                f"spans {spans} missing boundaries at activation depths "
                f"{sorted(acts - bounds)} (default_spans adds them)"
            )

    def _apply_activations(carry, d0):
        if copy_plan is None:
            return carry
        mask_np = copy_at_np[lanes_np] == d0
        if not mask_np.any():
            return carry
        perm_np = np.where(
            mask_np,
            (np.arange(BN) // NB) * NB + copy_from_np[lanes_np],
            np.arange(BN),
        ).astype(np.int32)
        perm = jnp.asarray(perm_np)
        # every multi-dim carry element is batch-MINOR (rows on the lane
        # axis): permute the trailing axis; [BN] vectors permute directly
        return tuple(
            a[..., perm] if a.ndim > 1 else a[perm] for a in carry
        )
    # largest divisor of BN <= row_bucket (gcd under-shoots badly: e.g.
    # gcd(5632, 2048) = 512 where 1408 divides 5632 — 3x the bucket-walk
    # iterations, each paying a full gather/scatter of the row state)
    bucket = next(d for d in range(min(row_bucket, BN), 0, -1) if BN % d == 0)
    n = garr["vn_valid"].shape[0]

    d0 = 0
    for sp in spans:
        carry = _apply_activations(carry, d0)
        if bucket == BN:
            # one bucket covers the whole pool: compaction can't drop any
            # work — run the steps directly, no sort / gather / scatter
            for dd in range(sp):
                carry = _ensemble_step(
                    garr, llr_b, synd, rank_b, budget_row, tt["flipT"],
                    tt["reinitT"], tt["AT"], tt["AsumT"],
                    jnp.int32(d0 + dd), carry, start_row,
                    num_iter=num_iter, alpha=alpha, clip=clip,
                    low_error_mode=low_error_mode, msg_dtype=msg_dtype,
                    cn_engine=cn_engine,
                )
            d0 += sp
            continue
        finished = carry[7] | (d0 >= budget_row)
        if start_np is not None:
            # dormant through this whole span == finished for the walk
            finished = finished | jnp.asarray(start_np >= d0 + sp)
        order = jnp.argsort(finished, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~finished).astype(jnp.int32))

        def body(state, d0=d0, sp=sp, order=order):
            b, carry = state
            idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
            take = lambda a: jnp.take(a, idx, axis=0)
            # mv/history (carry[0:2]) are slot-major with the row axis
            # LAST (the TPU lane axis). A dynamic gather along the lane
            # axis executes pathologically on this backend (~30x the
            # in-situ last-window time, tools/probe_gdg_insitu.py), so
            # route it through explicit transposes: move rows to the
            # major axis, gather there, move back — full-bandwidth
            # copies instead of a lane-axis relayout.
            def take_sm(a):
                t = jnp.moveaxis(a, -1, 0)
                return jnp.moveaxis(jnp.take(t, idx, axis=0), 0, -1)

            # batch-minor carry: rows live on the trailing (lane) axis of
            # every multi-dim element; [BN] vectors gather directly
            sub = tuple(
                take_sm(a) if a.ndim > 1 else take(a) for a in carry
            )
            synd_c = take_sm(synd)
            rank_c = take_sm(rank_b)
            bud_c = take(budget_row)
            # bucket slices of the depth-major tables, routed through
            # transposes (lane-axis dynamic gathers are pathological on
            # this backend; the arrays are small so the copies are cheap)
            takeT = lambda t: jnp.take(t.T, idx, axis=0).T
            flipT_c, reinitT_c = takeT(tt["flipT"]), takeT(tt["reinitT"])
            AT_c, AsumT_c = takeT(tt["AT"]), takeT(tt["AsumT"])
            start_c = take(start_row) if start_row is not None else None
            for dd in range(sp):
                sub = _ensemble_step(
                    garr, llr_b, synd_c, rank_c, bud_c, flipT_c,
                    reinitT_c, AT_c, AsumT_c, jnp.int32(d0 + dd), sub,
                    start_c, num_iter=num_iter, alpha=alpha, clip=clip,
                    low_error_mode=low_error_mode, msg_dtype=msg_dtype,
                    cn_engine=cn_engine,
                )
            def scatter_sm(a, s):
                at = jnp.moveaxis(a, -1, 0)
                st = jnp.moveaxis(s, -1, 0)
                return jnp.moveaxis(at.at[idx].set(st), 0, -1)

            carry = tuple(
                scatter_sm(a, s) if a.ndim > 1 else a.at[idx].set(s)
                for a, s in zip(carry, sub)
            )
            return (b + 1, carry)

        _, carry = jax.lax.while_loop(
            lambda s: s[0] * bucket < n_todo, body, (jnp.int32(0), carry)
        )
        d0 += sp
    return _ensemble_reduce(carry, BK, NB)


def default_spans(D_max: int, budgets, span: int = 4,
                  activations=()) -> tuple:
    """Static span schedule: compaction every ``span`` steps, plus an extra
    boundary at each branch-budget cliff where a significant lane fraction
    (>= 1/8 of the ensemble) goes inactive at once (tiny cliffs — single
    side lanes — are not worth a compaction pass), plus a boundary at
    every lane ACTIVATION depth (lane-dormancy snapshot copies happen at
    span starts, so each distinct ``copy_at`` needs a boundary)."""
    budgets = [int(b) for b in budgets]
    nb = max(len(budgets), 1)
    counts = {}
    for b in budgets:
        counts[b] = counts.get(b, 0) + 1
    cliffs = {b for b, c in counts.items() if 0 < b < D_max and c * 8 >= nb}
    acts = {int(a) for a in activations if 0 < a < D_max}
    bounds = sorted(set(range(span, D_max, span)) | cliffs | acts | {D_max})
    spans, prev = [], 0
    for b in bounds:
        if b > prev:
            spans.append(b - prev)
            prev = b
    return tuple(spans)


@partial(
    jax.jit,
    static_argnames=(
        "num_iter",
        "max_step",
        "max_tree_depth",
        "max_side_depth",
        "max_side_branch_step",
        "max_guess",
        "alpha",
        "clip",
        "low_error_mode",
        "msg_dtype",
    ),
)
def gdg_serial(
    garr,
    llr,
    syndrome,  # [B, m]
    scan_rank,  # [B, n]
    vn_state0,
    cn_state0,
    cn_degree0,
    dead0,
    *,
    num_iter: int,
    max_step: int,
    max_tree_depth: int,
    max_side_depth: int,
    max_side_branch_step: int,
    max_guess: int,
    alpha: float,
    clip: float,
    low_error_mode: bool,
    msg_dtype: str = "float32",
):
    """Single-thread GDG semantics (``bpgdg_decoder.gdg``,
    bp_guessing_decoder.pyx:254-338) as a batched lockstep work-queue.

    Phase 1 grows the main (all-favored) branch, pushing one anti-decision
    snapshot per depth (< max_side_depth) onto a per-shot queue. Phase 2
    walks the queue in push order: a snapshot whose depth exceeds the
    shot's ``min_converge_depth`` is pruned (the reference's pm-based
    side-branch pruning), otherwise its masks are restored, messages
    reinitialize to the priors (set_masks → init), the anti-decision is
    applied, and the branch runs up to ``max_side_branch_step`` steps —
    converging branches with smaller path metric take over (best error,
    min_pm, and min_converge_depth), a branch whose depth passes
    ``min_converge_depth + 2`` stops early, and shallow side branches
    (depth <= max_tree_depth) may push further snapshots, exactly like the
    reference's growing ``used_guess`` stack (bounded by ``max_guess``).

    The queue walk is sequential per shot — that is the semantics being
    reproduced — but all shots advance in lockstep, so each queue slot is
    one batched masked-BP + decimation program.
    """
    B, m = syndrome.shape
    n = garr["vn_valid"].shape[0]
    G = max_guess
    llr_b = jnp.broadcast_to(llr, (B, n))
    vn_deg = garr["vn_degree"]
    bidx = jnp.arange(B)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)

    q_vn = jnp.zeros((B, G, n), jnp.int8)
    q_cn = jnp.zeros((B, G, m), jnp.int8)
    q_deg = jnp.zeros((B, G, m), jnp.int32)
    q_guess = jnp.zeros((B, G), jnp.int32)
    q_val = jnp.zeros((B, G), jnp.int8)
    q_depth = jnp.full((B, G), jnp.int32(1 << 30))
    used = jnp.zeros((B,), jnp.int32)

    mv = bp_init_messages(garr, llr_b, B)
    history, error, _, iters = fresh_bp_state(garr, B)
    vn_state, cn_state, cn_degree, dead = vn_state0, cn_state0, cn_degree0, dead0
    halted = dead0
    converged = jnp.zeros((B,), bool)
    min_pm = jnp.full((B,), MAX_PM, jnp.float32)
    best_err = jnp.zeros((B, n), jnp.int8)
    min_conv_depth = jnp.full((B,), max_step, jnp.int32)

    def push_snapshot(queues, push, vn_state, cn_state, cn_degree, guess_vn,
                      favor, depth):
        q_vn, q_cn, q_deg, q_guess, q_val, q_depth, used = queues
        slot = jnp.where(push, used, G)  # out-of-range slot G == dropped
        q_vn = q_vn.at[bidx, slot].set(vn_state, mode="drop")
        q_cn = q_cn.at[bidx, slot].set(cn_state, mode="drop")
        q_deg = q_deg.at[bidx, slot].set(cn_degree, mode="drop")
        q_guess = q_guess.at[bidx, slot].set(guess_vn, mode="drop")
        q_val = q_val.at[bidx, slot].set(
            (1 - favor).astype(jnp.int8), mode="drop"
        )
        q_depth = q_depth.at[bidx, slot].set(depth, mode="drop")
        used = used + push.astype(jnp.int32)
        return q_vn, q_cn, q_deg, q_guess, q_val, q_depth, used

    def decide_and_peel(vn_state, cn_state, cn_degree, dead, do_set, guess_vn,
                        value):
        onehot = (iota_n == guess_vn[:, None]) & do_set[:, None]
        vn_state, cn_state, cn_degree, dead = vn_set_values(
            garr, vn_state, cn_state, cn_degree, dead,
            onehot, jnp.broadcast_to(value[:, None], (B, n)),
        )
        return peel(garr, vn_state, cn_state, cn_degree, dead)

    # ---- phase 1: main branch -------------------------------------------
    def p1_body(d, carry):
        (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
         converged, min_pm, best_err, min_conv_depth, queues, iters) = carry
        active = ~halted
        mv, history, error, bp_done, iters = bp_run(
            garr, mv, llr_b, syndrome, vn_state, cn_state, history, error,
            ~active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
            msg_dtype=msg_dtype,
        )
        newly = bp_done & active
        pm = jnp.sum(llr_b * (error == 1), axis=-1)
        min_pm = jnp.where(newly, pm, min_pm)
        best_err = jnp.where(newly[:, None], error, best_err)
        min_conv_depth = jnp.where(newly, d, min_conv_depth)
        converged = converged | newly
        halted = halted | newly
        active = active & ~newly

        A_col = jnp.full((B, 1), -3.0, jnp.float32)
        A_sum = jnp.full(
            (B,), 1.0, jnp.float32
        ) * jnp.where(d == 0, jnp.float32(-16.0), jnp.float32(-12.0))
        (vn_state, cn_state, cn_degree, dead, guess_vn, favor, has_cand) = (
            _select_and_decimate(
                garr, _hist_stats_bm(history), error, syndrome, vn_state,
                cn_state, cn_degree,
                dead, active, A_col, A_sum,
                jnp.broadcast_to(d < 4, (B,)),
                low_error_mode=low_error_mode, vn_deg=vn_deg,
                scan_rank=scan_rank,
            )
        )

        push = (
            active & ~dead & has_cand & (d < max_side_depth) & (used_of(queues) < G)
        )
        queues = push_snapshot(
            queues, push, vn_state, cn_state, cn_degree, guess_vn, favor, d + 1
        )

        do_set = active & ~dead & has_cand
        vn_state, cn_state, cn_degree, dead = decide_and_peel(
            vn_state, cn_state, cn_degree, dead, do_set, guess_vn,
            favor.astype(jnp.int8),
        )
        halted = halted | dead | (active & ~has_cand)
        error = jnp.where(vn_state != -1, vn_state, error)
        return (mv, history, error, vn_state, cn_state, cn_degree, dead,
                halted, converged, min_pm, best_err, min_conv_depth, queues,
                iters)

    def used_of(queues):
        return queues[-1]

    queues = (q_vn, q_cn, q_deg, q_guess, q_val, q_depth, used)
    carry = (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
             converged, min_pm, best_err, min_conv_depth, queues, iters)
    carry = jax.lax.fori_loop(0, max_step, p1_body, carry)
    (mv, history, error, vn_state, cn_state, cn_degree, dead, halted,
     converged, min_pm, best_err, min_conv_depth, queues, iters) = carry

    # unconverged shots still carry the main branch decision (pyx:293-296)
    best_err = jnp.where(converged[:, None], best_err, error)

    # ---- phase 2: side branches with pm/depth pruning --------------------
    def p2_cond(carry):
        # cond reads only carried scalars (the max-used reduce lives in
        # the body; a vector reduce here would run on the scalar core
        # with an SMEM DMA per trip, tools/profile_gdg_w4_step.py)
        i = carry[0]
        return (i < G) & (i < carry[10])

    def p2_body(carry):
        (i, history, error, converged, min_pm, best_err, queues,
         min_conv_depth, iters, explored, _mu) = carry
        (q_vn, q_cn, q_deg, q_guess, q_val, q_depth, used) = queues
        alt_depth = q_depth[:, i]
        valid = (i < used) & (alt_depth <= min_conv_depth)
        explored = explored.at[:, i].set(valid)
        vn_state = q_vn[:, i]
        cn_state = q_cn[:, i]
        cn_degree = q_deg[:, i]
        dead = ~valid
        vn_state, cn_state, cn_degree, dead = decide_and_peel(
            vn_state, cn_state, cn_degree, dead, valid, q_guess[:, i],
            q_val[:, i],
        )
        b_active = valid & ~dead
        mv = bp_init_messages(garr, llr_b, B)  # set_masks -> init()

        def inner_cond(ic):
            return (ic[0] < max_side_branch_step) & ic[15]

        def inner_body(ic):
            (j, mv, history, error, b_active, vn_state, cn_state, cn_degree,
             dead, converged, min_pm, best_err, min_conv_depth, queues,
             iters, _any) = ic
            cur_depth = alt_depth + j
            mv, history, error, bp_done, iters = bp_run(
                garr, mv, llr_b, syndrome, vn_state, cn_state, history, error,
                ~b_active, iters, num_iter=num_iter, alpha=alpha, clip=clip,
                msg_dtype=msg_dtype,
            )
            newly = bp_done & b_active
            pm = jnp.sum(llr_b * (error == 1), axis=-1)
            better = newly & (pm < min_pm)
            min_pm = jnp.where(better, pm, min_pm)
            best_err = jnp.where(better[:, None], error, best_err)
            min_conv_depth = jnp.where(
                better & (cur_depth < min_conv_depth), cur_depth, min_conv_depth
            )
            converged = converged | newly
            b_active = b_active & ~newly
            # heuristic early stop (pyx:325-326)
            b_active = b_active & ~(cur_depth > min_conv_depth + 2)

            A_col = jnp.zeros((B, 1), jnp.float32)
            A_sum = jnp.full((B,), -10.0, jnp.float32)
            (vn_state, cn_state, cn_degree, dead, guess_vn, favor, has_cand) = (
                _select_and_decimate(
                    garr, _hist_stats_bm(history), error, syndrome, vn_state,
                    cn_state,
                    cn_degree, dead, b_active, A_col, A_sum, cur_depth < 4,
                    low_error_mode=low_error_mode, vn_deg=vn_deg,
                    scan_rank=scan_rank,
                )
            )
            push = (
                b_active & ~dead & has_cand
                & (cur_depth <= max_tree_depth)
                & (cur_depth <= min_conv_depth)
                & (used_of(queues) < G)
            )
            queues = push_snapshot(
                queues, push, vn_state, cn_state, cn_degree, guess_vn, favor,
                cur_depth + 1,
            )
            do_set = b_active & ~dead & has_cand
            vn_state, cn_state, cn_degree, dead = decide_and_peel(
                vn_state, cn_state, cn_degree, dead, do_set, guess_vn,
                favor.astype(jnp.int8),
            )
            b_active = b_active & ~dead & has_cand
            error = jnp.where(vn_state != -1, vn_state, error)
            return (j + 1, mv, history, error, b_active, vn_state, cn_state,
                    cn_degree, dead, converged, min_pm, best_err,
                    min_conv_depth, queues, iters, jnp.any(b_active))

        ic = (jnp.int32(0), mv, history, error, b_active, vn_state, cn_state,
              cn_degree, dead, converged, min_pm, best_err, min_conv_depth,
              queues, iters, jnp.any(b_active))
        ic = jax.lax.while_loop(inner_cond, inner_body, ic)
        (_, mv, history, error, b_active, vn_state, cn_state, cn_degree,
         dead, converged, min_pm, best_err, min_conv_depth, queues, iters,
         _any) = ic
        return (i + 1, history, error, converged, min_pm, best_err, queues,
                min_conv_depth, iters, explored,
                jnp.max(used_of(queues)))

    explored = jnp.zeros((B, G), bool) if G > 0 else jnp.zeros((B, 0), bool)
    if G > 0:  # static: G == 0 means side branches disabled entirely
        carry2 = (jnp.int32(0), history, error, converged, min_pm, best_err,
                  queues, min_conv_depth, iters, explored,
                  jnp.max(used_of(queues)))
        carry2 = jax.lax.while_loop(p2_cond, p2_body, carry2)
        (_, history, error, converged, min_pm, best_err, queues,
         min_conv_depth, iters, explored, _mu) = carry2

    (q_vn, q_cn, q_deg, q_guess, q_val, q_depth, used) = queues
    return {
        "error": best_err.astype(jnp.uint8),
        "converged": converged,
        "min_pm": min_pm,
        "iterations": iters,
        # decision/queue trace (small arrays; consumed by the order-exact
        # oracle test vs the literal pyx:254-338 port, tests/gdg_oracle.py)
        "q_guess": q_guess,
        "q_val": q_val,
        "q_depth": q_depth,
        "q_used": used,
        "explored": explored,
        "min_conv_depth": min_conv_depth,
    }


class GDG:
    """Batched GDG decoder mirroring ``bpgdg_decoder``
    (bp_guessing_decoder.pyx:160-338).

    ``multi_thread=True`` (default here; the flagship throughput path) runs
    the reference's parallel ensemble as vmapped branch lanes;
    ``multi_thread=False`` runs the reference's *default* serialized
    work-queue with pm/depth side-branch pruning (``gdg_serial``) — fewer
    total BP steps per shot, sequential queue walk.

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
        hist_dtype: str = "float32",
        multi_thread: bool = True,
        ensemble_early_exit: bool = False,
        ensemble_mode: str = "fused",
        ensemble_spans=None,
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
        self.gdg_factor = float(gdg_factor)
        self.clip = float(clip)
        self.num_iter_per_step = int(max_iter_per_step)
        self.low_error_mode = bool(low_error_mode)
        self.msg_dtype = str(msg_dtype)
        self.hist_dtype = str(hist_dtype)
        self.new_n = min(self.n, 2 * self.m) if new_n is None else min(new_n, self.n)
        self.ensemble_bucket = int(ensemble_bucket)
        self.multi_thread = bool(multi_thread)
        self.ensemble_early_exit = bool(ensemble_early_exit)
        if ensemble_mode not in ("fused", "host_loop", "spans"):
            raise ValueError(
                "ensemble_mode must be 'fused', 'host_loop' or 'spans'"
            )
        self.ensemble_mode = ensemble_mode
        self.row_bucket = int(row_bucket)
        self.cn_engine = str(cn_engine)
        self._ensemble_spans = ensemble_spans
        self.max_step = int(max_step)
        self.max_tree_depth = int(max_tree_depth)
        self.max_side_depth = int(max_side_depth)
        self.max_side_branch_step = int(max_side_branch_step)
        # reference max_guess (bp_guessing_decoder.pyx:181)
        self.max_guess = (
            2 * (2**self.max_tree_depth - 1)
            + self.max_side_depth
            - self.max_tree_depth
        )

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
        self._core_jit = None
        self._pre_jit = None
        # lane-dormancy snapshot plan (spans form): hashable for jit
        self._copy_plan = (
            tuple(int(a) for a in tables["copy_at"]),
            tuple(int(f) for f in tables["copy_from"]),
        )
        if self._ensemble_spans is None:
            self.ensemble_spans = default_spans(
                self.D_max, tables["budget"].tolist(),
                activations=self._copy_plan[0],
            )
        else:
            self.ensemble_spans = tuple(int(s) for s in self._ensemble_spans)
            if sum(self.ensemble_spans) != self.D_max:
                raise ValueError(
                    f"ensemble_spans must sum to D_max={self.D_max}"
                )
            bounds = {0}
            acc = 0
            for s in self.ensemble_spans:
                acc += s
                bounds.add(acc)
            if not {a for a in self._copy_plan[0] if a >= 0} <= bounds:
                # user schedule misses activation boundaries: fall back to
                # prefix recompute (no dormancy) rather than erroring
                self._copy_plan = None

    def _shorten_state(self, synds, llr_sum):
        """Decide the most-reliable n - new_n columns to 0, then peel.

        Also returns the reliability ``rank_pos`` (each VN's position in
        the stable ascending argsort of the pre-BP posterior sums == the
        reference's column permutation, pyx:263) — the select_vn scan
        order used to break exact history-sum ties."""
        B = synds.shape[0]
        vn_state, cn_state, cn_degree, dead = init_decimation_state(
            self.garr, jnp.asarray(synds)
        )
        order = jnp.argsort(jnp.asarray(llr_sum), axis=1, stable=True).astype(
            jnp.int32
        )
        rank_pos = (
            jnp.zeros((B, self.n), jnp.int32)
            .at[jnp.arange(B)[:, None], order]
            .set(jnp.broadcast_to(jnp.arange(self.n, dtype=jnp.int32), (B, self.n)))
        )
        if self.new_n < self.n:
            drop = rank_pos >= self.new_n
            vn_state, cn_state, cn_degree, dead = vn_set_values(
                self.garr, vn_state, cn_state, cn_degree, dead,
                drop, jnp.zeros((B, self.n), jnp.int8),
            )
            vn_state, cn_state, cn_degree, dead = peel(
                self.garr, vn_state, cn_state, cn_degree, dead
            )
        return vn_state, cn_state, cn_degree, dead, rank_pos

    def _run_ensemble(self, s, order, vn0, cn0, cd0, dead0):
        if self.multi_thread and self.ensemble_mode == "spans":
            return gdg_ensemble_spans(
                self.garr,
                self._llr_dev,
                s,
                order,
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
                NB=self.NB,
                alpha=self.gdg_factor,
                clip=self.clip,
                low_error_mode=self.low_error_mode,
                msg_dtype=self.msg_dtype,
                hist_dtype=self.hist_dtype,
                spans=self.ensemble_spans,
                row_bucket=self.row_bucket,
                copy_plan=self._copy_plan,
                cn_engine=self.cn_engine,
            )
        if self.multi_thread and self.ensemble_mode == "host_loop":
            return gdg_ensemble_hostloop(
                self.garr,
                self._llr_dev,
                s,
                order,
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
                hist_dtype=self.hist_dtype,
                cn_engine=self.cn_engine,
            )
        if self.multi_thread:
            return gdg_ensemble(
                self.garr,
                self._llr_dev,
                s,
                order,
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
                hist_dtype=self.hist_dtype,
                early_exit=self.ensemble_early_exit,
                cn_engine=self.cn_engine,
            )
        return gdg_serial(
            self.garr,
            self._llr_dev,
            s,
            order,
            vn0,
            cn0,
            cd0,
            dead0,
            num_iter=self.num_iter_per_step,
            max_step=self.max_step,
            max_tree_depth=self.max_tree_depth,
            max_side_depth=self.max_side_depth,
            max_side_branch_step=self.max_side_branch_step,
            max_guess=self.max_guess,
            alpha=self.gdg_factor,
            clip=self.clip,
            low_error_mode=self.low_error_mode,
            msg_dtype=self.msg_dtype,
        )

    def core(self, synds):
        """Pure device-side decode (jit/shard_map traceable, no host syncs):
        pre-BP on the full batch, then a sorted bucket walk running the
        branch ensemble only over the non-converged shots (same device
        compaction scheme as BPOSD.core)."""
        import jax

        from .bposd import _divisor_bucket

        B = synds.shape[0]
        synds = synds.astype(jnp.uint8)
        pre = decode_bp(
            self.garr,
            self._llr_dev,
            synds,
            num_iter=self.max_iter,
            alpha=self.alpha,
            clip=self.clip,
            msg_dtype=self.msg_dtype,
            cn_engine=self.cn_engine,
        )
        converged = pre["converged"]
        error = pre["error"].astype(jnp.uint8)
        iters = pre["iterations"]
        llr_sum = pre["llr_sum"]
        min_pm = jnp.sum(
            jnp.where(error == 1, self._llr_dev[None, :], 0.0), axis=-1
        )

        bucket = _divisor_bucket(B, self.ensemble_bucket)
        # survivors first, light-syndrome (easy) shots bucketed together so
        # the ensemble's all-halted early exit fires bucket-wide
        synd_weight = jnp.sum(synds, axis=1, dtype=jnp.int32)
        key = converged.astype(jnp.int32) * jnp.int32(self.m + 2) + synd_weight
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~converged).astype(jnp.int32))

        def body(carry):
            b, error, converged, min_pm, iters = carry
            idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
            take = lambda a: jnp.take(a, idx, axis=0)
            s = take(synds)
            done_c = take(converged)
            vn0, cn0, cd0, dead0, scan_ord = self._shorten_state(
                s, take(llr_sum)
            )
            out = self._run_ensemble(s, scan_ord, vn0, cn0, cd0, dead0)
            # boundary buckets may straddle converged shots: keep theirs
            err_new = jnp.where(
                done_c[:, None], take(error), out["error"].astype(jnp.uint8)
            )
            conv_new = done_c | out["converged"]
            pm_new = jnp.where(done_c, take(min_pm), out["min_pm"])
            it_new = take(iters) + jnp.where(done_c, 0, out["iterations"])
            return (
                b + 1,
                error.at[idx].set(err_new),
                converged.at[idx].set(conv_new),
                min_pm.at[idx].set(pm_new),
                iters.at[idx].set(it_new),
            )

        _, error, converged, min_pm, iters = jax.lax.while_loop(
            lambda c: c[0] * bucket < n_todo,
            body,
            (jnp.int32(0), error, converged, min_pm, iters),
        )
        return {
            "error": error,
            "converged": converged,
            "iterations": iters,
            "min_pm": min_pm,
        }

    def _pre_order(self, synds):
        """Pre-BP + the difficulty-sorted survivor order (host-core half)."""
        synds = synds.astype(jnp.uint8)
        pre = decode_bp(
            self.garr,
            self._llr_dev,
            synds,
            num_iter=self.max_iter,
            alpha=self.alpha,
            clip=self.clip,
            msg_dtype=self.msg_dtype,
            cn_engine=self.cn_engine,
        )
        converged = pre["converged"]
        error = pre["error"].astype(jnp.uint8)
        min_pm = jnp.sum(
            jnp.where(error == 1, self._llr_dev[None, :], 0.0), axis=-1
        )
        synd_weight = jnp.sum(synds, axis=1, dtype=jnp.int32)
        key = converged.astype(jnp.int32) * jnp.int32(self.m + 2) + synd_weight
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        n_todo = jnp.sum((~converged).astype(jnp.int32))
        return (error, converged, min_pm, pre["iterations"], pre["llr_sum"],
                order, n_todo)

    def _core_host(self, synds):
        """Host-driven bucket walk (``ensemble_mode='host_loop'``): same
        result as ``core`` but each ensemble step is its own compiled
        program, sidestepping the fused-loop worker crash on large window
        graphs and getting bucket early exit for free."""
        import jax

        from .bposd import _divisor_bucket

        B = synds.shape[0]
        if self._pre_jit is None:
            self._pre_jit = jax.jit(self._pre_order)
        (error, converged, min_pm, iters, llr_sum, order, n_todo) = (
            self._pre_jit(synds)
        )
        synds = jnp.asarray(synds).astype(jnp.uint8)
        n_todo = int(n_todo)
        bucket = _divisor_bucket(B, self.ensemble_bucket)
        b = 0
        while b * bucket < n_todo:
            idx = order[b * bucket : (b + 1) * bucket]
            take = lambda a: jnp.take(a, idx, axis=0)
            s = take(synds)
            done_c = take(converged)
            vn0, cn0, cd0, dead0, scan_ord = self._shorten_state(
                s, take(llr_sum)
            )
            out = self._run_ensemble(s, scan_ord, vn0, cn0, cd0, dead0)
            err_new = jnp.where(
                done_c[:, None], take(error), out["error"].astype(jnp.uint8)
            )
            conv_new = done_c | out["converged"]
            pm_new = jnp.where(done_c, take(min_pm), out["min_pm"])
            it_new = take(iters) + jnp.where(done_c, 0, out["iterations"])
            error = error.at[idx].set(err_new)
            converged = converged.at[idx].set(conv_new)
            min_pm = min_pm.at[idx].set(pm_new)
            iters = iters.at[idx].set(it_new)
            b += 1
        return {
            "error": error,
            "converged": converged,
            "iterations": iters,
            "min_pm": min_pm,
        }

    def decode_batch_device(self, synds):
        """Jitted ``core`` (fused mode) / host bucket walk (host_loop)."""
        if self.multi_thread and self.ensemble_mode == "host_loop":
            return self._core_host(jnp.asarray(synds))
        if self._core_jit is None:
            import jax

            self._core_jit = jax.jit(self.core)
        return self._core_jit(synds)

    def decode_batch(self, syndromes) -> DecodeResult:
        syndromes, _ = as_batch(syndromes, self.m)
        B = syndromes.shape[0]
        Bp = pad_pow2(B)
        synds = np.zeros((Bp, self.m), dtype=np.uint8)
        synds[:B] = syndromes
        out = self.decode_batch_device(jnp.asarray(synds))
        return DecodeResult(
            error=np.asarray(out["error"])[:B],
            converged=np.asarray(out["converged"])[:B],
            iterations=np.asarray(out["iterations"])[:B],
            min_pm=np.asarray(out["min_pm"])[:B],
        )

    def decode(self, syndrome) -> np.ndarray:
        return self.decode_batch(np.asarray(syndrome)[None, :]).error[0]
