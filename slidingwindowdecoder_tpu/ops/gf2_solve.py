"""Batched GF(2) elimination and ordered-statistics decoding.

TPU-native replacement for the reference's sparse LU machinery
(``mod2sparse_decomp_osd`` mod2sparse_extra.cpp:113-376,
``LU_forward_backward_solve`` :78-106, ``mod2sparse_rank`` :32-76): a
bit-packed, batched Gauss-Jordan over uint32 lanes.

Key insight vs. the reference's sequential sparse LU: the PCM is shared by
every shot — only the *reliability order* of columns differs per shot. So
the kernel keeps the reduced matrix row-packed ([B, m, W] uint32 words over
the column axis, syndrome appended as an extra word), and at each of the
``rank`` pivot steps selects "the live column with the smallest per-shot
reliability rank" — exactly the greedy first-independent-column rule of
``mod2sparse_decomp_osd`` — without ever materializing a per-shot permuted
matrix. Full Gauss-Jordan (clear above and below) makes the OSD-0 solution
a direct read-out and makes every non-pivot column's reduced bits its
coordinates in the pivot basis, so the OSD-E / OSD-CS candidate re-solves
(osd_window.pyx:128-155, :263-279) collapse to XORs of coordinate vectors —
no second triangular solve per candidate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_W = 32
_U32 = jnp.uint32


def _num_words(n: int) -> int:
    return -(-n // _W)


# ---------------------------------------------------------------------------
# host-side helpers (numpy, uint64-packed)
# ---------------------------------------------------------------------------


def pack_rows_host(H: np.ndarray) -> np.ndarray:
    """Pack a 0/1 matrix's rows into uint32 words (little-endian bits)."""
    H = (np.asarray(H) != 0).astype(np.uint8)
    m, n = H.shape
    W = _num_words(n)
    padded = np.zeros((m, W * _W), dtype=np.uint8)
    padded[:, :n] = H
    bits = padded.reshape(m, W, _W).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(_W, dtype=np.uint32))
    return (bits * weights).sum(axis=2, dtype=np.uint32)


def gf2_rank_packed(H: np.ndarray) -> int:
    """Rank over GF(2) via packed elimination (fast host path for big PCMs)."""
    H = (np.asarray(H) != 0).astype(np.uint8)
    m, n = H.shape
    W64 = -(-n // 64)
    padded = np.zeros((m, W64 * 64), dtype=np.uint8)
    padded[:, :n] = H
    bits = padded.reshape(m, W64, 64).astype(np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    rows = (bits * weights).sum(axis=2, dtype=np.uint64)
    rank = 0
    one = np.uint64(1)
    for j in range(n):
        w, s = j >> 6, np.uint64(j & 63)
        col = (rows[rank:, w] >> s) & one
        hits = np.nonzero(col)[0]
        if hits.size == 0:
            continue
        p = rank + hits[0]
        if p != rank:
            rows[[rank, p]] = rows[[p, rank]]
        sel = ((rows[:, w] >> s) & one).astype(bool)
        sel[rank] = False
        rows[sel] ^= rows[rank]
        rank += 1
        if rank == m:
            break
    return rank


# ---------------------------------------------------------------------------
# device kernel: batched ordered Gauss-Jordan
# ---------------------------------------------------------------------------


def _unpack_bits(words, n):
    """[..., W] uint32 -> [..., n] int32 bits."""
    shifts = jnp.arange(_W, dtype=_U32)
    bits = (words[..., None] >> shifts) & _U32(1)
    return bits.reshape(*words.shape[:-1], words.shape[-1] * _W)[..., :n].astype(jnp.int32)


@partial(jax.jit, static_argnames=("m", "n", "rank"))
def ordered_gauss_jordan(H_words, syndrome, rank_pos, *, m: int, n: int, rank: int):
    """Batched reliability-ordered Gauss-Jordan elimination.

    Args:
      H_words: [m, W] packed PCM rows (static, shared across the batch).
      syndrome: [B, m] 0/1.
      rank_pos: [B, n] int32 — per-shot reliability rank of each column
        (position of the column in the sorted order; lower = tried first).
      rank: GF(2) rank of H (static; number of pivot steps).

    Returns dict:
      osd0: [B, n] uint8 — the OSD-0 solution (support in pivot columns).
      piv_col / piv_row: [B, rank] int32.
      coords_words: [B, rank_padded_words? ] — see osd_candidate_sweep; here
        we return the final reduced rows ([B, m, W]) packed, from which
        candidate coordinates are gathered.
      inconsistent: [B] bool — syndrome not in the pivot column span.
    """
    B = syndrome.shape[0]
    W = H_words.shape[1]

    rows = jnp.broadcast_to(H_words[None].astype(_U32), (B, m, W))
    swords = syndrome.astype(_U32)[:, :, None]  # [B, m, 1] one bit per row
    state_rows = jnp.concatenate([rows, swords], axis=2)  # [B, m, W+1]
    unused = jnp.ones((B, m), dtype=bool)
    piv_col = jnp.full((B, rank), -1, jnp.int32)
    piv_row = jnp.full((B, rank), -1, jnp.int32)
    rank_pos = rank_pos.astype(jnp.int32)

    big = jnp.int32(n + 1)

    def body(r, carry):
        state_rows, unused, piv_col, piv_row = carry
        mat = state_rows[:, :, :W]
        # live columns: any 1 in an unused row
        masked = jnp.where(unused[:, :, None], mat, _U32(0))
        live_words = jax.lax.reduce(
            masked, _U32(0), jax.lax.bitwise_or, dimensions=(1,)
        )  # [B, W]
        live = _unpack_bits(live_words, n) > 0  # [B, n]
        # pick live column with smallest reliability rank
        keyed = jnp.where(live, rank_pos, big)
        jstar = jnp.argmin(keyed, axis=1).astype(jnp.int32)  # [B]

        w_idx = (jstar // _W)[:, None, None]  # [B,1,1]
        sh = (jstar % _W).astype(_U32)[:, None]
        colw = jnp.take_along_axis(mat, jnp.broadcast_to(w_idx, (B, m, 1)), axis=2)[..., 0]
        colbits = ((colw >> sh) & _U32(1)).astype(bool)  # [B, m]

        istar = jnp.argmax(colbits & unused, axis=1).astype(jnp.int32)  # first hit
        prow = jnp.take_along_axis(
            state_rows, jnp.broadcast_to(istar[:, None, None], (B, 1, W + 1)), axis=1
        )  # [B, 1, W+1]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, m), 1)
        sel = colbits & (row_ids != istar[:, None])
        state_rows = state_rows ^ (sel[:, :, None].astype(_U32) * prow)

        unused = unused & (row_ids != istar[:, None])
        piv_col = piv_col.at[:, r].set(jstar)
        piv_row = piv_row.at[:, r].set(istar)
        return state_rows, unused, piv_col, piv_row

    state_rows, unused, piv_col, piv_row = jax.lax.fori_loop(
        0, rank, body, (state_rows, unused, piv_col, piv_row)
    )

    synd_bits = (state_rows[:, :, W] & _U32(1)).astype(jnp.int32)  # [B, m]
    sol_bits = jnp.take_along_axis(synd_bits, piv_row, axis=1)  # [B, rank]
    osd0 = (
        jnp.zeros((B, n), jnp.uint8)
        .at[jnp.arange(B)[:, None], piv_col]
        .set(sol_bits.astype(jnp.uint8))
    )
    inconsistent = jnp.any((synd_bits == 1) & unused, axis=1)
    return {
        "osd0": osd0,
        "piv_col": piv_col,
        "piv_row": piv_row,
        "reduced_rows": state_rows[:, :, :W],
        "synd_bits": synd_bits,
        "sol_bits": sol_bits.astype(jnp.uint8),
        "inconsistent": inconsistent,
    }


# ---------------------------------------------------------------------------
# OSD-E / OSD-CS candidate sweep
# ---------------------------------------------------------------------------


def osd_candidate_patterns(k: int, order: int, method: str) -> np.ndarray:
    """Candidate inputs over the k non-pivot columns (host, static).

    Mirrors the reference candidate lists exactly: OSD-E enumerates all
    ``2**order`` patterns over the first ``order`` columns
    (osd_window.pyx:128-132); OSD-CS takes every weight-1 pattern plus the
    weight-2 pairs within the first ``order`` columns (:134-155). The
    all-zero pattern (== OSD-0) is excluded; the caller compares against the
    OSD-0 path metric anyway.
    """
    pats: list[np.ndarray] = []
    if method == "osd_e":
        for v in range(1, 2**order):
            row = np.zeros(k, dtype=np.uint8)
            for b in range(order):
                row[b] = (v >> b) & 1
            pats.append(row)
    elif method == "osd_cs":
        for i in range(k):
            row = np.zeros(k, dtype=np.uint8)
            row[i] = 1
            pats.append(row)
        for i in range(order):
            for j in range(i + 1, order):
                row = np.zeros(k, dtype=np.uint8)
                row[i] = row[j] = 1
                pats.append(row)
    elif method == "osd_0":
        pass
    else:
        raise ValueError(f"unknown OSD method {method!r}")
    if not pats:
        return np.zeros((0, k), dtype=np.uint8)
    return np.stack(pats)


@partial(jax.jit, static_argnames=("k",))
def osd_sweep(
    gj,
    rank_order_cols,
    channel_llr,
    patterns,
    *,
    k: int,
):
    """Evaluate OSD candidates and return the min-path-metric solution.

    Args:
      gj: output dict of :func:`ordered_gauss_jordan`.
      rank_order_cols: [B, n] int32 — per-shot columns sorted by reliability
        (the order used to build ``rank_pos``).
      channel_llr: [n] or [B, n] prior LLRs (path-metric weights).
      patterns: [K, k] uint8 candidate inputs over the first k non-pivot
        columns in reliability order.

    Returns (solution [B, n] uint8, min_pm [B]).
    """
    osd0 = gj["osd0"]
    piv_col = gj["piv_col"]
    piv_row = gj["piv_row"]
    B, n = osd0.shape
    R = piv_col.shape[1]
    if channel_llr.ndim == 1:
        channel_llr = jnp.broadcast_to(channel_llr, (B, n))
    channel_llr = channel_llr.astype(jnp.float32)

    pm0 = jnp.sum(channel_llr * osd0, axis=1)
    K = patterns.shape[0]
    if K == 0:
        return osd0, pm0

    # non-pivot columns in reliability order: scatter pivot marks, then sort
    is_piv = jnp.zeros((B, n), bool).at[jnp.arange(B)[:, None], piv_col].set(True)
    # reliability position of each column
    order = rank_order_cols  # [B, n] column ids sorted by reliability
    piv_in_order = jnp.take_along_axis(is_piv, order, axis=1)  # [B, n] bool
    # indices (into order) of the first k non-pivot entries
    nonpiv_rank = jnp.cumsum((~piv_in_order).astype(jnp.int32), axis=1) - 1
    # position of t-th non-pivot column in `order`
    slot = jnp.where(~piv_in_order, nonpiv_rank, n)
    # gather: for t in [0, k): column id
    inv = jnp.full((B, n + 1), 0, jnp.int32).at[
        jnp.arange(B)[:, None], jnp.minimum(slot, n)
    ].set(order)
    ht_cols = inv[:, :k]  # [B, k] column ids of candidate columns

    # coordinates of each candidate column in the pivot basis:
    # reduced bit at (piv_row[r], ht_cols[t])
    reduced = gj["reduced_rows"]  # [B, m, W]
    w_idx = ht_cols // _W  # [B, k]
    sh = (ht_cols % _W).astype(_U32)
    rows_at_piv = jnp.take_along_axis(
        reduced, piv_row[:, :, None], axis=1
    )  # [B, R, W]
    words = jnp.take_along_axis(
        rows_at_piv, jnp.broadcast_to(w_idx[:, None, :], (B, R, k)), axis=2
    )  # [B, R, k]
    coords = ((words >> sh[:, None, :]) & _U32(1)).astype(jnp.int32)  # [B,R,k]

    pats_f = patterns.astype(jnp.int32)  # [K, k]
    # pivot-bit flips per candidate: coords @ pattern (mod 2)
    flips = jnp.einsum("brk,ck->bcr", coords, pats_f) % 2  # [B, K, R]
    y_piv = gj["sol_bits"].astype(jnp.int32)[:, None, :] ^ flips  # [B, K, R]

    llr_piv = jnp.take_along_axis(channel_llr, piv_col, axis=1)  # [B, R]
    llr_cand = jnp.take_along_axis(channel_llr, ht_cols, axis=1)  # [B, k]
    # full-f32 contractions: path metrics feed argmin comparisons, so the
    # default (bf16-multiplicand) matmul precision is not acceptable here
    hi = jax.lax.Precision.HIGHEST
    pm = jnp.einsum(
        "bcr,br->bc", y_piv.astype(jnp.float32), llr_piv, precision=hi
    ) + jnp.einsum(
        "bk,ck->bc", llr_cand, pats_f.astype(jnp.float32), precision=hi
    )  # [B, K]

    best = jnp.argmin(pm, axis=1)
    best_pm = jnp.take_along_axis(pm, best[:, None], axis=1)[:, 0]
    use_cand = best_pm < pm0

    best_y = jnp.take_along_axis(
        y_piv, best[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]  # [B, R]
    best_pat = patterns[best]  # [B, k]
    sol = jnp.zeros((B, n), jnp.uint8)
    sol = sol.at[jnp.arange(B)[:, None], piv_col].set(best_y.astype(jnp.uint8))
    sol = sol.at[jnp.arange(B)[:, None], ht_cols].set(best_pat.astype(jnp.uint8))
    solution = jnp.where(use_cand[:, None], sol, osd0)
    min_pm = jnp.minimum(pm0, best_pm)
    return solution, min_pm


def osd_decode(
    H_words,
    syndrome,
    reliability,
    channel_llr,
    patterns,
    *,
    m: int,
    n: int,
    rank: int,
    k: int,
):
    """Full OSD: order columns by reliability, eliminate, sweep candidates.

    ``reliability``: [B, n] float — smaller = more likely in error = tried
    first (the reference sorts ascending llr_sum, osd_window.pyx:215).
    """
    order = jnp.argsort(reliability, axis=1, stable=True).astype(jnp.int32)
    B, n_ = order.shape
    rank_pos = (
        jnp.zeros((B, n_), jnp.int32)
        .at[jnp.arange(B)[:, None], order]
        .set(jnp.broadcast_to(jnp.arange(n_, dtype=jnp.int32), (B, n_)))
    )
    gj = ordered_gauss_jordan(H_words, syndrome, rank_pos, m=m, n=n, rank=rank)
    solution, min_pm = osd_sweep(gj, order, channel_llr, patterns, k=k)
    return {
        "solution": solution,
        "osd0": gj["osd0"],
        "min_pm": min_pm,
        "inconsistent": gj["inconsistent"],
    }
