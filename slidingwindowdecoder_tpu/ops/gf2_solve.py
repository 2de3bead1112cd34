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
def ordered_gauss_jordan(H_words, syndrome, order, *, m: int, n: int, rank: int):
    """Batched reliability-ordered Gauss-Jordan elimination (batch-minor).

    Internally the batch lives on the last (lane) axis. Each of the
    ``rank`` steps picks, per lane, the live column (a 1 in some unused
    row) with the best reliability rank — exactly
    ``mod2sparse_decomp_osd``'s greedy first-independent-column rule
    (mod2sparse_extra.cpp:113-376). All per-shot dynamic indexing (pivot
    column word, pivot row) is realized as one-hot reductions over major
    axes — measured faster on TPU than the equivalent per-lane gathers.
    (Two rejected alternatives, both measured slower on hardware: a
    skip-and-retry loop without the live mask — windowed DEM matrices
    have heavily dependent reliability prefixes, so retries blow the trip
    count far past ``rank`` — and take_along_axis extraction of the pivot
    column/row, which hits the backend's slow-gather path.)

    Args:
      H_words: [m, W] packed PCM rows (static, shared across the batch).
      syndrome: [B, m] 0/1.
      order: [B, n] int32 — per-shot column ids in reliability order
        (most-likely-in-error first; tried in this order).
      rank: GF(2) rank of H (static; number of pivot steps).

    Returns dict (batch-major views for consumers):
      osd0 [B, n] uint8; piv_col / piv_row [B, rank] int32;
      reduced_wm [W, m, B] packed final rows (word-major, so the sweeps'
      per-word slices are leading-axis — keeping them cheap regardless of
      the layout XLA picks when the GJ fuses into a larger program);
      sol_bits [B, rank]; inconsistent [B] bool.
    """
    B = syndrome.shape[0]
    W = H_words.shape[1]

    rows = jnp.broadcast_to(H_words[:, :, None].astype(_U32), (m, W, B))
    swords = syndrome.astype(_U32).T[:, None, :]  # [m, 1, B]
    state_rows = jnp.concatenate([rows, swords], axis=1)  # [m, W+1, B]
    unused = jnp.ones((m, B), dtype=bool)
    piv_col = jnp.full((rank, B), -1, jnp.int32)
    piv_row = jnp.full((rank, B), -1, jnp.int32)
    order_t = order.astype(jnp.int32).T  # [n, B]
    # rank_pos[j, b] = position of column j in lane b's order
    rank_pos_t = (
        jnp.zeros((n, B), jnp.int32)
        .at[order_t, jnp.arange(B)[None, :]]
        .set(jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, B)))
    )

    big = jnp.int32(n + 1)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    shifts = jax.lax.broadcasted_iota(_U32, (W, _W, B), 1)

    def body(r, carry):
        state_rows, unused, piv_col, piv_row = carry
        mat = state_rows[:, :W, :]
        # live columns: any 1 in an unused row; OR-reduce over the row axis
        masked = jnp.where(unused[:, None, :], mat, _U32(0))
        live_words = jax.lax.reduce(
            masked, _U32(0), jax.lax.bitwise_or, dimensions=(0,)
        )  # [W, B]
        live_bits = ((live_words[:, None, :] >> shifts) & _U32(1)).reshape(
            W * _W, B
        )[:n]
        keyed = jnp.where(live_bits > 0, rank_pos_t, big)
        jstar = jnp.argmin(keyed, axis=0).astype(jnp.int32)  # [B]

        # pivot-column bit of every row: one-hot select the word, then shift
        word_hot = (iota_w == (jstar // _W)[None, :]).astype(_U32)  # [W, B]
        colw = jnp.sum(mat * word_hot[None, :, :], axis=1)  # [m, B]
        colbits = ((colw >> (jstar % _W).astype(_U32)[None, :]) & _U32(1)) > 0

        # first unused row holding the pivot column
        istar = jnp.argmin(
            jnp.where(colbits & unused, iota_m, jnp.int32(m + 1)), axis=0
        ).astype(jnp.int32)  # [B]
        row_hot = (iota_m == istar[None, :]).astype(_U32)  # [m, B]
        prow = jnp.sum(state_rows * row_hot[:, None, :], axis=0)  # [W+1, B]

        sel = colbits & (iota_m != istar[None, :])
        state_rows = state_rows ^ (sel[:, None, :].astype(_U32) * prow[None, :, :])

        unused = unused & (iota_m != istar[None, :])
        piv_col = jax.lax.dynamic_update_slice(piv_col, jstar[None, :], (r, 0))
        piv_row = jax.lax.dynamic_update_slice(piv_row, istar[None, :], (r, 0))
        return state_rows, unused, piv_col, piv_row

    state_rows, unused, piv_col, piv_row = jax.lax.fori_loop(
        0, rank, body, (state_rows, unused, piv_col, piv_row)
    )

    synd_bits = (state_rows[:, W, :] & _U32(1)).astype(jnp.int32)  # [m, B]
    sol_bits = jnp.take_along_axis(synd_bits, piv_row, axis=0)  # [rank, B]
    lane = jnp.arange(B)[None, :]
    osd0 = (
        jnp.zeros((n, B), jnp.uint8)
        .at[piv_col, lane]
        .set(sol_bits.astype(jnp.uint8))
        .T
    )
    inconsistent = jnp.any((synd_bits == 1) & unused, axis=0)
    return {
        "osd0": osd0,
        "piv_col": piv_col.T,
        "piv_row": piv_row.T,
        "reduced_wm": jnp.transpose(state_rows[:, :W, :], (1, 0, 2)),
        "synd_bits": synd_bits.T,
        "sol_bits": jnp.transpose(sol_bits).astype(jnp.uint8),
        "inconsistent": inconsistent,
    }


# ---------------------------------------------------------------------------
# OSD-E / OSD-CS candidate sweep
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("m", "n", "rank"))
def ordered_gauss_jordan_key(H_words, syndrome, key, *, m: int, n: int,
                             rank: int):
    """``ordered_gauss_jordan`` with FLOAT reliability keys, no sort.

    ``key`` [B, n] float32, smaller = more-likely-in-error = tried first.
    Pivot selection = per-lane argmin of the key over live columns; on
    exactly equal keys argmin takes the lower column id — identical to
    the stable-argsort rank order the integer form consumes. Keeping the
    sort OUT of this program matters: a sort fused into the same XLA
    module as the elimination fori makes the compiler stage the loop
    carry through scoped-vmem copies at ~1 ms per staged buffer (the
    whole fused-OSD slowdown of rounds <=4; tools probes, round 5).
    """
    B = syndrome.shape[0]
    W = H_words.shape[1]

    rows = jnp.broadcast_to(H_words[:, :, None].astype(_U32), (m, W, B))
    swords = syndrome.astype(_U32).T[:, None, :]  # [m, 1, B]
    state_rows = jnp.concatenate([rows, swords], axis=1)  # [m, W+1, B]
    unused = jnp.ones((m, B), dtype=bool)
    piv_col = jnp.full((rank, B), -1, jnp.int32)
    piv_row = jnp.full((rank, B), -1, jnp.int32)
    key_t = key.astype(jnp.float32).T  # [n, B]

    inf = jnp.float32(np.inf)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (m, B), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    shifts = jax.lax.broadcasted_iota(_U32, (W, _W, B), 1)

    def body(r, carry):
        state_rows, unused, piv_col, piv_row = carry
        mat = state_rows[:, :W, :]
        masked = jnp.where(unused[:, None, :], mat, _U32(0))
        live_words = jax.lax.reduce(
            masked, _U32(0), jax.lax.bitwise_or, dimensions=(0,)
        )  # [W, B]
        live_bits = ((live_words[:, None, :] >> shifts) & _U32(1)).reshape(
            W * _W, B
        )[:n]
        keyed = jnp.where(live_bits > 0, key_t, inf)
        jstar = jnp.argmin(keyed, axis=0).astype(jnp.int32)  # [B]

        word_hot = (iota_w == (jstar // _W)[None, :]).astype(_U32)  # [W, B]
        colw = jnp.sum(mat * word_hot[None, :, :], axis=1)  # [m, B]
        colbits = ((colw >> (jstar % _W).astype(_U32)[None, :]) & _U32(1)) > 0

        istar = jnp.argmin(
            jnp.where(colbits & unused, iota_m, jnp.int32(m + 1)), axis=0
        ).astype(jnp.int32)  # [B]
        row_hot = (iota_m == istar[None, :]).astype(_U32)  # [m, B]
        prow = jnp.sum(state_rows * row_hot[:, None, :], axis=0)  # [W+1, B]

        sel = colbits & (iota_m != istar[None, :])
        state_rows = state_rows ^ (sel[:, None, :].astype(_U32) * prow[None, :, :])

        unused = unused & (iota_m != istar[None, :])
        piv_col = jax.lax.dynamic_update_slice(piv_col, jstar[None, :], (r, 0))
        piv_row = jax.lax.dynamic_update_slice(piv_row, istar[None, :], (r, 0))
        return state_rows, unused, piv_col, piv_row

    state_rows, unused, piv_col, piv_row = jax.lax.fori_loop(
        0, rank, body, (state_rows, unused, piv_col, piv_row)
    )

    synd_bits = (state_rows[:, W, :] & _U32(1)).astype(jnp.int32)  # [m, B]
    sol_bits = jnp.take_along_axis(synd_bits, piv_row, axis=0)  # [rank, B]
    lane = jnp.arange(B)[None, :]
    osd0 = (
        jnp.zeros((n, B), jnp.uint8)
        .at[piv_col, lane]
        .set(sol_bits.astype(jnp.uint8))
        .T
    )
    inconsistent = jnp.any((synd_bits == 1) & unused, axis=0)
    return {
        "osd0": osd0,
        "piv_col": piv_col.T,
        "piv_row": piv_row.T,
        "reduced_wm": jnp.transpose(state_rows[:, :W, :], (1, 0, 2)),
        "synd_bits": synd_bits.T,
        "sol_bits": jnp.transpose(sol_bits).astype(jnp.uint8),
        "inconsistent": inconsistent,
    }


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


def analyze_patterns(patterns, k: int) -> dict:
    """Host-side candidate-structure analysis (static per decoder).

    Recognizes the OSD-CS layout (k weight-1 rows followed by weight-2
    pairs) so the device sweep can use the linearized path-metric trick;
    anything else falls back to a dense small-support einsum (OSD-E).
    """
    pats = np.asarray(patterns, dtype=np.uint8)
    K = pats.shape[0]
    if K == 0:
        return {"kind": "none"}
    weights = pats.sum(axis=1)
    if (
        K >= k
        and k > 0
        and np.array_equal(pats[:k], np.eye(k, dtype=np.uint8))
        and (weights[k:] == 2).all()
    ):
        if K > k:
            pi, pj = [], []
            for row in pats[k:]:
                i, j = np.nonzero(row)[0]
                pi.append(i)
                pj.append(j)
        else:
            pi, pj = [], []
        return {
            "kind": "cs",
            "pair_i": jnp.asarray(np.asarray(pi, np.int32)),
            "pair_j": jnp.asarray(np.asarray(pj, np.int32)),
            "order_w": (max(pj) + 1) if pj else 0,
        }
    supp = int(np.nonzero(pats.any(axis=0))[0].max()) + 1
    # device-resident once: re-uploading the full pattern matrix per decode
    # call would dwarf the sweep itself on tunneled TPU setups
    return {"kind": "dense", "patterns": jnp.asarray(pats), "support": supp}


def _ht_cols(gj, rank_order_cols, k):
    """First k non-pivot columns in reliability order, [B, k] int32."""
    osd0 = gj["osd0"]
    piv_col = gj["piv_col"]
    B, n = osd0.shape
    is_piv = jnp.zeros((B, n), bool).at[jnp.arange(B)[:, None], piv_col].set(True)
    order = rank_order_cols
    piv_in_order = jnp.take_along_axis(is_piv, order, axis=1)
    nonpiv_rank = jnp.cumsum((~piv_in_order).astype(jnp.int32), axis=1) - 1
    slot = jnp.where(~piv_in_order, nonpiv_rank, n)
    inv = jnp.full((B, n + 1), 0, jnp.int32).at[
        jnp.arange(B)[:, None], jnp.minimum(slot, n)
    ].set(order)
    return inv[:, :k]


def _extract_bitcols(reduced_wm, col_ids_bm):
    """Bits of per-shot columns from packed rows, without lane gathers.

    reduced_wm: [W, m, B]; col_ids_bm: [T, B] per-lane column ids.
    Returns [T, m, B] float32 bits — one-hot word selection + per-lane shift.
    """
    W, m, B = reduced_wm.shape
    T = col_ids_bm.shape[0]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)  # [W, 1]
    cols = []
    for t in range(T):
        cid = col_ids_bm[t]  # [B]
        word_hot = (iota_w == (cid // _W)[None, :]).astype(_U32)  # [W, B]
        colw = jnp.sum(reduced_wm * word_hot[:, None, :], axis=0)  # [m, B]
        bits = (colw >> (cid % _W).astype(_U32)[None, :]) & _U32(1)
        cols.append(bits.astype(jnp.float32))
    return jnp.stack(cols)  # [T, m, B]


def _weighted_bit_sums(reduced_wm, w_rows, n):
    """a_all[j, b] = sum_i bit(row i, col j) * w_rows[i, b], for all columns.

    One pass per packed word (static unroll, W ~ tens): unpack [m, 32, B]
    bits and contract the row axis. Total work m*n*B multiply-adds with no
    gathers and no [.., n] materialization beyond the [n, B] result.
    """
    W, m, B = reduced_wm.shape
    shifts = jnp.arange(_W, dtype=_U32)[None, :, None]  # [1, 32, 1]
    chunks = []
    for w_idx in range(W):
        word = reduced_wm[w_idx]  # [m, B] — leading-axis slice
        bits = ((word[:, None, :] >> shifts) & _U32(1)).astype(jnp.float32)
        # elementwise multiply + reduce over the MAJOR (m) axis: fuses
        # into one VPU pass per word. (The einsum form lowers to per-lane
        # batched matvecs — ~100x slower on this backend; round 5.)
        chunks.append(jnp.sum(bits * w_rows[:, None, :], axis=0))
    return jnp.concatenate(chunks, axis=0)[:n]  # [n, B]


@partial(jax.jit, static_argnames=("k", "order_w"))
def _osd_sweep_cs(gj, rank_order_cols, channel_llr, pair_i, pair_j, *, k, order_w):
    """OSD-CS sweep, batch-minor, no [B, K, R] materialization.

    pm is linear in the flipped pivot bits: flipping candidate column t
    changes pm by a_t = <coords_t, w> with w_r = llr_piv_r (1 - 2 sol_r),
    so all k weight-1 candidates cost one weighted bit-sum over the reduced
    matrix; weight-2 pairs add a small Gram correction over the first
    ``order_w`` candidate columns.
    """
    hi = jax.lax.Precision.HIGHEST
    osd0 = gj["osd0"]
    B, n = osd0.shape
    R = gj["piv_col"].shape[1]
    reduced = gj["reduced_wm"]  # [W, m, B]
    m = reduced.shape[1]
    piv_col_bm = gj["piv_col"].T  # [R, B]
    piv_row_bm = gj["piv_row"].T
    sol_bm = gj["sol_bits"].T.astype(jnp.float32)  # [R, B]
    lane = jnp.arange(B)[None, :]

    llr = channel_llr.astype(jnp.float32)
    if llr.ndim == 1:
        llr_bm = jnp.broadcast_to(llr[:, None], (n, B))
    else:
        llr_bm = llr.T
    pm0 = jnp.sum(jnp.where(osd0.T == 1, llr_bm, 0.0), axis=0)  # [B]

    llr_piv = jnp.take_along_axis(llr_bm, piv_col_bm, axis=0)  # [R, B]
    w = llr_piv * (1.0 - 2.0 * sol_bm)
    w_rows = jnp.zeros((m, B), jnp.float32).at[piv_row_bm, lane].set(w)

    a_all = _weighted_bit_sums(reduced, w_rows, n)  # [n, B]
    ht = _ht_cols(gj, rank_order_cols, k)  # [B, k]
    ht_bm = ht.T  # [k, B]
    a = jnp.take_along_axis(a_all, ht_bm, axis=0)  # [k, B]
    llr_cand = jnp.take_along_axis(llr_bm, ht_bm, axis=0)
    pm_w1 = pm0[None, :] + a + llr_cand  # [k, B]

    P = pair_i.shape[0]
    if P:
        sub_cols = _extract_bitcols(reduced, ht_bm[:order_w])  # [ord, m, B]
        coords_sub = jnp.stack(
            [
                jnp.take_along_axis(sub_cols[t], piv_row_bm, axis=0)
                for t in range(order_w)
            ]
        )  # [ord, R, B]
        # elementwise broadcast + reduce over R (second-minor axis): the
        # einsum form lowers to per-lane batched contractions (see
        # _weighted_bit_sums)
        cw = coords_sub * w[None, :, :]  # [ord, R, B]
        gram = jnp.sum(
            coords_sub[:, None, :, :] * cw[None, :, :, :], axis=2
        )  # [ord, ord, B]
        pm_w2 = (
            pm0[None, :]
            + a[pair_i] + a[pair_j]
            - 2.0 * gram[pair_i, pair_j]
            + llr_cand[pair_i] + llr_cand[pair_j]
        )  # [P, B]
        pm = jnp.concatenate([pm_w1, pm_w2], axis=0)  # [k+P, B]
    else:
        pm = pm_w1

    best = jnp.argmin(pm, axis=0).astype(jnp.int32)  # [B]
    best_pm = jnp.min(pm, axis=0)
    use_cand = best_pm < pm0

    # winner columns (1 or 2); reconstruct only those
    is_pair = best >= k
    p_idx = jnp.clip(best - k, 0, max(P - 1, 0))
    t1 = jnp.where(is_pair, pair_i[p_idx] if P else 0, best)
    t2 = jnp.where(is_pair, pair_j[p_idx] if P else 0, 0)
    c1 = jnp.take_along_axis(ht_bm, t1[None, :], axis=0)[0]  # [B] col ids
    c2 = jnp.take_along_axis(ht_bm, t2[None, :], axis=0)[0]
    win_cols = _extract_bitcols(reduced, jnp.stack([c1, c2]))  # [2, m, B]
    f1 = jnp.take_along_axis(win_cols[0], piv_row_bm, axis=0)
    f2 = jnp.take_along_axis(win_cols[1], piv_row_bm, axis=0)
    flip = jnp.mod(f1 + jnp.where(is_pair[None, :], f2, 0.0), 2.0)
    y = jnp.mod(sol_bm + flip, 2.0)  # [R, B]

    out = jnp.zeros((n + 1, B), jnp.uint8)
    out = out.at[piv_col_bm, lane].set(y.astype(jnp.uint8))
    out = out.at[c1[None, :], lane].set(jnp.uint8(1))
    c2_or_pad = jnp.where(is_pair, c2, n)  # pad row swallows non-pairs
    out = out.at[c2_or_pad[None, :], lane].set(jnp.uint8(1))
    solution = jnp.where(use_cand[:, None], out[:n].T, osd0)
    min_pm = jnp.minimum(pm0, best_pm)
    return solution, min_pm


@partial(jax.jit, static_argnames=("order_w",))
def _osd_sweep_cs_sortless(gj, rel, channel_llr, pair_i, pair_j, *, order_w):
    """OSD-CS sweep without any sort in the program.

    The weight-1 candidate set is ALL non-pivot columns (identical to the
    reliability-ordered first-k list: there are exactly k = n - rank of
    them), evaluated masked over the full column axis; the weight-2 pair
    set needs only the ``order_w`` most unreliable non-pivot columns,
    found by ``order_w`` iterated masked argmins (exact, and ties resolve
    to the lower column id — the stable-argsort order). Results match
    ``_osd_sweep_cs`` except which of several exactly-equal-pm candidates
    wins (measure-zero float ties).

    Keeping sorts out of the module is what makes the FUSED form fast:
    see ``ordered_gauss_jordan_key``'s docstring.
    """
    osd0 = gj["osd0"]
    B, n = osd0.shape
    reduced = gj["reduced_wm"]  # [W, m, B]
    m = reduced.shape[1]
    piv_col_bm = gj["piv_col"].T  # [R, B]
    piv_row_bm = gj["piv_row"].T
    sol_bm = gj["sol_bits"].T.astype(jnp.float32)  # [R, B]
    lane = jnp.arange(B)[None, :]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    inf = jnp.float32(np.inf)

    llr = channel_llr.astype(jnp.float32)
    llr_bm = (
        jnp.broadcast_to(llr[:, None], (n, B)) if llr.ndim == 1 else llr.T
    )
    pm0 = jnp.sum(jnp.where(osd0.T == 1, llr_bm, 0.0), axis=0)  # [B]

    llr_piv = jnp.take_along_axis(llr_bm, piv_col_bm, axis=0)  # [R, B]
    w = llr_piv * (1.0 - 2.0 * sol_bm)
    w_rows = jnp.zeros((m, B), jnp.float32).at[piv_row_bm, lane].set(w)

    a_all = _weighted_bit_sums(reduced, w_rows, n)  # [n, B]

    nonpiv = jnp.ones((n, B), bool).at[piv_col_bm, lane].set(False)
    pm_w1 = jnp.where(nonpiv, pm0[None, :] + a_all + llr_bm, inf)  # [n, B]
    best1_col = jnp.argmin(pm_w1, axis=0).astype(jnp.int32)  # [B]
    best1_pm = jnp.min(pm_w1, axis=0)

    rel_t = rel.astype(jnp.float32).T  # [n, B]
    P = pair_i.shape[0]
    if P:
        # order_w most unreliable non-pivot columns, in reliability order
        keyr = jnp.where(nonpiv, rel_t, inf)
        tops = []
        for _ in range(order_w):
            tid = jnp.argmin(keyr, axis=0).astype(jnp.int32)  # [B]
            tops.append(tid)
            keyr = jnp.where(iota_n == tid[None, :], inf, keyr)
        top_ids = jnp.stack(tops)  # [order_w, B]

        a_top = jnp.take_along_axis(a_all, top_ids, axis=0)  # [ow, B]
        llr_top = jnp.take_along_axis(llr_bm, top_ids, axis=0)
        sub_cols = _extract_bitcols(reduced, top_ids)  # [ow, m, B]
        coords_sub = jnp.stack(
            [
                jnp.take_along_axis(sub_cols[t], piv_row_bm, axis=0)
                for t in range(order_w)
            ]
        )  # [ow, R, B]
        cw = coords_sub * w[None, :, :]  # [ow, R, B]
        gram = jnp.sum(
            coords_sub[:, None, :, :] * cw[None, :, :, :], axis=2
        )  # [ow, ow, B]
        pm_w2 = (
            pm0[None, :]
            + a_top[pair_i] + a_top[pair_j]
            - 2.0 * gram[pair_i, pair_j]
            + llr_top[pair_i] + llr_top[pair_j]
        )  # [P, B]
        best2_idx = jnp.argmin(pm_w2, axis=0).astype(jnp.int32)
        best2_pm = jnp.min(pm_w2, axis=0)
    else:
        best2_idx = jnp.zeros((B,), jnp.int32)
        best2_pm = jnp.full((B,), inf)

    is_pair = best2_pm < best1_pm
    best_pm = jnp.minimum(best1_pm, best2_pm)
    use_cand = best_pm < pm0

    if P:
        c1 = jnp.where(
            is_pair,
            jnp.take_along_axis(
                top_ids, pair_i[best2_idx][None, :], axis=0
            )[0],
            best1_col,
        )
        c2 = jnp.take_along_axis(top_ids, pair_j[best2_idx][None, :], axis=0)[0]
    else:
        c1, c2 = best1_col, jnp.zeros((B,), jnp.int32)

    win_cols = _extract_bitcols(reduced, jnp.stack([c1, c2]))  # [2, m, B]
    f1 = jnp.take_along_axis(win_cols[0], piv_row_bm, axis=0)
    f2 = jnp.take_along_axis(win_cols[1], piv_row_bm, axis=0)
    flip = jnp.mod(f1 + jnp.where(is_pair[None, :], f2, 0.0), 2.0)
    y = jnp.mod(sol_bm + flip, 2.0)  # [R, B]

    out = jnp.zeros((n + 1, B), jnp.uint8)
    out = out.at[piv_col_bm, lane].set(y.astype(jnp.uint8))
    out = out.at[c1[None, :], lane].set(jnp.uint8(1))
    c2_or_pad = jnp.where(is_pair, c2, n)  # pad row swallows non-pairs
    out = out.at[c2_or_pad[None, :], lane].set(jnp.uint8(1))
    solution = jnp.where(use_cand[:, None], out[:n].T, osd0)
    min_pm = jnp.minimum(pm0, best_pm)
    return solution, min_pm


@partial(jax.jit, static_argnames=("k", "supp"))
def _osd_sweep_dense(gj, rank_order_cols, channel_llr, patterns, *, k, supp):
    """Generic small-support sweep (OSD-E): dense over the support prefix."""
    hi = jax.lax.Precision.HIGHEST
    osd0 = gj["osd0"]
    B, n = osd0.shape
    reduced = gj["reduced_wm"]
    piv_col_bm = gj["piv_col"].T
    piv_row_bm = gj["piv_row"].T
    sol_bm = gj["sol_bits"].T.astype(jnp.float32)
    lane = jnp.arange(B)[None, :]

    llr = channel_llr.astype(jnp.float32)
    llr_bm = (
        jnp.broadcast_to(llr[:, None], (n, B)) if llr.ndim == 1 else llr.T
    )
    pm0 = jnp.sum(jnp.where(osd0.T == 1, llr_bm, 0.0), axis=0)
    llr_piv = jnp.take_along_axis(llr_bm, piv_col_bm, axis=0)
    w = llr_piv * (1.0 - 2.0 * sol_bm)

    ht = _ht_cols(gj, rank_order_cols, k)
    ht_bm = ht.T
    sub_cols = _extract_bitcols(reduced, ht_bm[:supp])  # [supp, m, B]
    coords_sub = jnp.stack(
        [jnp.take_along_axis(sub_cols[t], piv_row_bm, axis=0) for t in range(supp)]
    )  # [supp, R, B]
    llr_cand = jnp.take_along_axis(llr_bm, ht_bm[:supp], axis=0)  # [supp, B]

    p_sub = patterns[:, :supp].astype(jnp.float32)  # [K, supp]
    flips = jnp.mod(
        jnp.einsum("ck,krb->crb", p_sub, coords_sub, precision=hi), 2.0
    )  # [K, R, B]
    pm = (
        pm0[None, :]
        + jnp.einsum("crb,rb->cb", flips, w, precision=hi)
        + jnp.einsum("ck,kb->cb", p_sub, llr_cand, precision=hi)
    )

    best = jnp.argmin(pm, axis=0).astype(jnp.int32)
    best_pm = jnp.min(pm, axis=0)
    use_cand = best_pm < pm0

    best_pat = jnp.take(patterns, best, axis=0).T.astype(jnp.float32)  # [k, B]
    flip_best = jnp.mod(
        jnp.einsum("kb,krb->rb", best_pat[:supp], coords_sub, precision=hi), 2.0
    )
    y = jnp.mod(sol_bm + flip_best, 2.0)
    out = jnp.zeros((n, B), jnp.uint8)
    out = out.at[piv_col_bm, lane].set(y.astype(jnp.uint8))
    out = out.at[ht_bm, lane].set(best_pat.astype(jnp.uint8))
    solution = jnp.where(use_cand[:, None], out.T, osd0)
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
    meta: dict | None = None,
    engine: str = "xla",
):
    """Full OSD: order columns by reliability, eliminate, sweep candidates.

    ``reliability``: [B, n] float — smaller = more likely in error = tried
    first (the reference sorts ascending llr_sum, osd_window.pyx:215).
    ``meta`` is the static ``analyze_patterns`` result; callers decoding
    repeatedly MUST pass it (computing it here pulls ``patterns`` back to
    the host every call — a ~2 MB device→host transfer that dwarfs the
    actual elimination on tunneled TPU setups).
    ``engine``: "xla" | "pallas" | "pallas_interpret" — elimination kernel
    (the Pallas kernel keeps the packed state VMEM-resident; results are
    bit-identical).
    """
    if meta is None:
        meta = analyze_patterns(np.asarray(patterns), k)

    if meta["kind"] == "cs" and k > 0 and engine == "xla":
        # sortless fast path: float-key pivoting + masked all-column
        # sweep — no argsort anywhere in the module, so the fused form
        # (inside a decoder core / window step) compiles without the
        # scoped-vmem staging that cost ~30 ms per 256-bucket
        gj = ordered_gauss_jordan_key(
            H_words, syndrome, reliability, m=m, n=n, rank=rank
        )
        pi, pj = jnp.asarray(meta["pair_i"]), jnp.asarray(meta["pair_j"])
        order_w = int(meta["order_w"])
        solution, min_pm = _osd_sweep_cs_sortless(
            gj, reliability, channel_llr, pi, pj, order_w=order_w
        )
        return {
            "solution": solution,
            "osd0": gj["osd0"],
            "min_pm": min_pm,
            "inconsistent": gj["inconsistent"],
        }

    order = jnp.argsort(reliability, axis=1, stable=True).astype(jnp.int32)
    if engine in ("pallas", "pallas_interpret"):
        from .gf2_pallas import ordered_gauss_jordan_pallas

        gj = ordered_gauss_jordan_pallas(
            H_words, syndrome, order, m=m, n=n, rank=rank,
            interpret=engine == "pallas_interpret",
        )
    else:
        gj = ordered_gauss_jordan(H_words, syndrome, order, m=m, n=n, rank=rank)

    if meta["kind"] == "none" or k == 0:
        llr = channel_llr.astype(jnp.float32)
        if llr.ndim == 1:
            llr = jnp.broadcast_to(llr, gj["osd0"].shape)
        pm0 = jnp.sum(llr * gj["osd0"], axis=1)
        solution, min_pm = gj["osd0"], pm0
    elif meta["kind"] == "cs":
        pi, pj = jnp.asarray(meta["pair_i"]), jnp.asarray(meta["pair_j"])
        if "order_w" in meta:
            order_w = int(meta["order_w"])
        else:
            order_w = int(np.asarray(meta["pair_j"]).max()) + 1 if len(pj) else 0
        solution, min_pm = _osd_sweep_cs(
            gj, order, channel_llr, pi, pj, k=k, order_w=order_w,
        )
    else:
        solution, min_pm = _osd_sweep_dense(
            gj, order, channel_llr, jnp.asarray(meta["patterns"]),
            k=k, supp=meta["support"],
        )
    return {
        "solution": solution,
        "osd0": gj["osd0"],
        "min_pm": min_pm,
        "inconsistent": gj["inconsistent"],
    }
