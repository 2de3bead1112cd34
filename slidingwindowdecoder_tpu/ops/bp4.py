"""Batched quaternary (GF(4)) belief propagation.

TPU-native re-design of the reference ``bp4_osd`` message passing
(bp4_osd.pyx:425-588): scalar LLR messages on the edges of BOTH Tanner
graphs (Hx carries the Z-component messages, Hz the X-component), standard
min-sum check updates per basis, and a joint variable update that combines
the X/Y/Z channel LLRs with both graphs' aggregates through stable
log1pexp / logaddexp.

Decided variables (CAMEL decimation) freeze their outgoing messages at the
init value and flip the check parities, exactly like the reference's
``vn_set_value`` (bp4_osd.pyx:385-420) — note the reference does NOT mask
decided VNs out of check updates, and neither do we.

Layout: batch-minor throughout ([m, dc, B] messages, [n, B] states).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e30


def log1pexp(x):
    """log(1 + e^x), stable (bpgd.cpp:399-406 contract)."""
    return jnp.logaddexp(0.0, x)


def _cn_minsum_bm(garr, mv, cn_parity_t, *, alpha, clip):
    """Min-sum check update, batch-minor; returns mc [m, dc, B].

    Identical two-pass semantics to the binary kernel (zero counts
    negative, clip inside the update, first-argmin gets the second min).
    """
    cn_valid = garr["cn_valid"]
    m, dc = garr["cn_vn"].shape
    B = mv.shape[-1]
    mvc = jnp.clip(mv, -clip, clip)
    edge_valid = jnp.broadcast_to(cn_valid[:, :, None], (m, dc, B))
    absx = jnp.where(edge_valid, jnp.abs(mvc), BIG)
    neg = edge_valid & (mvc <= 0.0)
    min1 = jnp.min(absx, axis=1)
    arg1 = jnp.argmin(absx, axis=1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, dc, 1), 1)
    is_arg = slot == arg1[:, None, :]
    min2 = jnp.min(jnp.where(is_arg, BIG, absx), axis=1)
    total_sign = (
        cn_parity_t.astype(jnp.int32) + jnp.sum(neg, axis=1).astype(jnp.int32)
    ) % 2
    sign_excl = total_sign[:, None, :] ^ neg.astype(jnp.int32)
    mag = jnp.where(is_arg, min2[:, None, :], min1[:, None, :])
    mc = alpha * jnp.where(sign_excl == 1, -mag, mag)
    return jnp.where(edge_valid, mc, 0.0)


def _col_sums_bm(garr, mc):
    """Per-variable sums of incoming check messages. mc [m, dc, B] -> [n, B]."""
    m, dc = garr["cn_vn"].shape
    n, dv = garr["vn_valid"].shape
    B = mc.shape[-1]
    flat = jnp.concatenate([mc.reshape(m * dc, B), jnp.zeros((1, B))], axis=0)
    mcv = jnp.take(flat, garr["vn_from_cn"], axis=0).reshape(n, dv, B)
    return jnp.sum(mcv, axis=1), mcv


def _scatter_vn_to_cn(garr, mvv, B):
    """[n, dv, B] VN-major messages -> [m, dc, B] CN-major."""
    n, dv = garr["vn_valid"].shape
    m, dc = garr["cn_vn"].shape
    flat = jnp.concatenate([mvv.reshape(n * dv, B), jnp.zeros((1, B))], axis=0)
    return jnp.take(flat, garr["cn_from_vn"], axis=0).reshape(m, dc, B)


def bp4_init_messages(gx_arr, gz_arr, llr_x, llr_y, llr_z, batch: int):
    """Initial messages to Hx (Z-component LLR) and Hz (X-component LLR).

    The reference initializes the Hz message with llrz in the denominator
    where llrx belongs (bp4_osd.pyx:437-438); for the depolarizing channels
    of every reference experiment llrx == llrz so the two agree — we use
    the symmetric (correct) form.
    """
    mx_val = log1pexp(-llr_x) - jnp.logaddexp(-llr_y, -llr_z)  # [n]
    mz_val = log1pexp(-llr_z) - jnp.logaddexp(-llr_x, -llr_y)

    def init(garr, val):
        pad = jnp.concatenate([val, jnp.zeros((1,))])
        per_edge = pad[garr["cn_vn"]]  # [m, dc]
        return jnp.broadcast_to(per_edge[:, :, None], (*per_edge.shape, batch))

    return init(gx_arr, mx_val), init(gz_arr, mz_val)


@partial(jax.jit, static_argnames=("num_iter", "alpha", "clip"))
def bp4_run(
    gx_arr,
    gz_arr,
    mvx,  # [mx, dcx, B] messages on Hx edges (batch-minor)
    mvz,
    llr_x,
    llr_y,
    llr_z,  # [n] channel LLRs
    synd_x,  # [B, mx]
    synd_z,  # [B, mz]
    vn_state,  # [B, n] int8: -1 undecided, else 0..3 Pauli index (x + 2z)
    cn_x,  # [B, mx] current parities (syndrome adjusted by decisions)
    cn_z,
    done,
    iters,
    *,
    num_iter: int,
    alpha: float = 1.0,
    clip: float = 50.0,
):
    """Run up to num_iter BP4 iterations with per-shot convergence freeze.

    Returns (mvx, mvz, lpr_x, lpr_y, lpr_z, err_x, err_z, done, iters);
    posteriors are [B, n].
    """
    n = gx_arr["vn_valid"].shape[0]
    B = synd_x.shape[0]
    sx_t = synd_x.astype(jnp.int32).T
    sz_t = synd_z.astype(jnp.int32).T
    cnx_t = cn_x.astype(jnp.int32).T
    cnz_t = cn_z.astype(jnp.int32).T
    vn_t = vn_state.T  # [n, B]
    undecided = vn_t == -1
    dec_x = jnp.where(undecided, 0, vn_t % 2).astype(jnp.int8)
    dec_z = jnp.where(undecided, 0, vn_t // 2).astype(jnp.int8)
    lx = llr_x[:, None]
    ly = llr_y[:, None]
    lz = llr_z[:, None]
    dvx = gx_arr["vn_valid"].shape[1]
    dvz = gz_arr["vn_valid"].shape[1]
    # decided VNs keep their init-value outgoing messages (VN-major consts)
    mx_val = log1pexp(-llr_x) - jnp.logaddexp(-llr_y, -llr_z)
    mz_val = log1pexp(-llr_z) - jnp.logaddexp(-llr_x, -llr_y)
    frozen_x = jnp.broadcast_to(mx_val[:, None, None], (n, dvx, B))
    frozen_z = jnp.broadcast_to(mz_val[:, None, None], (n, dvz, B))

    def synd_of(garr, err_t):
        pad = jnp.concatenate([err_t, jnp.zeros((1, B), err_t.dtype)], axis=0)
        bits = pad[garr["cn_vn"]] * garr["cn_valid"][:, :, None]
        return jnp.sum(bits.astype(jnp.int32), axis=1) % 2

    def cond(state):
        # cond reads only carried scalars; the all-done reduce happens in
        # the body (a vector reduce here forces a scalar-core SMEM DMA of
        # pred[B] per iteration, tools/profile_gdg_w4_step.py)
        i, *_, alldone = state
        return (i < num_iter) & ~alldone

    def body(state):
        (i, mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters, _ad) = state
        active = ~done

        mcx = _cn_minsum_bm(gx_arr, mvx, cnx_t, alpha=alpha, clip=clip)
        mcz = _cn_minsum_bm(gz_arr, mvz, cnz_t, alpha=alpha, clip=clip)

        sum_hx, mcx_v = _col_sums_bm(gx_arr, mcx)  # [n, B] and [n, dvx, B]
        sum_hz, mcz_v = _col_sums_bm(gz_arr, mcz)

        lprx_new = sum_hz + lx
        lprz_new = sum_hx + lz
        lpry_new = sum_hx + sum_hz + ly

        # hard decision (bp4_osd.pyx:560-573)
        all_pos = (lprx_new > 0) & (lpry_new > 0) & (lprz_new > 0)
        x_small = (lprx_new < lpry_new) & (lprx_new < lprz_new)
        z_small = lpry_new > lprz_new
        idx = jnp.where(
            all_pos, 0, jnp.where(x_small, 1, jnp.where(z_small, 2, 3))
        )
        ex_new = jnp.where(undecided, (idx % 2).astype(jnp.int8), dec_x)
        ez_new = jnp.where(undecided, (idx // 2).astype(jnp.int8), dec_z)

        # outgoing messages (extrinsic per edge)
        num_hx = log1pexp(-lprx_new)  # [n, B]
        llrz_ex = lprz_new[:, None, :] - mcx_v
        llry_ex = lpry_new[:, None, :] - mcx_v
        out_x = num_hx[:, None, :] - jnp.logaddexp(-llrz_ex, -llry_ex)
        num_hz = log1pexp(-lprz_new)
        llrx_ez = lprx_new[:, None, :] - mcz_v
        llry_ez = lpry_new[:, None, :] - mcz_v
        out_z = num_hz[:, None, :] - jnp.logaddexp(-llrx_ez, -llry_ez)
        # decided VNs keep frozen messages
        out_x = jnp.where(undecided[:, None, :], out_x, frozen_x)
        out_z = jnp.where(undecided[:, None, :], out_z, frozen_z)

        mvx_new = _scatter_vn_to_cn(gx_arr, out_x, B)
        mvz_new = _scatter_vn_to_cn(gz_arr, out_z, B)

        upd3 = active[None, None, :]
        upd2 = active[None, :]
        mvx = jnp.where(upd3, mvx_new, mvx)
        mvz = jnp.where(upd3, mvz_new, mvz)
        lprx = jnp.where(upd2, lprx_new, lprx)
        lpry = jnp.where(upd2, lpry_new, lpry)
        lprz = jnp.where(upd2, lprz_new, lprz)
        ex = jnp.where(upd2, ex_new, ex)
        ez = jnp.where(upd2, ez_new, ez)

        conv = jnp.all(synd_of(gx_arr, ez) == sx_t, axis=0) & jnp.all(
            synd_of(gz_arr, ex) == sz_t, axis=0
        )
        iters = iters + active.astype(jnp.int32)
        done = done | conv
        return (i + 1, mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters,
                jnp.all(done))

    zeros_n = jnp.zeros((n, B))
    state = (
        jnp.int32(0),
        mvx,
        mvz,
        zeros_n,
        zeros_n,
        zeros_n,
        jnp.zeros((n, B), jnp.int8),
        jnp.zeros((n, B), jnp.int8),
        done,
        iters,
        jnp.all(done),
    )
    (_, mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters, _ad) = (
        jax.lax.while_loop(cond, body, state)
    )
    return (
        mvx,
        mvz,
        lprx.T,
        lpry.T,
        lprz.T,
        ex.T,
        ez.T,
        done,
        iters,
    )
