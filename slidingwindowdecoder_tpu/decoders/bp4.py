"""Quaternary BP + per-basis OSD decoder (and CAMEL decimation).

Batched counterpart of the reference ``bp4_osd`` class (bp4_osd.pyx:6-685):
GF(4) BP over the joint (Hx, Hz) pair, and — for unconverged shots —
*separate* binary OSD per basis using the marginalized component
posteriors:

  basis x: solve  Hx e_z = synd_x,  columns ranked by
           log1pexp(-lpr_x) - logaddexp(-lpr_y, -lpr_z)   (:478-480)
  basis z: solve  Hz e_x = synd_z,  ranked symmetrically.

``camel_decode`` implements the CAMEL trick (:223-248): decimate the last
variable to each of I/X/Z/Y, BP each branch, keep the converged branch of
minimum path metric.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..graphs.tanner import compile_graph, graph_device_arrays
from ..ops.bp4 import bp4_init_messages, bp4_run
from ..ops.gf2_solve import (
    gf2_rank_packed,
    analyze_patterns,
    osd_candidate_patterns,
    osd_decode,
    pack_rows_host,
)
from .base import DecodeResult, pad_pow2


class BP4OSD:
    """Batched quaternary BP with per-basis OSD post-processing."""

    def __init__(
        self,
        Hx,
        Hz,
        *,
        channel_probs_x,
        channel_probs_y,
        channel_probs_z,
        max_iter: int = 32,
        ms_scaling_factor: float = 1.0,
        osd_method: str = "osd_0",
        osd_order: int = 0,
        clip: float = 50.0,
        osd_bucket: int = 512,
    ):
        Hx = np.asarray(Hx)
        Hz = np.asarray(Hz)
        if Hx.shape[1] != Hz.shape[1]:
            raise ValueError("Hx, Hz block length mismatch")
        self.mx, self.n = Hx.shape
        self.mz = Hz.shape[0]
        px = np.asarray(channel_probs_x, dtype=np.float64)
        py = np.asarray(channel_probs_y, dtype=np.float64)
        pz = np.asarray(channel_probs_z, dtype=np.float64)
        if not (px.shape == py.shape == pz.shape == (self.n,)):
            raise ValueError(f"channel prob vectors must have shape ({self.n},)")
        rest = 1.0 - px - py - pz
        if np.any(rest <= 0) or np.any(px <= 0) or np.any(py <= 0) or np.any(pz <= 0):
            raise ValueError("channel probabilities must be in (0,1) and sum < 1")
        self.llr_x = np.log(rest / px).astype(np.float32)
        self.llr_y = np.log(rest / py).astype(np.float32)
        self.llr_z = np.log(rest / pz).astype(np.float32)
        # collapsed binary priors per basis: Hx solves the Z-component
        # (flip prob pz + py), Hz the X-component (px + py)
        self.prior_llr_hx = np.log((1 - pz - py) / (pz + py)).astype(np.float32)
        self.prior_llr_hz = np.log((1 - px - py) / (px + py)).astype(np.float32)

        self.max_iter = int(max_iter)
        self.alpha = float(ms_scaling_factor)
        self.clip = float(clip)
        self.osd_bucket = int(osd_bucket)

        self.gx = compile_graph(Hx)
        self.gz = compile_graph(Hz)
        self.gx_arr = graph_device_arrays(self.gx)
        self.gz_arr = graph_device_arrays(self.gz)

        method = str(osd_method).lower()
        if method in ("osd_0", "osd0", "0"):
            method, osd_order = "osd_0", 0
        elif method in ("osd_e", "osde", "e", "1"):
            method = "osd_e"
        elif method in ("osd_cs", "osdcs", "cs", "2"):
            method = "osd_cs"
        elif method in ("off", "none", "-1"):
            method = None
        else:
            raise ValueError(f"unknown osd_method {osd_method!r}")
        self.osd_method = method
        self.osd_order = int(osd_order)
        if method is not None:
            self.rank_x = gf2_rank_packed(Hx)
            self.rank_z = gf2_rank_packed(Hz)
            self.kx = self.n - self.rank_x
            self.kz = self.n - self.rank_z
            if self.osd_order > min(self.kx, self.kz):
                raise ValueError(
                    f"osd_order must be <= {min(self.kx, self.kz)}"
                )
            self.Hx_words = jnp.asarray(pack_rows_host(Hx))
            self.Hz_words = jnp.asarray(pack_rows_host(Hz))
            self.pats_x = osd_candidate_patterns(self.kx, self.osd_order, method)
            self.pats_z = osd_candidate_patterns(self.kz, self.osd_order, method)
            self._meta_x = analyze_patterns(self.pats_x, self.kx)
            self._meta_z = analyze_patterns(self.pats_z, self.kz)

        self._llr_dev = tuple(
            jnp.asarray(v) for v in (self.llr_x, self.llr_y, self.llr_z)
        )

    # ------------------------------------------------------------------

    def _run_bp4(self, synds_x, synds_z, vn_state, cn_x, cn_z):
        B = synds_x.shape[0]
        lx, ly, lz = self._llr_dev
        mvx, mvz = bp4_init_messages(self.gx_arr, self.gz_arr, lx, ly, lz, B)
        done = jnp.zeros((B,), bool)
        iters = jnp.zeros((B,), jnp.int32)
        return bp4_run(
            self.gx_arr,
            self.gz_arr,
            mvx,
            mvz,
            lx,
            ly,
            lz,
            synds_x,
            synds_z,
            vn_state,
            cn_x,
            cn_z,
            done,
            iters,
            num_iter=self.max_iter,
            alpha=self.alpha,
            clip=self.clip,
        )

    def decode_batch(self, syndromes_x, syndromes_z) -> DecodeResult:
        """Decode; returns DecodeResult with error = [B, 2, n] (x, z)."""
        synds_x = np.atleast_2d(np.asarray(syndromes_x, dtype=np.uint8))
        synds_z = np.atleast_2d(np.asarray(syndromes_z, dtype=np.uint8))
        B = synds_x.shape[0]
        vn_state = jnp.full((B, self.n), -1, jnp.int8)
        sx = jnp.asarray(synds_x)
        sz = jnp.asarray(synds_z)
        (mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters) = self._run_bp4(
            sx, sz, vn_state, sx, sz
        )
        conv = np.asarray(done)
        err_x = np.asarray(ex).astype(np.uint8)
        err_z = np.asarray(ez).astype(np.uint8)

        todo = np.nonzero(~conv)[0]
        if self.osd_method is not None and len(todo):
            lprx_h = np.asarray(lprx)
            lpry_h = np.asarray(lpry)
            lprz_h = np.asarray(lprz)
            bucket = min(self.osd_bucket, pad_pow2(len(todo)))
            for lo in range(0, len(todo), bucket):
                chunk = todo[lo : lo + bucket]
                idx = np.full(bucket, int(chunk[0]), dtype=np.int64)
                idx[: len(chunk)] = chunk
                # basis x: Hx e_z = synd_x, ranked by Z-component posterior
                rel_x = (
                    np.logaddexp(0.0, -lprx_h[idx])
                    - np.logaddexp(-lpry_h[idx], -lprz_h[idx])
                ).astype(np.float32)
                out_x = osd_decode(
                    self.Hx_words,
                    jnp.asarray(synds_x[idx]),
                    jnp.asarray(rel_x),
                    jnp.asarray(self.prior_llr_hx),
                    self.pats_x,
                    m=self.mx,
                    n=self.n,
                    rank=self.rank_x,
                    k=self.kx,
                    meta=self._meta_x,
                )
                # basis z: Hz e_x = synd_z, ranked by X-component posterior
                rel_z = (
                    np.logaddexp(0.0, -lprz_h[idx])
                    - np.logaddexp(-lpry_h[idx], -lprx_h[idx])
                ).astype(np.float32)
                out_z = osd_decode(
                    self.Hz_words,
                    jnp.asarray(synds_z[idx]),
                    jnp.asarray(rel_z),
                    jnp.asarray(self.prior_llr_hz),
                    self.pats_z,
                    m=self.mz,
                    n=self.n,
                    rank=self.rank_z,
                    k=self.kz,
                    meta=self._meta_z,
                )
                err_z[chunk] = np.asarray(out_x["solution"])[: len(chunk)]
                err_x[chunk] = np.asarray(out_z["solution"])[: len(chunk)]

        error = np.stack([err_x, err_z], axis=1)  # [B, 2, n]
        min_pm = self._cal_pm(err_x, err_z)
        return DecodeResult(
            error=error,
            converged=conv,
            iterations=np.asarray(iters),
            min_pm=min_pm,
        )

    def _cal_pm(self, err_x, err_z):
        """Path metric over Pauli components (bp4_osd.pyx:250-259)."""
        both = (err_x == 1) & (err_z == 1)
        only_x = (err_x == 1) & ~both
        only_z = (err_z == 1) & ~both
        return (
            both * self.llr_y[None, :]
            + only_x * self.llr_x[None, :]
            + only_z * self.llr_z[None, :]
        ).sum(axis=1).astype(np.float32)

    def camel_decode(self, syndromes_x, syndromes_z) -> DecodeResult:
        """CAMEL: decimate the last VN to each Pauli, keep min-pm branch."""
        synds_x = np.atleast_2d(np.asarray(syndromes_x, dtype=np.uint8))
        synds_z = np.atleast_2d(np.asarray(syndromes_z, dtype=np.uint8))
        B = synds_x.shape[0]
        last = self.n - 1
        # adjacency of the last variable
        hx_adj = self.gx.vn_cn[last][self.gx.vn_valid[last]]
        hz_adj = self.gz.vn_cn[last][self.gz.vn_valid[last]]

        reps_x = np.repeat(synds_x, 4, axis=0)
        reps_z = np.repeat(synds_z, 4, axis=0)
        values = np.tile(np.arange(4, dtype=np.int8), B)
        vn_state = np.full((4 * B, self.n), -1, dtype=np.int8)
        vn_state[:, last] = values
        cn_x = reps_x.astype(np.int8).copy()
        cn_z = reps_z.astype(np.int8).copy()
        zcomp = values // 2
        xcomp = values % 2
        cn_x[:, hx_adj] ^= zcomp[:, None]
        cn_z[:, hz_adj] ^= xcomp[:, None]

        (mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters) = self._run_bp4(
            jnp.asarray(reps_x),
            jnp.asarray(reps_z),
            jnp.asarray(vn_state),
            jnp.asarray(cn_x),
            jnp.asarray(cn_z),
        )
        conv = np.asarray(done).reshape(B, 4)
        ex = np.asarray(ex).astype(np.uint8).reshape(B, 4, self.n)
        ez = np.asarray(ez).astype(np.uint8).reshape(B, 4, self.n)
        pm = self._cal_pm(
            ex.reshape(-1, self.n), ez.reshape(-1, self.n)
        ).reshape(B, 4)
        pm = np.where(conv, pm, 1e4)
        best = pm.argmin(axis=1)
        sel = np.arange(B)
        error = np.stack([ex[sel, best], ez[sel, best]], axis=1)
        return DecodeResult(
            error=error,
            converged=conv.any(axis=1),
            iterations=np.asarray(iters).reshape(B, 4).sum(axis=1),
            min_pm=pm[sel, best].astype(np.float32),
        )
