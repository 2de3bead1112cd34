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
from .base import DecodeResult


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
        self._core_jit = None
        self._camel_jit = None

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

    def core(self, synds_x, synds_z):
        """Pure device-side decode: traceable under jit / shard_map, no
        host syncs. Unconverged shots are compacted to the front and the
        per-basis OSD runs over fixed-shape buckets (same scheme as
        BPOSD.core). Returns error [B, 2, n] (x, z)."""
        import jax

        from .bposd import _divisor_bucket

        B = synds_x.shape[0]
        sx = synds_x.astype(jnp.uint8)
        sz = synds_z.astype(jnp.uint8)
        vn_state = jnp.full((B, self.n), -1, jnp.int8)
        (mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters) = self._run_bp4(
            sx, sz, vn_state, sx, sz
        )
        err_x = ex.astype(jnp.uint8)
        err_z = ez.astype(jnp.uint8)

        if self.osd_method is not None:
            bucket = _divisor_bucket(B, self.osd_bucket)
            order = jnp.argsort(done.astype(jnp.int32), stable=True).astype(
                jnp.int32
            )
            n_todo = jnp.sum((~done).astype(jnp.int32))

            def body(carry):
                b, err_x, err_z = carry
                idx = jax.lax.dynamic_slice(order, (b * bucket,), (bucket,))
                take = lambda a: jnp.take(a, idx, axis=0)
                lprx_c, lpry_c, lprz_c = take(lprx), take(lpry), take(lprz)
                # basis x: Hx e_z = synd_x, ranked by Z-component posterior
                rel_x = (
                    jnp.logaddexp(0.0, -lprx_c)
                    - jnp.logaddexp(-lpry_c, -lprz_c)
                ).astype(jnp.float32)
                out_x = osd_decode(
                    self.Hx_words,
                    take(sx),
                    rel_x,
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
                    jnp.logaddexp(0.0, -lprz_c)
                    - jnp.logaddexp(-lpry_c, -lprx_c)
                ).astype(jnp.float32)
                out_z = osd_decode(
                    self.Hz_words,
                    take(sz),
                    rel_z,
                    jnp.asarray(self.prior_llr_hz),
                    self.pats_z,
                    m=self.mz,
                    n=self.n,
                    rank=self.rank_z,
                    k=self.kz,
                    meta=self._meta_z,
                )
                # boundary buckets may straddle converged shots: keep theirs
                done_c = take(done)
                ex_new = jnp.where(
                    done_c[:, None], take(err_x),
                    out_z["solution"].astype(jnp.uint8),
                )
                ez_new = jnp.where(
                    done_c[:, None], take(err_z),
                    out_x["solution"].astype(jnp.uint8),
                )
                return (
                    b + 1,
                    err_x.at[idx].set(ex_new),
                    err_z.at[idx].set(ez_new),
                )

            _, err_x, err_z = jax.lax.while_loop(
                lambda c: c[0] * bucket < n_todo,
                body,
                (jnp.int32(0), err_x, err_z),
            )

        error = jnp.stack([err_x, err_z], axis=1)  # [B, 2, n]
        min_pm = self._cal_pm(err_x, err_z)
        return {
            "error": error,
            "converged": done,
            "iterations": iters,
            "min_pm": min_pm,
        }

    def decode_batch_device(self, synds_x, synds_z):
        if self._core_jit is None:
            import jax

            self._core_jit = jax.jit(self.core)
        return self._core_jit(synds_x, synds_z)

    def decode_batch(self, syndromes_x, syndromes_z) -> DecodeResult:
        """Decode; returns DecodeResult with error = [B, 2, n] (x, z)."""
        synds_x = np.atleast_2d(np.asarray(syndromes_x, dtype=np.uint8))
        synds_z = np.atleast_2d(np.asarray(syndromes_z, dtype=np.uint8))
        out = self.decode_batch_device(
            jnp.asarray(synds_x), jnp.asarray(synds_z)
        )
        return DecodeResult(
            error=np.asarray(out["error"]),
            converged=np.asarray(out["converged"]),
            iterations=np.asarray(out["iterations"]),
            min_pm=np.asarray(out["min_pm"]),
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

    def camel_core(self, synds_x, synds_z):
        """CAMEL as a pure device program (jit/shard_map traceable):
        decimate the last VN to each Pauli (4 branch lanes per shot), BP4
        each, keep the converged branch of minimum path metric
        (bp4_osd.pyx:223-248)."""
        B = synds_x.shape[0]
        last = self.n - 1
        # adjacency of the last variable (static host metadata)
        hx_adj = self.gx.vn_cn[last][self.gx.vn_valid[last]]
        hz_adj = self.gz.vn_cn[last][self.gz.vn_valid[last]]

        sx = synds_x.astype(jnp.uint8)
        sz = synds_z.astype(jnp.uint8)
        reps_x = jnp.repeat(sx, 4, axis=0)
        reps_z = jnp.repeat(sz, 4, axis=0)
        values = jnp.tile(jnp.arange(4, dtype=jnp.int8), B)
        vn_state = jnp.full((4 * B, self.n), -1, jnp.int8)
        vn_state = vn_state.at[:, last].set(values)
        zcomp = (values // 2).astype(jnp.int8)
        xcomp = (values % 2).astype(jnp.int8)
        cn_x = reps_x.astype(jnp.int8)
        cn_z = reps_z.astype(jnp.int8)
        cn_x = cn_x.at[:, jnp.asarray(hx_adj)].set(
            cn_x[:, jnp.asarray(hx_adj)] ^ zcomp[:, None]
        )
        cn_z = cn_z.at[:, jnp.asarray(hz_adj)].set(
            cn_z[:, jnp.asarray(hz_adj)] ^ xcomp[:, None]
        )

        (mvx, mvz, lprx, lpry, lprz, ex, ez, done, iters) = self._run_bp4(
            reps_x, reps_z, vn_state, cn_x, cn_z
        )
        conv = done.reshape(B, 4)
        ex = ex.astype(jnp.uint8).reshape(B, 4, self.n)
        ez = ez.astype(jnp.uint8).reshape(B, 4, self.n)
        pm = self._cal_pm(
            ex.reshape(-1, self.n), ez.reshape(-1, self.n)
        ).reshape(B, 4)
        pm = jnp.where(conv, pm, 1e4)
        best = pm.argmin(axis=1)
        ex_b = jnp.take_along_axis(ex, best[:, None, None], axis=1)[:, 0]
        ez_b = jnp.take_along_axis(ez, best[:, None, None], axis=1)[:, 0]
        return {
            "error": jnp.stack([ex_b, ez_b], axis=1),
            "converged": conv.any(axis=1),
            "iterations": iters.reshape(B, 4).sum(axis=1),
            "min_pm": jnp.take_along_axis(pm, best[:, None], axis=1)[:, 0],
        }

    def camel_decode(self, syndromes_x, syndromes_z) -> DecodeResult:
        """CAMEL: decimate the last VN to each Pauli, keep min-pm branch."""
        synds_x = np.atleast_2d(np.asarray(syndromes_x, dtype=np.uint8))
        synds_z = np.atleast_2d(np.asarray(syndromes_z, dtype=np.uint8))
        if self._camel_jit is None:
            import jax

            self._camel_jit = jax.jit(self.camel_core)
        out = self._camel_jit(jnp.asarray(synds_x), jnp.asarray(synds_z))
        return DecodeResult(
            error=np.asarray(out["error"]),
            converged=np.asarray(out["converged"]),
            iterations=np.asarray(out["iterations"]),
            min_pm=np.asarray(out["min_pm"]).astype(np.float32),
        )
