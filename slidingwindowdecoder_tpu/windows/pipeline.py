"""Batched sliding-window decode pipeline.

Executes the (W, F) window loop of the reference driver (osd.py:130-194)
over a whole batch of shots at once: decode window i from the current
corrected detector data, commit the first F rounds' faults, subtract the
committed syndrome contribution from all detectors, slide forward. The
per-window decoders are batched device decoders (BPOSD / GDG / shortened
OSD); the commit-feedback update runs as one GF(2) mat-mul on device.
"""

from __future__ import annotations

import time

import numpy as np

from .regions import SlidingWindowPlan


def _gf2_matmul_device(a_u8: np.ndarray, b_u8: np.ndarray) -> np.ndarray:
    """(a @ b) % 2 on the accelerator (f32 MXU; exact for these sizes)."""
    import jax.numpy as jnp

    out = jnp.dot(
        jnp.asarray(a_u8, jnp.float32),
        jnp.asarray(b_u8, jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return np.asarray(jnp.mod(out, 2.0).astype(jnp.uint8))


def decode_sliding_window(
    plan: SlidingWindowPlan,
    det_data: np.ndarray,
    decoder_factory,
    *,
    verbose: bool = True,
    collect_window_stats: bool = True,
):
    """Run the full window pipeline over a batch of detector samples.

    Args:
      plan: static window plan (windows, regrouped chk/obs/priors).
      det_data: [S, num_detectors] sampled detector bits (already in the
        plan's detector-row order — regrouping permutes columns only).
      decoder_factory: ``spec -> decoder`` returning an object with
        ``decode_batch(syndromes) -> DecodeResult``; called once per window
        (cache inside the factory to reuse compilations across same-shape
        windows).

    Returns dict with total_e_hat [S, C], per-window flagged counts, and
    timing.
    """
    det_data = np.asarray(det_data, dtype=np.uint8)
    S = det_data.shape[0]
    num_col = plan.chk.shape[1]
    total_e_hat = np.zeros((S, num_col), dtype=np.uint8)
    new_det = det_data.copy()
    window_flagged: list[int] = []
    window_seconds: list[float] = []

    for spec in plan.windows:
        t0 = time.perf_counter()
        decoder = decoder_factory(spec)
        synd = new_det[:, spec.row_start : spec.row_end]
        res = decoder.decode_batch(synd)
        e_hat = res.error

        if collect_window_stats:
            resid = (
                _gf2_matmul_device(e_hat, spec.mat.T.astype(np.uint8)) ^ synd
            ).any(axis=1)
            window_flagged.append(int(resid.sum()))

        if spec.is_last:
            total_e_hat[:, spec.col_start : spec.col_end] = e_hat
        else:
            ncommit = spec.commit_col_end - spec.col_start
            total_e_hat[:, spec.col_start : spec.commit_col_end] = e_hat[:, :ncommit]

        # feedback: subtract all committed corrections from the raw detectors
        corr = _gf2_matmul_device(total_e_hat, plan.chk.T)
        new_det = det_data ^ corr
        dt = time.perf_counter() - t0
        window_seconds.append(dt)
        if verbose:
            flagged = window_flagged[-1] if collect_window_stats else -1
            print(f"Window {spec.index}: flagged {flagged}/{S} ({dt:.2f}s)")

    return {
        "total_e_hat": total_e_hat,
        "corrected_det": new_det,
        "window_flagged": window_flagged,
        "window_seconds": window_seconds,
    }


def evaluate_logical_errors(plan: SlidingWindowPlan, det_data, obs_data, total_e_hat):
    """Final accounting, matching osd.py:184-189: a shot fails if its global
    residual syndrome is nonzero (flagged) OR any observable is flipped."""
    det_data = np.asarray(det_data, dtype=np.uint8)
    obs_data = np.asarray(obs_data, dtype=np.uint8)
    resid = _gf2_matmul_device(total_e_hat, plan.chk.T) ^ det_data
    flagged = resid.any(axis=1)
    obs_hat = _gf2_matmul_device(total_e_hat, plan.obs.T)
    logical = (obs_hat ^ obs_data).any(axis=1)
    failed = flagged | logical
    return {
        "flagged": flagged,
        "logical": logical,
        "failed": failed,
        "num_flagged": int(flagged.sum()),
        "num_failed": int(failed.sum()),
    }


class CachingDecoderFactory:
    """Build one decoder per distinct window signature, reuse across windows.

    Window matrices recur (all interior windows share structure), so keying
    on the matrix bytes + prior bytes avoids both rebuild and recompile.
    """

    def __init__(self, build):
        self._build = build
        self._cache: dict = {}

    def __call__(self, spec):
        key = (
            spec.mat.shape,
            hash(spec.mat.tobytes()),
            hash(spec.prior.tobytes()),
        )
        if key not in self._cache:
            self._cache[key] = self._build(spec)
        return self._cache[key]
