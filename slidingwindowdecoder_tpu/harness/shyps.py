"""SHYPS memory-experiment harness (global and sliding-window decoding).

Mirrors SHYPS.ipynb cell 1: build the r-parameter SHYPS subsystem code and
its gauge-measurement circuit, compile the DEM, and decode either globally
or with a (W, F) sliding window (full windows, method 0 — SHYPS windows
carry no virtual columns in the reference).
"""

from __future__ import annotations

import time

import numpy as np

from ..circuits.dem import compile_dem
from ..circuits.sampler import sample_dem_numpy
from ..circuits.shyps import build_shyps_circuit
from ..decoders.bposd import BPOSD
from ..windows.pipeline import (
    CachingDecoderFactory,
    decode_sliding_window,
    evaluate_logical_errors,
)
from ..windows.regions import build_sliding_window_plan


def decode_shyps(
    r: int = 3,
    p: float = 0.001,
    num_repeat: int = 4,
    num_shots: int = 20000,
    max_iter: int = 1000,
    osd_order: int = 0,
    *,
    window: bool = False,
    W: int = 3,
    F: int = 1,
    osd_method: str = "osd_cs",
    seed: int | None = None,
    verbose: bool = True,
):
    circuit, code = build_shyps_circuit(r, p, num_repeat)
    dem = compile_dem(circuit)
    num_det_round = r * (2**r - 1)
    rng = np.random.default_rng(seed)
    det, obs, _ = sample_dem_numpy(dem, num_shots, rng)
    if verbose:
        print(f"SHYPS r={r}: chk {dem.chk.shape}, detectors/round {num_det_round}")

    if not window:
        import jax
        import jax.numpy as jnp

        bpd = BPOSD(
            dem.chk,
            dem.priors,
            max_iter=max_iter,
            ms_scaling_factor=1.0,
            osd_method=osd_method,
            osd_order=osd_order,
        )
        det_dev = jnp.asarray(det)
        # warmup: compile every kernel shape before the timed decode (the
        # reference's timing is the decode loop only, SHYPS.ipynb cell 2)
        jax.block_until_ready(bpd.decode_batch_device(det_dev)["error"])
        t0 = time.perf_counter()
        out = bpd.decode_batch_device(det_dev)
        e_hat = out["error"]
        chk_t = jnp.asarray(dem.chk.T, jnp.float32)
        obs_t = jnp.asarray(dem.obs.T, jnp.float32)
        resid = (
            jnp.mod(jnp.dot(e_hat.astype(jnp.float32), chk_t), 2.0).astype(jnp.uint8)
            ^ jnp.asarray(det)
        ).any(axis=1)
        logical = (
            jnp.mod(jnp.dot(e_hat.astype(jnp.float32), obs_t), 2.0).astype(jnp.uint8)
            ^ jnp.asarray(obs)
        ).any(axis=1)
        num_failed = int(jnp.sum(resid | logical))
        num_flagged = int(jnp.sum(resid))
        seconds = time.perf_counter() - t0
    else:
        plan = build_sliding_window_plan(
            dem.chk, dem.obs, dem.priors, n_half=num_det_round, W=W, F=F, method=0
        )
        factory = CachingDecoderFactory(
            lambda spec: BPOSD(
                spec.mat,
                spec.prior,
                max_iter=max_iter,
                ms_scaling_factor=1.0,
                osd_method=osd_method,
                osd_order=osd_order,
            )
        )
        # warmup: compile the per-window programs outside the timed region
        decode_sliding_window(plan, det, factory, verbose=False)
        t0 = time.perf_counter()
        out = decode_sliding_window(plan, det, factory, verbose=verbose)
        seconds = time.perf_counter() - t0
        ev = evaluate_logical_errors(plan, det, obs, out["total_e_hat"])
        num_failed = ev["num_failed"]
        num_flagged = ev["num_flagged"]

    p_l = num_failed / num_shots
    result = {
        "r": r,
        "p": p,
        "num_shots": num_shots,
        "window": window,
        "num_flagged": num_flagged,
        "num_failed": num_failed,
        "ler": p_l,
        "ler_per_round": 1 - (1 - p_l) ** (1 / num_repeat),
        "seconds": seconds,
        "shots_per_sec": num_shots / seconds,
    }
    if verbose:
        print(
            f"SHYPS {'window' if window else 'global'}: {num_failed}/{num_shots} "
            f"failed, LER/r {result['ler_per_round']:.3e} ({seconds:.1f}s)"
        )
    return result
