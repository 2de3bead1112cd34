"""Circuit-level sliding-window Monte-Carlo driver.

The batched, TPU-hosted equivalent of the reference's
``sliding_window_decoder`` (osd.py:15-194 / guessing.py:19-237): build the
BB code + syndrome circuit, compile the DEM, extract the (W, F) window
plan, sample detector data, run the window pipeline with a batched decoder
per window, and report flagged / logical error rates per round.
"""

from __future__ import annotations

import time

import numpy as np

from ..codes import bb_code_by_n
from ..circuits import build_bb_memory_circuit, compile_dem, sample_dem_numpy
from ..decoders.bposd import BPOSD
from ..windows.pipeline import (
    CachingDecoderFactory,
    decode_sliding_window,
    evaluate_logical_errors,
)
from ..windows.regions import build_sliding_window_plan


def build_bb_window_experiment(
    N: int,
    p: float,
    num_repeat: int,
    W: int,
    F: int,
    *,
    method: int = 1,
    z_basis: bool = True,
):
    """Code + circuit + DEM + window plan for a BB memory experiment."""
    code, A_list, B_list = bb_code_by_n(N)
    circuit = build_bb_memory_circuit(
        code, A_list, B_list, p, num_repeat, z_basis=z_basis
    )
    dem = compile_dem(circuit)
    plan = build_sliding_window_plan(
        dem.chk,
        dem.obs,
        dem.priors,
        n_half=code.N // 2,
        W=W,
        F=F,
        method=method,
        z_basis=z_basis,
        code_n=code.N,
    )
    return code, circuit, dem, plan


def sliding_window_decoder(
    N: int = 144,
    p: float = 0.003,
    num_repeat: int = 12,
    num_shots: int = 10000,
    max_iter: int = 200,
    W: int = 3,
    F: int = 1,
    *,
    z_basis: bool = True,
    method: int = 1,
    osd_method: str = "osd_cs",
    osd_order: int = 10,
    ms_scaling_factor: float = 1.0,
    decoder_factory=None,
    seed: int | None = None,
    verbose: bool = True,
):
    """End-to-end LER measurement; mirrors osd.py:15 defaults and outputs.

    Returns a result dict with LER, LER-per-round, counts, and timing.
    """
    code, circuit, dem, plan = build_bb_window_experiment(
        N, p, num_repeat, W, F, method=method, z_basis=z_basis
    )

    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    det_raw, obs_raw, _ = sample_dem_numpy(dem, num_shots, rng)
    sample_seconds = time.perf_counter() - t0
    if verbose:
        print(f"sampled {num_shots} shots in {sample_seconds:.2f}s")

    # the plan's columns are a permutation of DEM columns; detector rows are
    # untouched, so det/obs samples feed straight in
    if decoder_factory is None:
        decoder_factory = CachingDecoderFactory(
            lambda spec: BPOSD(
                spec.mat,
                spec.prior,
                max_iter=max_iter,
                ms_scaling_factor=ms_scaling_factor,
                osd_method=osd_method,
                osd_order=osd_order,
            )
        )

    t0 = time.perf_counter()
    out = decode_sliding_window(plan, det_raw, decoder_factory, verbose=verbose)
    decode_seconds = time.perf_counter() - t0

    ev = evaluate_logical_errors(plan, det_raw, obs_raw, out["total_e_hat"])
    p_l = ev["num_failed"] / num_shots
    p_l_per_round = 1 - (1 - p_l) ** (1 / num_repeat)
    result = {
        "N": N,
        "p": p,
        "num_repeat": num_repeat,
        "num_shots": num_shots,
        "W": W,
        "F": F,
        "num_windows": plan.num_windows,
        "num_flagged": ev["num_flagged"],
        "num_failed": ev["num_failed"],
        "ler": p_l,
        "ler_per_round": p_l_per_round,
        "window_flagged": out["window_flagged"],
        "sample_seconds": sample_seconds,
        "decode_seconds": decode_seconds,
        "shots_per_sec": num_shots / decode_seconds,
    }
    if verbose:
        print(f"Overall Flagged Errors: {ev['num_flagged']}/{num_shots}")
        print(f"Logical Errors: {ev['num_failed']}/{num_shots}")
        print(f"logical error per round: {p_l_per_round:.3e}")
        print(
            f"decode: {decode_seconds:.2f}s ({result['shots_per_sec']:.1f} shots/s)"
        )
    return result
