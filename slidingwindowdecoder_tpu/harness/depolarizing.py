"""Quaternary code-capacity harness (depolarizing noise, BP4+OSD).

Batched counterpart of the reference's Misc.ipynb experiments: iid
depolarizing noise on data qubits, joint (Hx, Hz) syndromes, BP4+OSD (or
CAMEL) decoding, per-component logical-error test.
"""

from __future__ import annotations

import time

import numpy as np

from ..codes.css import CSSCode
from ..decoders.bp4 import BP4OSD


def sample_depolarizing(N: int, p: float, shots: int, rng):
    """iid depolarizing: each qubit I/X/Y/Z with prob (1-p, p/3, p/3, p/3)."""
    r = rng.random((shots, N))
    which = (r < p) * (1 + (r * 3 / p).astype(np.int8) % 3)
    ex = ((which == 1) | (which == 2)).astype(np.uint8)
    ez = ((which == 2) | (which == 3)).astype(np.uint8)
    return ex, ez


def depolarizing_decoding(
    code: CSSCode,
    p: float,
    num_shots: int,
    *,
    max_iter: int = 100,
    ms_scaling_factor: float = 1.0,
    osd_method: str = "osd_cs",
    osd_order: int = 10,
    camel: bool = False,
    batch_size: int = 2048,
    seed: int | None = None,
    verbose: bool = True,
):
    """Monte-Carlo LER under depolarizing noise with BP4(+OSD | CAMEL)."""
    rng = np.random.default_rng(seed)
    probs = np.full(code.N, p / 3)
    dec = BP4OSD(
        code.hx,
        code.hz,
        channel_probs_x=probs,
        channel_probs_y=probs,
        channel_probs_z=probs,
        max_iter=max_iter,
        ms_scaling_factor=ms_scaling_factor,
        osd_method=osd_method,
        osd_order=osd_order,
    )
    hx_perp_T = code.hx_perp.T.astype(np.int64)
    hz_perp_T = code.hz_perp.T.astype(np.int64)

    num_err = num_flagged = shots_done = 0
    osd0_err = 0
    # warmup: compile the batch shape outside the timed region
    wb = min(batch_size, num_shots)
    warm_x = np.zeros((wb, code.hx.shape[0]), np.uint8)
    warm_z = np.zeros((wb, code.hz.shape[0]), np.uint8)
    if camel:
        dec.camel_decode(warm_x, warm_z)
    else:
        dec.decode_batch(warm_x, warm_z)
    t0 = time.perf_counter()
    remaining = num_shots
    while remaining > 0:
        b = min(batch_size, remaining)
        remaining -= b
        ex, ez = sample_depolarizing(code.N, p, b, rng)
        synd_x = (ez @ code.hx.T) % 2
        synd_z = (ex @ code.hz.T) % 2
        res = (
            dec.camel_decode(synd_x, synd_z)
            if camel
            else dec.decode_batch(synd_x, synd_z)
        )
        dx = (res.error[:, 0].astype(np.int64) + ex) % 2
        dz = (res.error[:, 1].astype(np.int64) + ez) % 2
        # a residual Z-component is a logical error iff it lies outside the
        # row space of hz, i.e. has overlap with ker(hz) = hz_perp (and
        # symmetrically for X); Misc.ipynb cell 2 (e_diff_z @ hz_perp.T)
        logical = ((dz @ hz_perp_T) % 2).any(axis=1) | (
            (dx @ hx_perp_T) % 2
        ).any(axis=1)
        num_err += int(logical.sum())
        num_flagged += int((~res.converged).sum())
        shots_done += b
    seconds = time.perf_counter() - t0
    result = {
        "num_err": num_err,
        "num_flagged": num_flagged,
        "shots": shots_done,
        "ler": num_err / max(1, shots_done),
        "seconds": seconds,
        "shots_per_sec": shots_done / max(seconds, 1e-9),
    }
    if verbose:
        print(
            f"BP4{'+CAMEL' if camel else '+OSD'}: {num_err}/{shots_done} logical "
            f"(LER {result['ler']:.3e}), {num_flagged} flagged, "
            f"{result['shots_per_sec']:.1f} shots/s"
        )
    return result
