"""Code-capacity Monte-Carlo harness.

Batched counterpart of the reference's ``data_qubit_noise_decoding``
(src/simulation.py:10-99): sample iid data-qubit flips, decode from the
syndrome, count logical errors via the hz-perp test. Decoders are
batched-first; any object exposing ``decode_batch(syndromes) ->
DecodeResult`` plugs in (the reference's ``extra_decoders`` hook).
"""

from __future__ import annotations

import time

import numpy as np

from ..codes.css import CSSCode


def data_qubit_noise_decoding(
    code: CSSCode,
    p: float,
    num_shots: int,
    decoders: dict,
    *,
    batch_size: int = 4096,
    seed: int | None = None,
    verbose: bool = True,
):
    """Monte-Carlo LER estimate under iid X noise, decoding hx syndromes.

    Returns {decoder_name: {"num_err", "num_flagged", "shots", "ler",
    "seconds", "shots_per_sec"}}.
    """
    rng = np.random.default_rng(seed)
    results = {
        name: {"num_err": 0, "num_flagged": 0, "shots": 0, "seconds": 0.0}
        for name in decoders
    }
    hxT = code.hx.T.astype(np.uint8)
    hz_perp_T = code.hz_perp.T.astype(np.int64)

    # warmup: compile each decoder's batch shape outside the timers
    warm = np.zeros((min(batch_size, num_shots), code.hx.shape[0]), np.uint8)
    for dec in decoders.values():
        dec.decode_batch(warm)

    remaining = num_shots
    while remaining > 0:
        b = min(batch_size, remaining)
        remaining -= b
        err = (rng.random((b, code.N)) < p).astype(np.uint8)
        syndrome = (err @ hxT) % 2
        for name, dec in decoders.items():
            t0 = time.perf_counter()
            res = dec.decode_batch(syndrome)
            e_diff = (res.error.astype(np.int64) + err) % 2
            logical = ((e_diff @ hz_perp_T) % 2).any(axis=1)
            results[name]["num_err"] += int(logical.sum())
            results[name]["num_flagged"] += int((~res.converged).sum())
            results[name]["shots"] += b
            results[name]["seconds"] += time.perf_counter() - t0

    for name, r in results.items():
        r["ler"] = r["num_err"] / max(1, r["shots"])
        r["shots_per_sec"] = r["shots"] / max(1e-9, r["seconds"])
        if verbose:
            print(
                f"{name}: {r['num_err']}/{r['shots']} logical errors "
                f"(LER {r['ler']:.3e}), {r['num_flagged']} flagged, "
                f"{r['shots_per_sec']:.1f} shots/s"
            )
    return results
