"""Roofline accounting for the BP iteration kernel.

The reference's only hardware anchor is "200 iterations ≈ 2 ms" on an RTX
4090 (FAQ.md:44). Here we model the bytes a BP iteration must move given
the graph shapes and measure how close the compiled kernel gets to the
chip's HBM roofline — the quantity that says whether the next 2× is
available or the kernel is done.

Traffic model (per iteration, from ops/bp.py ``iteration``; masked=False
fast path, posterior gather route):

  slot-major edge array [dc, m_pad, B] in the message dtype, 4 passes:
    1. read  mv        (CN update input)
    2. write mc        (CN update output)
    3. read  mc        (mv_new = post_edge − mc)
    4. write mv_new
  VN-major gather of mc: n·dv·B message-dtype reads (the real edges)
  posterior [n, B]: one f32 write (accumulate) + one msg-dtype write
    (post_dec) + one read feeding the [dc, m_pad, B] post_edge gather
    (post_edge itself fuses into mv_new, no materialized pass)
  reductions (min1/min2/argmin/parity): ~4 arrays of [m_pad, B] ≤ 6
    bytes each — an order smaller, counted once

FLOP model: ~12 ops per padded edge slot (clip, abs, two mins, sign
bookkeeping, subtract) + ~4 per VN — BP is arithmetic-thin; the MXU is
idle in this kernel (no matmuls), so "MFU" here is VPU utilization
against the bf16 peak and is honestly tiny. The binding resource is HBM
bandwidth, and ``hbm_bw_frac`` is the number that matters.
"""

from __future__ import annotations

import time

# TPU v5e (v5 lite) public specs: 819 GB/s HBM BW, 197 bf16 TFLOP/s/chip.
HBM_BYTES_PER_S = {"v5e": 819e9, "v5p": 2765e9, "cpu": 100e9}
PEAK_FLOPS = {"v5e": 197e12, "v5p": 459e12, "cpu": 1e12}


def detect_chip() -> str:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    return "cpu"


def bp_iteration_model(graph, batch: int, msg_bytes: int) -> dict:
    """Deterministic bytes/FLOPs per BP iteration from the graph shapes."""
    dc, m_pad, n, dv = graph.dc, graph.m_pad, graph.n, graph.dv
    e_slots = dc * m_pad * batch
    e_real = n * dv * batch
    nb = n * batch
    bytes_moved = (
        4 * e_slots * msg_bytes  # four slot-major edge passes
        + e_real * msg_bytes  # VN gather of mc
        + nb * (4 + msg_bytes + msg_bytes)  # posterior acc + post_dec w/r
        + 4 * m_pad * batch * 6  # CN-side reduction temporaries
    )
    flops = 12 * e_slots + 4 * nb
    return {"bytes": float(bytes_moved), "flops": float(flops)}


def measure_bp_roofline(
    garr, graph, llr, synds, *, msg_dtype: str = "bfloat16",
    iters_lo: int = 24, iters_hi: int = 48,
) -> dict:
    """Measure per-iteration wall time by the two-point slope (separates
    call overhead) and report achieved HBM-bandwidth fraction and MFU."""
    import jax

    from ..ops.bp import decode_bp

    def run(num_iter):
        out = decode_bp(
            garr, llr, synds, num_iter=num_iter, masked=False,
            freeze_messages=False, history_mode="none", msg_dtype=msg_dtype,
        )
        jax.block_until_ready(out["error"])

    def timed(num_iter):
        run(num_iter)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(num_iter)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(iters_lo), timed(iters_hi)
    per_iter_s = max((t_hi - t_lo) / (iters_hi - iters_lo), 1e-9)
    batch = synds.shape[0]
    msg_bytes = 2 if msg_dtype == "bfloat16" else 4
    model = bp_iteration_model(graph, batch, msg_bytes)
    chip = detect_chip()
    bw = model["bytes"] / per_iter_s
    fl = model["flops"] / per_iter_s
    return {
        "chip": chip,
        "batch": batch,
        "msg_dtype": msg_dtype,
        "bp_iter_ms": round(per_iter_s * 1e3, 3),
        "modeled_bytes_per_iter": model["bytes"],
        "modeled_flops_per_iter": model["flops"],
        "achieved_gbytes_per_s": round(bw / 1e9, 1),
        "hbm_bw_frac": round(bw / HBM_BYTES_PER_S[chip], 3),
        "mfu": round(fl / PEAK_FLOPS[chip], 5),
        "roofline_headroom_x": round(HBM_BYTES_PER_S[chip] / bw, 2),
    }
