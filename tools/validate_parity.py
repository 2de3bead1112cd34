#!/usr/bin/env python
"""Golden-number parity runs against BASELINE.md rows.

Each config reproduces one reference notebook experiment at a shot count
sized for a 3-sigma two-proportion test, and prints ONE JSON line:

    python tools/validate_parity.py sw-shortened --shots 8192

Configs map 1:1 to BASELINE.md rows not yet covered by docs/PARITY.md.
Run on the TPU (sequentially — the chip is exclusive).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# campaign scripts append stdout to docs/parity_results.jsonl: the JSON
# verdict must be the ONLY stdout line. Harness verbose prints run under
# redirect_stdout(stderr) in main(); _verdict writes here.
_REAL_STDOUT = sys.stdout


def _verdict(name, fails, shots, ref_fails, ref_shots, seconds, extra=None):
    from slidingwindowdecoder_tpu.utils.metrics import rates_compatible

    ok = rates_compatible(fails, shots, ref_fails, ref_shots)
    out = {
        "config": name,
        "fails": int(fails),
        "shots": int(shots),
        "ler": fails / shots if shots else 0.0,
        "ref_fails": ref_fails,
        "ref_shots": ref_shots,
        "ref_ler": ref_fails / ref_shots,
        "z3_compatible": bool(ok),
        "seconds": round(seconds, 2),
        "shots_per_sec": round(shots / max(seconds, 1e-9), 1),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), file=_REAL_STDOUT, flush=True)
    return out


def run_sw(name, shots, seed, *, N, p, r, W, F, shorten=False, max_iter=200,
           z_basis=True, ref_fails=0, ref_shots=1):
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        sliding_window_decoder,
    )

    res = sliding_window_decoder(
        N=N, p=p, num_repeat=r, num_shots=shots, max_iter=max_iter, W=W, F=F,
        method=1, shorten=shorten, osd_method="osd_cs", osd_order=10,
        z_basis=z_basis, seed=seed, verbose=True,
    )
    return _verdict(name, res["num_failed"], shots, ref_fails, ref_shots,
                    res["decode_seconds"],
                    {"ler_per_round": res["ler_per_round"]})


def run_global(name, shots, seed, *, N, p, r, shorten=False, max_iter=200,
               ref_fails=0, ref_shots=1):
    from slidingwindowdecoder_tpu.harness.circuit_level import global_decoder

    res = global_decoder(
        N=N, p=p, num_repeat=r, num_shots=shots, max_iter=max_iter,
        shorten=shorten, osd_method="osd_cs", osd_order=10, seed=seed,
        verbose=True,
    )
    return _verdict(name, res["num_failed"], shots, ref_fails, ref_shots,
                    res["decode_seconds"],
                    {"ler_per_round": res["ler_per_round"]})


def run_gdg(name, shots, seed, *, N, p, r, W, F, max_iter=200,
            last_win_osd=False, low_error_mode=False, ref_fails=0,
            ref_shots=1, ref2=None, ensemble_bucket=None, gdg_kwargs=None):
    from slidingwindowdecoder_tpu.harness.circuit_level import sliding_window_gdg

    # Span-compacted ensemble everywhere: ~2.5x the fused throughput on
    # W=3 (tools/probe_gdg_perf.py: 521 vs 207 shots/s per window) and the
    # only full-speed mode that survives the W>=4 graphs' fused-loop
    # worker crash (docs/GDG_W4_CRASH.md).
    mode = os.environ.get("SWD_GDG_MODE", "spans")  # host_loop fallback
    if ensemble_bucket is None:
        ensemble_bucket = 64 if mode == "host_loop" else 512
    # chip-measured (tools/probe_gdg_perf.py): bf16 messages + bf16
    # history ring are ~30% faster at statistically equal LER (the z3
    # gate below validates each row); SWD_GDG_F32=1 restores f32
    dtype_kw = {} if os.environ.get("SWD_GDG_F32") else dict(
        msg_dtype="bfloat16", hist_dtype="bfloat16")
    if os.environ.get("SWD_GDG_CN"):
        dtype_kw["cn_engine"] = os.environ["SWD_GDG_CN"]
    res = sliding_window_gdg(
        N=N, p=p, num_repeat=r, num_shots=shots, max_iter=max_iter, W=W, F=F,
        last_win_osd=last_win_osd, low_error_mode=low_error_mode, seed=seed,
        ensemble_bucket=ensemble_bucket, ensemble_mode=mode, verbose=True,
        **dtype_kw,
        **(gdg_kwargs or {}),
    )
    extra = {"ler_per_round": res["ler_per_round"]}
    if last_win_osd and ref2 is not None:
        from slidingwindowdecoder_tpu.utils.metrics import rates_compatible

        lo = res["last_win_osd"]
        extra["last_win_osd_fails"] = lo["num_failed"]
        extra["last_win_osd_ler_per_round"] = lo["ler_per_round"]
        extra["last_win_osd_z3_compatible"] = rates_compatible(
            lo["num_failed"], shots, ref2[0], ref2[1]
        )
    return _verdict(name, res["num_failed"], shots, ref_fails, ref_shots,
                    res["decode_seconds"], extra)


def _make_code(N):
    from slidingwindowdecoder_tpu.codes import (
        bb_code_by_n,
        create_cyclic_permuting_matrix,
        create_QC_GHP_codes,
    )

    if N == 882:  # Misc.ipynb cell 10: [[882,24]] QC-GHP
        return create_QC_GHP_codes(
            63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
        )
    code, _, _ = bb_code_by_n(N)
    return code


def run_code_capacity(name, shots, seed, *, N, p, which, ref,
                      gdg_kwargs=None, bpgd_kwargs=None):
    """which: osd0 | osdcs | gdg | bpgd; ref: (fails, shots).

    Decoder parameterization matches the reference exactly: OSD uses
    ms_scaling_factor=osd_factor (0.625 for N>=288, simulation.py:44 and
    Data noise.ipynb cell 9 comment); GDG uses simulation.py:67-83
    (gdg_factor=0.625, tree depth 4, side depth 20, low_error_mode, pre-BP
    24 at ms 0.625, new_n=N); BPGD uses Misc.ipynb cell 10.
    """
    from slidingwindowdecoder_tpu.decoders import BPGD, BPOSD, GDG
    from slidingwindowdecoder_tpu.harness.device_campaign import (
        run_cc_campaign_device,
    )

    code = _make_code(N)
    priors = np.full(code.N, p)
    osd_factor = 0.5 if N <= 144 else 0.625
    if which == "osd0":
        dec = BPOSD(code.hx, priors, max_iter=100,
                    ms_scaling_factor=osd_factor, osd_method="osd_0")
    elif which == "osdcs":
        dec = BPOSD(code.hx, priors, max_iter=100,
                    ms_scaling_factor=osd_factor, osd_method="osd_cs",
                    osd_order=10)
    elif which == "gdg":
        kw = dict(
            max_iter=24, ms_scaling_factor=0.625, gdg_factor=0.625,
            max_iter_per_step=6, max_step=40, max_tree_depth=4,
            max_side_depth=20, max_tree_branch_step=30,
            max_side_branch_step=20, new_n=code.N, low_error_mode=True,
            # chip-measured: 17.1k shots/s at bucket 1024 vs 12.5k at 256
            # (tools/bench_cc_device.py, 1e6 shots, batch 65536)
            ensemble_bucket=1024, ensemble_mode="spans",
        )
        kw.update(gdg_kwargs or {})
        dec = GDG(code.hx, priors, **kw)
    else:  # bpgd (Misc.ipynb cell 10: no BP preprocessing)
        kw = dict(max_iter=0, max_iter_per_step=12, gd_factor=0.8,
                  max_step=code.N, new_n=code.N, bucket=256)
        kw.update(bpgd_kwargs or {})
        dec = BPGD(code.hx, priors, **kw)
    t0 = time.perf_counter()
    # device-resident campaign: sample/syndrome/decode/logical-check in one
    # jitted program per batch (harness/device_campaign.py) — the host
    # harness's numpy matmuls capped cc throughput near 30k shots/s
    res = run_cc_campaign_device(
        code, p, shots, dec, batch=min(65536, shots), seed=seed,
        verbose=True, name=name,
    )
    print(f"{name}: {res['num_err']}/{shots} logical errors "
          f"(LER {res['ler']:.3e}), {res['num_flagged']} flagged, "
          f"{res['shots_per_sec']:.1f} shots/s", file=sys.stderr, flush=True)
    return _verdict(name, res["num_err"], shots, ref[0], ref[1],
                    time.perf_counter() - t0)


def run_camel(name, shots, seed, *, ref):
    """Misc.ipynb cell 8: CAMEL on [[362,36,20]] cycle-assembled code,
    depolarizing p=0.02, BP4 ms=0.8, no OSD."""
    from slidingwindowdecoder_tpu.codes import create_cycle_assemble_codes
    from slidingwindowdecoder_tpu.harness.depolarizing import (
        depolarizing_decoding,
    )

    code = create_cycle_assemble_codes(19, 3)
    res = depolarizing_decoding(
        code, 0.02, shots, max_iter=50, ms_scaling_factor=0.8,
        osd_method="off", osd_order=0, camel=True, batch_size=1024,
        seed=seed, verbose=True,
    )
    return _verdict(name, res["num_err"], shots, ref[0], ref[1],
                    res["seconds"])


def run_shyps(name, shots, seed, *, window, ref_ler_round, ref_shots):
    """SHYPS.ipynb cells 2-3: r=3 simplex SHYPS, p=0.001, 4 rounds,
    BP+OSD-0 (max_iter=1000); window (W,F)=(3,1) vs global."""
    from slidingwindowdecoder_tpu.harness.shyps import decode_shyps

    res = decode_shyps(
        r=3, p=0.001, num_repeat=4, num_shots=shots, max_iter=1000,
        osd_order=0, window=window, W=3, F=1, seed=seed, verbose=True,
    )
    ref_fails = round((1 - (1 - ref_ler_round) ** 4) * ref_shots)
    # seconds = warmed decode only (harness/shyps.py warms the compiled
    # shapes first), matching the reference's decode-loop timing
    return _verdict(name, res["num_failed"], shots, ref_fails, ref_shots,
                    res["seconds"],
                    {"ler_per_round": res["ler_per_round"]})


def run_phenom(name, shots, seed, *, N, p, p_synd, which, ref):
    from slidingwindowdecoder_tpu.codes import bb_code_by_n
    from slidingwindowdecoder_tpu.decoders import BPOSD, GDG
    from slidingwindowdecoder_tpu.harness.phenomenological import (
        decode_phenomenological,
    )

    code, _, _ = bb_code_by_n(N)
    # Decoder parameterization matches Syndrome code.ipynb cell 1 exactly:
    # OSD ms=0.625; GDG gdg_factor=0.625, max_step=40, tree 4 / side 20,
    # branch steps 30/30, multi-thread low-error mode, pre-BP 8 at ms
    # 0.625, new_n=None (-> first 2m columns after ranking).
    if which == "osd":
        builders = {which: lambda pcm, pr: BPOSD(pcm, pr, max_iter=100,
                                                 ms_scaling_factor=0.625,
                                                 osd_method="osd_cs",
                                                 osd_order=10)}
    else:
        builders = {which: lambda pcm, pr: GDG(
            pcm, pr, max_iter=8, ms_scaling_factor=0.625, gdg_factor=0.625,
            max_iter_per_step=6, max_step=40, max_tree_depth=4,
            max_side_depth=20, max_side_branch_step=30,
            max_tree_branch_step=30, low_error_mode=True,
            ensemble_bucket=256)}
    res = decode_phenomenological(
        code, p, p_synd, shots, builders, batch_size=16384, seed=seed,
        verbose=True,
    )[which]
    # warmed decode-loop time only (harness compiles before its timers)
    return _verdict(name, res["num_err"], shots, ref[0], ref[1],
                    res["seconds"])


def run_bp4(name, shots, seed, *, p, osd_order, ref):
    # Misc.ipynb cell 2: the [[882, 24]] QC-GHP code under Depolarize(p)
    from slidingwindowdecoder_tpu.codes import (
        create_cyclic_permuting_matrix,
        create_QC_GHP_codes,
    )
    from slidingwindowdecoder_tpu.harness.depolarizing import (
        depolarizing_decoding,
    )

    code = create_QC_GHP_codes(
        63, create_cyclic_permuting_matrix(7, [27, 54, 0]), [0, 1, 6]
    )
    res = depolarizing_decoding(
        code, p, shots, max_iter=100, ms_scaling_factor=0.625,
        osd_method=("osd_cs" if osd_order else "osd_0"), osd_order=osd_order,
        seed=seed, verbose=True,
    )
    return _verdict(name, res["num_err"], shots, ref[0], ref[1],
                    res["seconds"])


CONFIGS = {
    # BASELINE row 3: shortened osd_window, LER/r 1.54e-3 (183/1e4)
    "sw-shortened": lambda shots, seed: run_sw(
        "sw-shortened", shots or 16384, seed, N=144, p=0.004, r=12, W=3, F=1,
        shorten=True, ref_fails=183, ref_shots=10000),
    # BASELINE row 5: W=4 / W=5 at p=0.004 (LER/r 1.10e-3 / 9.0e-4)
    "sw-w4": lambda shots, seed: run_sw(
        "sw-w4", shots or 16384, seed, N=144, p=0.004, r=12, W=4, F=1,
        ref_fails=round((1 - (1 - 1.10e-3) ** 12) * 10000), ref_shots=10000),
    "sw-w5": lambda shots, seed: run_sw(
        "sw-w5", shots or 16384, seed, N=144, p=0.004, r=12, W=5, F=1,
        ref_fails=round((1 - (1 - 9.0e-4) ** 12) * 10000), ref_shots=10000),
    # BASELINE row 7: [[288]] W=4 r=6 p=0.005 (LER/r 1.17e-3)
    "sw-288-w4": lambda shots, seed: run_sw(
        "sw-288-w4", shots or 16384, seed, N=288, p=0.005, r=6, W=4, F=1,
        ref_fails=70, ref_shots=10000),
    # BASELINE rows 8-9: global decode [[144]] p=0.004
    "global-144": lambda shots, seed: run_global(
        "global-144", shots or 16384, seed, N=144, p=0.004, r=12,
        ref_fails=76, ref_shots=10000),
    "global-144-shortened": lambda shots, seed: run_global(
        "global-144-shortened", shots or 16384, seed, N=144, p=0.004, r=12,
        shorten=True, ref_fails=90, ref_shots=10000),
    # BASELINE row 12: [[288]] (4,1) GDG p=0.005 (LER/r 2.0e-3, r=18).
    # SW GDG.ipynb cell f83f0070 p=0.005 line: max_iter=16, max_step=60,
    # tree 4 / side 20, side_branch_step 40 (and guessing.py:105 passes
    # max_tree_branch_step=max_side_branch_step), low_error_mode False.
    # 4096-shot default: the [[288]] W=4 ensemble state at 8192 shots
    # exceeds the chip (TPU worker crash, round 5)
    "gdg-288-41": lambda shots, seed: run_gdg(
        "gdg-288-41", shots or 4096, seed, N=288, p=0.005, r=18, W=4, F=1,
        max_iter=16,
        gdg_kwargs=dict(max_step=60, max_tree_depth=4, max_side_depth=20,
                        max_tree_branch_step=40, max_side_branch_step=40),
        ref_fails=round((1 - (1 - 2.0e-3) ** 18) * 5000), ref_shots=5000),
    # BASELINE row 13: [[144]] (5,2) GDG p=0.005 (LER/r 3.18e-3, r=12).
    # Cell d9a942ed: max_iter=8, max_step=40, tree 4 / side 20,
    # side_branch_step 20 (tree_branch_step likewise, guessing.py:105).
    "gdg-144-52": lambda shots, seed: run_gdg(
        "gdg-144-52", shots or 8192, seed, N=144, p=0.005, r=12, W=5, F=2,
        max_iter=8,
        gdg_kwargs=dict(max_step=40, max_tree_depth=4, max_side_depth=20,
                        max_tree_branch_step=20, max_side_branch_step=20),
        ref_fails=round((1 - (1 - 3.18e-3) ** 12) * 5000), ref_shots=5000),
    # BASELINE row 14: [[288]] W=4 r=6 p=0.005 GDG vs +last-window OSD.
    # Cell ccb3047b: same ensemble params as f83f0070's p=0.005 line.
    "gdg-last-osd": lambda shots, seed: run_gdg(
        "gdg-last-osd", shots or 4096, seed, N=288, p=0.005, r=6, W=4, F=1,
        max_iter=16, last_win_osd=True,
        gdg_kwargs=dict(max_step=60, max_tree_depth=4, max_side_depth=20,
                        max_tree_branch_step=40, max_side_branch_step=40),
        ref_fails=round((1 - (1 - 1.14e-3) ** 6) * 20000), ref_shots=20000,
        ref2=(round((1 - (1 - 7.10e-4) ** 6) * 20000), 20000)),
    # BASELINE row 6: [[144]] p=0.003 W=3/4/5 (LER/r 2.93e-4/1.33e-4/9.92e-5)
    "sw-p003-w3": lambda shots, seed: run_sw(
        "sw-p003-w3", shots or 32768, seed, N=144, p=0.003, r=12, W=3, F=1,
        ref_fails=round((1 - (1 - 2.93e-4) ** 12) * 100000), ref_shots=100000),
    "sw-p003-w4": lambda shots, seed: run_sw(
        "sw-p003-w4", shots or 32768, seed, N=144, p=0.003, r=12, W=4, F=1,
        ref_fails=round((1 - (1 - 1.33e-4) ** 12) * 100000), ref_shots=100000),
    "sw-p003-w5": lambda shots, seed: run_sw(
        "sw-p003-w5", shots or 32768, seed, N=144, p=0.003, r=12, W=5, F=1,
        ref_fails=round((1 - (1 - 9.92e-5) ** 12) * 100000), ref_shots=100000),
    # BASELINE row 8b: IBM global repro at p=0.003 (77/1e5)
    "global-144-p003": lambda shots, seed: run_global(
        "global-144-p003", shots or 65536, seed, N=144, p=0.003, r=12,
        ref_fails=77, ref_shots=100000),
    # BASELINE row 10: [[144]] SW GDG W=3 p=0.005 (LER/r 6.92e-3, pre-BP 8)
    "gdg-144-w3": lambda shots, seed: run_gdg(
        "gdg-144-w3", shots or 8192, seed, N=144, p=0.005, r=12, W=3, F=1,
        max_iter=8,
        ref_fails=round((1 - (1 - 6.92e-3) ** 12) * 5000), ref_shots=5000),
    # BASELINE row 15: code capacity [[288]] p=0.02
    "cc-osd0": lambda shots, seed: run_code_capacity(
        "cc-osd0", shots or 2_000_000, seed, N=288, p=0.02, which="osd0",
        ref=(121, 10_000_000)),
    "cc-osdcs": lambda shots, seed: run_code_capacity(
        "cc-osdcs", shots or 2_000_000, seed, N=288, p=0.02, which="osdcs",
        ref=(6, 10_000_000)),
    "cc-gdg": lambda shots, seed: run_code_capacity(
        "cc-gdg", shots or 2_000_000, seed, N=288, p=0.02, which="gdg",
        ref=(1, 10_000_000)),
    # BASELINE row 17 / Misc.ipynb cell 10: [[882,24]] p=0.04, 1e6 shots
    "cc882-bpgd-all": lambda shots, seed: run_code_capacity(
        "cc882-bpgd-all", shots or 250_000, seed, N=882, p=0.04, which="bpgd",
        ref=(34, 1_000_000)),
    "cc882-bpgd-partial": lambda shots, seed: run_code_capacity(
        "cc882-bpgd-partial", shots or 250_000, seed, N=882, p=0.04,
        which="bpgd", bpgd_kwargs=dict(max_step=100), ref=(551, 1_000_000)),
    "cc882-osd0": lambda shots, seed: run_code_capacity(
        "cc882-osd0", shots or 250_000, seed, N=882, p=0.04, which="osd0",
        ref=(26, 1_000_000)),
    "cc882-osdcs": lambda shots, seed: run_code_capacity(
        "cc882-osdcs", shots or 250_000, seed, N=882, p=0.04, which="osdcs",
        ref=(1, 1_000_000)),
    "cc882-gdg": lambda shots, seed: run_code_capacity(
        "cc882-gdg", shots or 250_000, seed, N=882, p=0.04, which="gdg",
        gdg_kwargs=dict(max_step=80, max_tree_branch_step=60,
                        max_iter_per_step=8, max_side_branch_step=60,
                        ensemble_bucket=32),
        ref=(20, 1_000_000)),
    # Misc.ipynb cell 8: CAMEL [[362,36,20]] depolarizing p=0.02 (26/1e5)
    "camel-362": lambda shots, seed: run_camel(
        "camel-362", shots or 32768, seed, ref=(26, 100_000)),
    # BASELINE row 19: SHYPS r=3, p=0.001, r=4 (SHYPS.ipynb cells 2-3):
    # window LER/r 2.13e-3 vs global 2.35e-3, BP+OSD-0, 2e4 shots each
    "shyps-window": lambda shots, seed: run_shyps(
        "shyps-window", shots or 16384, seed, window=True,
        ref_ler_round=2.13e-3, ref_shots=20000),
    "shyps-global": lambda shots, seed: run_shyps(
        "shyps-global", shots or 16384, seed, window=False,
        ref_ler_round=2.35e-3, ref_shots=20000),
    # x-basis [[144]] W=3 p=0.004 (build_circuit.py:6 z_basis=False):
    # no committed reference number; the BB [[144,12,12]] X/Z memories have
    # statistically equal LER (IBM paper Fig.3 shows one curve), so accept
    # against the z-basis row 1 count (254/1e4)
    "sw-xbasis": lambda shots, seed: run_sw(
        "sw-xbasis", shots or 16384, seed, N=144, p=0.004, r=12, W=3, F=1,
        z_basis=False, ref_fails=254, ref_shots=10000),
    # BASELINE row 16: phenomenological [[288]] p=0.03, p_synd=1e-3
    "phenom-osd": lambda shots, seed: run_phenom(
        "phenom-osd", shots or 65536, seed, N=288, p=0.03, p_synd=1e-3,
        which="osd", ref=(20200, 1_000_000)),
    "phenom-gdg": lambda shots, seed: run_phenom(
        "phenom-gdg", shots or 65536, seed, N=288, p=0.03, p_synd=1e-3,
        which="gdg", ref=(1360, 1_000_000)),
    # BASELINE row 17: BP4+OSD [[882,24]] depolarizing p=0.1
    "bp4-osd0": lambda shots, seed: run_bp4(
        "bp4-osd0", shots or 65536, seed, p=0.1, osd_order=0,
        ref=(77, 100_000)),
    "bp4-osdcs": lambda shots, seed: run_bp4(
        "bp4-osdcs", shots or 65536, seed, p=0.1, osd_order=10,
        ref=(22, 100_000)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=sorted(CONFIGS))
    ap.add_argument("--shots", type=int, default=None)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):  # axon sitecustomize ignores the env
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        CONFIGS[args.config](args.shots, args.seed)


if __name__ == "__main__":
    main()
