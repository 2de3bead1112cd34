#!/usr/bin/env python
"""Op-level profile of one GDG spans-ensemble launch (W=3 window 5).

Captures a jax.profiler trace of a single ensemble launch and prints the
top HLO ops by self time (parsed from the xplane via
tensorboard_plugin_profile), so 'what actually bounds the step' is a
measurement, not a model.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shots", type=int, default=512)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--win", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from slidingwindowdecoder_tpu.utils.compile_cache import enable

    enable()
    from slidingwindowdecoder_tpu.circuits import sample_dem_numpy
    from slidingwindowdecoder_tpu.decoders.gdg import GDG
    from slidingwindowdecoder_tpu.harness.circuit_level import (
        build_bb_window_experiment,
    )

    code, circuit, dem, plan = build_bb_window_experiment(
        144, 0.005, 12, 3, 1, method=1
    )
    rng = np.random.default_rng(2024)
    det, obs, _ = sample_dem_numpy(dem, args.shots, rng)
    spec = plan.windows[args.win]
    synds = jnp.asarray(det[:, spec.row_start : spec.row_end], jnp.uint8)

    dec = GDG(np.asarray(spec.mat), np.asarray(spec.prior), max_iter=8,
              ensemble_bucket=args.bucket, ensemble_mode="spans",
              msg_dtype="bfloat16", hist_dtype="bfloat16")
    o = dec.decode_batch_device(synds)
    jax.block_until_ready(o["error"])
    log("warm; tracing one decode ...")

    tdir = tempfile.mkdtemp(prefix="gdgtrace_")
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        o = dec.decode_batch_device(synds)
        jax.block_until_ready(o["error"])
        log(f"traced decode: {time.perf_counter() - t0:.2f}s")

    xs = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    log(f"xplane files: {xs}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    from collections import defaultdict

    for path in xs:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            total = defaultdict(int)
            count = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_names.get(ev.metadata_id, "?")
                    total[nm] += ev.duration_ps
                    count[nm] += 1
            rows = sorted(total.items(), key=lambda kv: -kv[1])
            gtot = sum(total.values())
            print(f"== plane {plane.name}: {gtot/1e12*1e3:.1f} ms total "
                  f"(all lines; includes overlap)")
            for nm, ps in rows[: args.top]:
                print(f"{ps/1e9:10.3f} ms {count[nm]:>7}x  {nm[:100]}")


if __name__ == "__main__":
    main()
