"""Child process for the 2-process jax.distributed smoke test.

Spawned by tests/test_parallel.py::test_two_process_distributed (not a
test itself). Each process initializes the distributed runtime from env
vars, decodes its disjoint shot range locally (shot sharding over hosts,
SURVEY.md §2.4 P1/P6), and reduces the failure count with ``global_sum``.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    sys.path.insert(0, ".")
    from slidingwindowdecoder_tpu.codes import bb_code_by_n
    from slidingwindowdecoder_tpu.decoders import BPOSD
    from slidingwindowdecoder_tpu.parallel.distributed import (
        global_sum,
        host_seed,
        host_shot_range,
        initialize_distributed,
    )

    info = initialize_distributed()  # env-driven (coordinator, nproc, pid)
    pid, nproc = info["process_id"], info["num_processes"]

    code, _, _ = bb_code_by_n(72)
    total_shots = 96
    start, count = host_shot_range(total_shots, pid, nproc)
    rng = host_seed(123, pid)
    p = 0.05
    errs = (rng.random((count, code.N)) < p).astype(np.uint8)
    synds = ((errs @ code.hx.T) % 2).astype(np.uint8)

    dec = BPOSD(code.hx, np.full(code.N, p), max_iter=16, osd_method="osd_0")
    res = dec.decode_batch(synds)
    resid = (res.error.astype(int) @ code.hx.T + synds) % 2
    local_failed = int(resid.any(axis=1).sum())
    total_failed = global_sum(local_failed)
    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": nproc,
                "devices": len(info["devices"]),
                "start": start,
                "count": count,
                "local_failed": local_failed,
                "global_failed": total_failed,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
