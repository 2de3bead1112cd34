"""Multi-host initialization and collective helpers.

The reference is single-process (SURVEY.md §2.4); here Monte-Carlo scales
over hosts via ``jax.distributed`` with shot-sharded meshes. All decode
state is shard-local — the only cross-host traffic is scalar count
reduction (psum over the shots axis) and the coordination heartbeat that
jax.distributed itself provides.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); single-process when absent.
    Returns {"process_id", "num_processes", "local_devices", "devices"}.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        num_processes = int(
            num_processes or os.environ.get("JAX_NUM_PROCESSES", "1")
        )
        process_id = int(process_id or os.environ.get("JAX_PROCESS_ID", "0"))
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": jax.local_devices(),
        "devices": jax.devices(),
    }


def host_shot_range(total_shots: int, process_id: int, num_processes: int):
    """Disjoint contiguous shot range for this host (remainder spread)."""
    base = total_shots // num_processes
    extra = total_shots % num_processes
    start = process_id * base + min(process_id, extra)
    count = base + (1 if process_id < extra else 0)
    return start, count


def host_seed(root_seed: int, process_id: int) -> np.random.Generator:
    """Independent per-host RNG stream (disjoint by construction)."""
    return np.random.default_rng(np.random.SeedSequence([root_seed, process_id]))


def global_sum(value: int | float) -> float:
    """Sum a host-local scalar across processes (psum over all devices)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return float(value)
    # contribute once per process by dividing by local device count
    x = jnp.full((jax.local_device_count(),),
                 value / jax.local_device_count(), jnp.float32)
    out = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    return float(np.asarray(out)[0])
