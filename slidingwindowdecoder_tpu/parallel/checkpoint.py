"""Accumulation checkpoints for long Monte-Carlo sweeps.

The reference loses all progress on interruption (10^7-shot sweeps take
hours, Data noise.ipynb cell 9). Here each host periodically persists
{shots_done, error counts, RNG state} atomically and can resume; a lost
host's shot range can simply be re-run because per-host streams are
disjoint (parallel.distributed.host_seed).
"""

from __future__ import annotations

import json
import os
import tempfile


class MonteCarloCheckpoint:
    def __init__(self, path: str, process_id: int = 0):
        self.path = path
        self.process_id = process_id
        self._file = os.path.join(path, f"mc_host{process_id}.json")

    def load(self) -> dict | None:
        """Resume state, or None when starting fresh."""
        try:
            with open(self._file) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def save(self, state: dict) -> None:
        """Atomic write (tmp + rename) of the accumulation state."""
        os.makedirs(self.path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self._file)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def clear(self) -> None:
        if os.path.exists(self._file):
            os.unlink(self._file)


def run_checkpointed(
    total_shots: int,
    batch_size: int,
    run_batch,
    checkpoint: MonteCarloCheckpoint,
    *,
    checkpoint_every: int = 10,
):
    """Drive ``run_batch(batch_index, shots) -> dict(counts)`` to completion.

    Accumulates integer counters returned by each batch; persists every
    ``checkpoint_every`` batches; resumes from the saved batch index.
    """
    state = checkpoint.load() or {"batch_index": 0, "counts": {}, "shots_done": 0}
    batch_index = state["batch_index"]
    counts: dict = dict(state["counts"])
    shots_done = state["shots_done"]

    num_batches = -(-total_shots // batch_size)
    while batch_index < num_batches:
        shots = min(batch_size, total_shots - batch_index * batch_size)
        result = run_batch(batch_index, shots)
        for key, val in result.items():
            counts[key] = counts.get(key, 0) + int(val)
        shots_done += shots
        batch_index += 1
        if batch_index % checkpoint_every == 0 or batch_index == num_batches:
            checkpoint.save(
                {
                    "batch_index": batch_index,
                    "counts": counts,
                    "shots_done": shots_done,
                }
            )
    return {"counts": counts, "shots_done": shots_done}
