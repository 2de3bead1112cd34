"""Fully device-resident code-capacity Monte-Carlo campaigns.

The batched host harness (``harness.code_capacity``) times three host-side
stages per batch that the reference pays too (simulation.py:15-26): numpy
error sampling, the uint8 ``err @ hx.T`` syndrome matmul, and the int64
``e_diff @ hz_perp.T`` logical test — at [[288]] scale those matmuls cost
more than the decode itself and cap the pipeline near 30k shots/s no
matter how fast the decoder is.

Here the whole batch step is ONE jitted device program: sample errors with
the JAX PRNG (counter-based, pure in (root_seed, process_id,
batch_index) — the same derivation contract as ``parallel.checkpoint``),
form syndromes and logical checks as MXU matmuls (bf16 inputs, f32
accumulation: exact for 0/1 counts far below 2^24), run ``decoder.core``
inline, and return two scalar counters. Host traffic per batch is ~8
bytes.

Sampling through the JAX PRNG instead of numpy is statistically
equivalent (acceptance is binomial-CI based, SURVEY.md §4); bit-exact
resume still holds because the key is derived per batch, never carried.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.css import CSSCode


def _mod2_matmul(x_bits, wT_bf16):
    """[B, n] 0/1 (bool/int) @ [n, k] 0/1 -> [B, k] uint8, mod 2.

    bf16 operands on the MXU with f32 accumulation: every partial sum is
    an exact small integer (max n terms of 0/1), so the mod-2 readout is
    exact.
    """
    acc = jnp.dot(
        x_bits.astype(jnp.bfloat16), wT_bf16,
        preferred_element_type=jnp.float32,
    )
    return (acc % 2).astype(jnp.uint8)


def make_cc_step(code: CSSCode, p: float, decoder, batch: int, *, seed: int,
                 process_id: int = 0):
    """Build the jitted per-batch step for an iid-X code-capacity campaign.

    ``decoder`` must expose a traceable ``core(synds) -> dict`` (BPOSD,
    GDG, BPGD all do). Returns ``step(batch_index, valid_count) ->
    (failed, flagged)`` as int32 scalars; shots past ``valid_count`` are
    sampled and decoded (static shapes) but excluded from the counts.
    """
    hxT = jnp.asarray(code.hx.T.astype(np.int8), jnp.bfloat16)
    hz_perp_T = jnp.asarray(code.hz_perp.T.astype(np.int8), jnp.bfloat16)
    n = code.N
    root = jax.random.PRNGKey(seed)
    root = jax.random.fold_in(root, process_id)

    @jax.jit
    def step(batch_index, valid_count):
        key = jax.random.fold_in(root, batch_index)
        err = jax.random.bernoulli(key, p, (batch, n))
        synds = _mod2_matmul(err, hxT)
        out = decoder.core(synds)
        e_diff = err ^ (out["error"] == 1)
        logical = jnp.any(_mod2_matmul(e_diff, hz_perp_T) == 1, axis=1)
        valid = jnp.arange(batch) < valid_count
        failed = jnp.sum(logical & valid, dtype=jnp.int32)
        flagged = jnp.sum(~out["converged"] & valid, dtype=jnp.int32)
        return failed, flagged

    return step


def run_cc_campaign_device(
    code: CSSCode,
    p: float,
    num_shots: int,
    decoder,
    *,
    batch: int = 65536,
    seed: int = 0,
    checkpoint=None,
    checkpoint_every: int = 10,
    verbose: bool = False,
    name: str = "cc",
    warmup: bool = True,
):
    """Run a code-capacity campaign entirely on device.

    With ``checkpoint`` (a ``MonteCarloCheckpoint``) the run is
    interruptible/resumable under the standard derivation contract.
    Returns the harness-standard result dict; ``seconds`` covers the
    warmed campaign only (compile excluded, matching the reference's
    decode-loop timing) unless ``warmup=False``.
    """
    step = make_cc_step(code, p, decoder, batch, seed=seed,
                        process_id=checkpoint.process_id if checkpoint else 0)
    if warmup:
        # compile outside the timed region: same shapes, zero valid shots
        f, _ = step(jnp.int32(2**30), jnp.int32(0))
        jax.block_until_ready(f)

    def run_batch(idx, shots, rng=None):
        failed, flagged = step(jnp.int32(idx), jnp.int32(shots))
        failed = int(failed)
        if verbose and idx % 20 == 0:
            print(f"{name} batch {idx}: +{failed} fails", flush=True)
        return {"failed": failed, "flagged": int(flagged), "shots": shots}

    t0 = time.perf_counter()
    if checkpoint is not None:
        from ..parallel.checkpoint import run_checkpointed

        out = run_checkpointed(
            num_shots, batch, run_batch, checkpoint,
            checkpoint_every=checkpoint_every, root_seed=seed,
        )
        counts = out["counts"]
    else:
        counts = {"failed": 0, "flagged": 0, "shots": 0}
        num_batches = -(-num_shots // batch)
        for idx in range(num_batches):
            shots = min(batch, num_shots - idx * batch)
            for k, v in run_batch(idx, shots).items():
                counts[k] += v
    dt = time.perf_counter() - t0
    shots = counts["shots"]
    return {
        "num_err": counts["failed"],
        "num_flagged": counts["flagged"],
        "shots": shots,
        "ler": counts["failed"] / max(1, shots),
        "seconds": dt,
        "shots_per_sec": shots / max(dt, 1e-9),
    }
