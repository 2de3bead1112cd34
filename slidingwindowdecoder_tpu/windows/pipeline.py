"""Batched sliding-window decode pipeline (device resident).

Executes the (W, F) window loop of the reference driver (osd.py:130-194)
over a whole batch of shots at once: decode window i from the current
corrected detector data, commit the first F rounds' faults, subtract the
committed syndrome contribution from all detectors, slide forward.

All shot-sized state (detector data, accumulated corrections) lives on the
device for the entire loop; the commit is a static-slice scatter and the
feedback is one GF(2) mat-mul on the MXU per window. Only scalar counters
return to the host.
"""

from __future__ import annotations

import time

import numpy as np


def _as_device_u8(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.uint8)


def _gf2_matmul(a, b_f32):
    """(a @ b) % 2 on device; ``b_f32`` pre-converted [K, R] float32."""
    import jax.numpy as jnp

    out = jnp.dot(a.astype(jnp.float32), b_f32, preferred_element_type=jnp.float32)
    return jnp.mod(out, 2.0).astype(jnp.uint8)


def decode_sliding_window(
    plan,
    det_data,
    decoder_factory,
    *,
    verbose: bool = True,
    collect_window_stats: bool = True,
    sync_per_window: bool = False,
):
    """Run the full window pipeline over a batch of detector samples.

    Args:
      plan: static window plan (windows, regrouped chk/obs/priors).
      det_data: [S, num_detectors] detector bits (numpy or device array).
      decoder_factory: ``spec -> decoder`` with either a device-level
        ``decode_batch_device(synds)`` or a host ``decode_batch``.
      sync_per_window: block on each window's result so ``window_seconds``
        measures real per-window wall time (tail-latency methodology of
        reference FAQ.md:42, batched form) and collect per-window
        non-converged counts; off by default (it serializes the stream).

    Returns dict with total_e_hat [S, C] (device), per-window flagged
    counts, per-window non-converged counts (sync mode), and timing.
    """
    import jax
    import jax.numpy as jnp

    det = _as_device_u8(det_data)
    S = det.shape[0]
    num_col = plan.chk.shape[1]
    chk_t_f32 = jnp.asarray(plan.chk.T, jnp.float32)  # [C, R]
    total_e_hat = jnp.zeros((S, num_col), jnp.uint8)
    new_det = det
    window_flagged: list[int] = []
    window_seconds: list[float] = []
    window_nonconverged: list[int] = []

    for spec in plan.windows:
        t0 = time.perf_counter()
        decoder = decoder_factory(spec)
        synd = new_det[:, spec.row_start : spec.row_end]
        if hasattr(decoder, "decode_batch_device"):
            out = decoder.decode_batch_device(synd)
            e_hat = out["error"]
            if sync_per_window:
                jax.block_until_ready(e_hat)
                window_nonconverged.append(int(jnp.sum(~out["converged"])))
        else:  # host-level decoder (e.g. experimental plug-ins)
            res = decoder.decode_batch(np.asarray(synd))
            e_hat = _as_device_u8(res.error)
            if sync_per_window:
                window_nonconverged.append(int((~res.converged).sum()))

        if collect_window_stats:
            mat_t = jnp.asarray(spec.mat.T, jnp.float32)
            resid = (_gf2_matmul(e_hat, mat_t) ^ synd).any(axis=1)
            window_flagged.append(int(jnp.sum(resid)))

        if spec.is_last:
            ncommit = spec.col_end - spec.col_start
            committed = e_hat[:, :ncommit]
            total_e_hat = total_e_hat.at[:, spec.col_start : spec.col_end].set(
                committed
            )
        else:
            ncommit = spec.commit_col_end - spec.col_start
            committed = e_hat[:, :ncommit]
            total_e_hat = total_e_hat.at[
                :, spec.col_start : spec.commit_col_end
            ].set(committed)

        # feedback: XOR only the newly committed columns' syndrome
        # contribution into the corrected detectors (incremental form of
        # osd.py:178's full re-multiplication)
        new_det = new_det ^ _gf2_matmul(
            committed,
            chk_t_f32[spec.col_start : spec.col_start + ncommit],
        )
        if sync_per_window:
            jax.block_until_ready(new_det)
        dt = time.perf_counter() - t0
        window_seconds.append(dt)
        if verbose:
            flagged = window_flagged[-1] if collect_window_stats else -1
            print(f"Window {spec.index}: flagged {flagged}/{S} ({dt:.2f}s)")

    return {
        "total_e_hat": total_e_hat,
        "corrected_det": new_det,
        "window_flagged": window_flagged,
        "window_seconds": window_seconds,
        "window_nonconverged": window_nonconverged,
    }


def _window_step_builder(decoder, m_w: int, ncommit: int):
    """Pure per-window step: decode → commit → feedback.

    Row/column offsets are *traced* scalars so one compiled step serves
    every window that shares (decoder, window height, commit width) — the
    interior windows of a (W, F) plan all reuse a single executable.
    """
    import jax
    import jax.numpy as jnp

    def step(new_det, total_e_hat, chk_commit_t, rs, cs):
        S = new_det.shape[0]
        synd = jax.lax.dynamic_slice(new_det, (jnp.int32(0), rs), (S, m_w))
        out = decoder.core(synd)
        committed = out["error"][:, :ncommit]
        total_e_hat = jax.lax.dynamic_update_slice(
            total_e_hat, committed, (jnp.int32(0), cs)
        )
        fb = _gf2_matmul(committed, chk_commit_t)
        return new_det ^ fb, total_e_hat

    return step


def decode_sliding_window_sharded(
    plan,
    det_data,
    decoder_factory,
    mesh=None,
    *,
    verbose: bool = False,
):
    """The full (W, F) pipeline as compiled device programs, optionally
    sharded over a shots mesh.

    Functionally identical to ``decode_sliding_window`` (same per-shot
    results), but every window is one jitted step with donated carries and
    zero host syncs; with ``mesh`` the step runs under ``shard_map`` with
    the shot axis partitioned — decode state is shard-local and there are
    no collectives until the final count reduction (SURVEY §2.4 P1/P6).

    Requires decoders exposing the pure ``core(synds)`` method (BPOSD).
    With a mesh, the shot count must divide evenly over the devices.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    det = jnp.asarray(det_data, jnp.uint8)
    S = det.shape[0]
    num_col = plan.chk.shape[1]
    if mesh is not None:
        axis = mesh.axis_names[0]
        if S % mesh.size:
            raise ValueError(f"shots {S} must divide the mesh size {mesh.size}")
        sharding = NamedSharding(mesh, P(axis, None))
        det = jax.device_put(det, sharding)
        total_e_hat = jax.device_put(
            jnp.zeros((S, num_col), jnp.uint8), sharding
        )
    else:
        total_e_hat = jnp.zeros((S, num_col), jnp.uint8)

    # full feedback matrix uploaded once; per-window slices are device ops
    chk_t = jnp.asarray(np.asarray(plan.chk.T, dtype=np.float32))  # [C, R]
    if mesh is not None:
        chk_t = jax.device_put(chk_t, NamedSharding(mesh, P(None, None)))
    window_seconds: list[float] = []
    for spec in plan.windows:
        t0 = time.perf_counter()
        decoder = decoder_factory(spec)
        m_w = spec.row_end - spec.row_start
        ncommit = (
            spec.col_end if spec.is_last else spec.commit_col_end
        ) - spec.col_start
        # jitted steps are cached ON the decoder so repeated pipeline calls
        # (and the windows sharing a decoder) reuse compiled executables
        # instead of retracing fresh closures every call
        cache = getattr(decoder, "_window_step_cache", None)
        if cache is None:
            cache = decoder._window_step_cache = {}
        key = (m_w, ncommit, mesh)
        if key not in cache:
            fn = _window_step_builder(decoder, m_w, ncommit)
            if mesh is not None:
                fn = jax.shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(P(axis, None), P(axis, None), P(None, None), P(), P()),
                    out_specs=(P(axis, None), P(axis, None)),
                    check_vma=False,
                )
            cache[key] = jax.jit(fn, donate_argnums=(0, 1))
        chk_commit_t = jax.lax.dynamic_slice(
            chk_t, (spec.col_start, 0), (ncommit, chk_t.shape[1])
        )
        det, total_e_hat = cache[key](
            det,
            total_e_hat,
            chk_commit_t,
            jnp.int32(spec.row_start),
            jnp.int32(spec.col_start),
        )
        dt = time.perf_counter() - t0
        window_seconds.append(dt)
        if verbose:
            print(f"Window {spec.index}: dispatched ({dt:.2f}s)")

    return {
        "total_e_hat": total_e_hat,
        "corrected_det": det,
        "window_seconds": window_seconds,
    }


def evaluate_logical_errors_sharded(plan, det_data, obs_data, total_e_hat, mesh):
    """Final accounting under ``shard_map``: local residual/observable
    checks plus one ``psum`` count reduction — the only cross-device
    communication in the whole Monte-Carlo (SURVEY §2.4 P6)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    det = jax.device_put(_as_device_u8(det_data), sharding)
    obs = jax.device_put(_as_device_u8(obs_data), sharding)
    e_hat = _as_device_u8(total_e_hat)
    chk_t = jnp.asarray(plan.chk.T, jnp.float32)
    obs_t = jnp.asarray(plan.obs.T, jnp.float32)

    def ev(det_l, obs_l, e_hat_l):
        resid = _gf2_matmul(e_hat_l, chk_t) ^ det_l
        flagged = resid.any(axis=1)
        obs_hat = _gf2_matmul(e_hat_l, obs_t)
        logical = (obs_hat ^ obs_l).any(axis=1)
        failed = flagged | logical
        n_flagged = jax.lax.psum(jnp.sum(flagged.astype(jnp.int32)), axis)
        n_failed = jax.lax.psum(jnp.sum(failed.astype(jnp.int32)), axis)
        return failed, n_flagged, n_failed

    failed, n_flagged, n_failed = jax.jit(
        jax.shard_map(
            ev,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None)),
            out_specs=(P(axis), P(), P()),
            check_vma=False,
        )
    )(det, obs, e_hat)
    return {
        "failed": np.asarray(failed),
        "num_flagged": int(n_flagged),
        "num_failed": int(n_failed),
    }


def evaluate_logical_errors(plan, det_data, obs_data, total_e_hat):
    """Final accounting, matching osd.py:184-189: a shot fails if its global
    residual syndrome is nonzero (flagged) OR any observable is flipped."""
    import jax.numpy as jnp

    det = _as_device_u8(det_data)
    obs = _as_device_u8(obs_data)
    e_hat = _as_device_u8(total_e_hat)
    resid = _gf2_matmul(e_hat, jnp.asarray(plan.chk.T, jnp.float32)) ^ det
    flagged = resid.any(axis=1)
    obs_hat = _gf2_matmul(e_hat, jnp.asarray(plan.obs.T, jnp.float32))
    logical = (obs_hat ^ obs).any(axis=1)
    failed = flagged | logical
    return {
        "flagged": np.asarray(flagged),
        "logical": np.asarray(logical),
        "failed": np.asarray(failed),
        "num_flagged": int(jnp.sum(flagged)),
        "num_failed": int(jnp.sum(failed)),
    }


class CachingDecoderFactory:
    """Build one decoder per distinct window signature, reuse across windows.

    Window matrices recur (all interior windows share structure), so keying
    on the matrix bytes + prior bytes avoids both rebuild and recompile.
    """

    def __init__(self, build):
        self._build = build
        self._cache: dict = {}

    def __call__(self, spec):
        key = (
            spec.mat.shape,
            hash(spec.mat.tobytes()),
            hash(spec.prior.tobytes()),
        )
        if key not in self._cache:
            self._cache[key] = self._build(spec)
        return self._cache[key]
