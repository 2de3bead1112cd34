"""Device meshes and shot-sharded decode steps.

The domain's parallel axes (SURVEY.md §2.4): shots are the data-parallel
axis (sharded over chips/hosts), GDG branches stay device-local (vmapped),
and the only cross-device communication is scalar count reduction — so the
whole Monte-Carlo scales over ICI/DCN with one ``psum`` per batch.
"""

from __future__ import annotations

import numpy as np

SHOTS_AXIS = "shots"


def make_shot_mesh(devices=None, axis: str = SHOTS_AXIS):
    """1-D mesh over the shot axis (all local devices by default)."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_decode_step(mesh, mat, prior, syndromes, *, num_iter: int = 32,
                      alpha: float = 1.0):
    """One sharded decode step: BP + OSD-0 fallback + global error count.

    Shots are sharded over the mesh; the PCM/graph tables are replicated.
    Returns {"error": [B, n] (sharded), "num_errors": scalar (replicated)}.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard_map = jax.shard_map

    from ..graphs.tanner import compile_graph, graph_device_arrays
    from ..ops.bp import decode_bp
    from ..ops.gf2_solve import (
        gf2_rank_packed,
        osd_candidate_patterns,
        osd_decode,
        pack_rows_host,
    )

    mat = np.asarray(mat)
    m, n = mat.shape
    garr = graph_device_arrays(compile_graph(mat))
    llr = jnp.asarray(np.log((1 - prior) / prior).astype(np.float32))
    H_words = jnp.asarray(pack_rows_host(mat))
    rank = gf2_rank_packed(mat)
    patterns = jnp.asarray(osd_candidate_patterns(n - rank, 0, "osd_0"))
    axis = mesh.axis_names[0]

    B = syndromes.shape[0]
    if B % mesh.size != 0:
        raise ValueError(f"batch {B} must divide the mesh size {mesh.size}")

    def step(synds_local):
        out = decode_bp(garr, llr, synds_local, num_iter=num_iter, alpha=alpha)
        rel = jnp.sum(out["history"], axis=-1)
        osd = osd_decode(
            H_words,
            synds_local,
            rel,
            llr,
            patterns,
            m=m,
            n=n,
            rank=rank,
            k=n - rank,
        )
        error = jnp.where(
            out["converged"][:, None], out["error"], osd["solution"].astype(jnp.int8)
        ).astype(jnp.uint8)
        # residual syndrome check; count failures globally over the mesh
        from ..ops.bp import check_syndrome

        resid = check_syndrome(garr, error) != synds_local.astype(jnp.int32)
        failed = jnp.any(resid, axis=-1)
        num_errors = jax.lax.psum(jnp.sum(failed.astype(jnp.int32)), axis)
        return error, num_errors

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P()),
        check_vma=False,
    )
    error, num_errors = jax.jit(sharded)(jnp.asarray(syndromes, jnp.uint8))
    return {"error": error, "num_errors": num_errors}


def shard_over_shots(mesh, array):
    """Place a [B, ...] array with its leading axis sharded over the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(mesh.axis_names[0], *([None] * (np.ndim(array) - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))
