"""Dense-padded Tanner-graph compilation.

Converts a binary parity-check matrix into fixed-shape edge tables suitable
for batched TPU message passing: a CN-major table (per check: its variable
neighbors, padded to the max check degree) and a VN-major table (per
variable: its check neighbors, padded to the max variable degree), plus the
two static permutations that move a flattened edge-message array between the
layouts. All shapes are static, so everything downstream jits cleanly.

This is the TPU-native replacement for the reference's doubly-linked
``mod2sparse`` structure (src/include/mod2sparse.h:46-107): instead of
pointer chasing per edge, message updates become masked vector ops over
[..., m, dc] / [..., n, dv] arrays and two static gathers.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class TannerGraph:
    m: int
    n: int
    dc: int  # max check (row) degree
    dv: int  # max variable (column) degree
    cn_vn: np.ndarray  # [m, dc] int32: VN index per check slot; n (dummy) pads
    cn_valid: np.ndarray  # [m, dc] bool
    vn_cn: np.ndarray  # [n, dv] int32: CN index per var slot; m (dummy) pads
    vn_valid: np.ndarray  # [n, dv] bool
    # flat-edge permutations; invalid slots point at the trailing dummy slot
    cn_from_vn: np.ndarray  # [m*dc] int32 indices into a [n*dv + 1] flat array
    vn_from_cn: np.ndarray  # [n*dv] int32 indices into a [m*dc + 1] flat array
    cn_degree: np.ndarray  # [m] int32
    vn_degree: np.ndarray  # [n] int32
    # slot-major tables for the BP hot loop. CN-major edge arrays live as
    # [dc, m_pad, B]; with m_pad a multiple of 32 the flatten to
    # [dc*m_pad, B] is a layout-preserving bitcast for every dtype tiling
    # (f32 8-row, bf16 16-row, int8 32-row tiles), so XLA emits zero
    # physical reshapes in the iteration loop.
    m_pad: int
    cn_vn_sm: np.ndarray  # [dc, m_pad] int32: VN per slot; n pads
    cn_valid_sm: np.ndarray  # [dc, m_pad] bool
    vn_from_cn_sm: np.ndarray  # [n, dv] int32 into [dc*m_pad] flat; OOB pads

    @property
    def num_edges(self) -> int:
        return int(self.cn_valid.sum())


def compile_graph(H: np.ndarray) -> TannerGraph:
    """Compile a dense 0/1 PCM into padded edge tables."""
    H = np.asarray(H)
    if H.ndim != 2:
        raise ValueError("PCM must be 2-D")
    H = (H != 0)
    m, n = H.shape
    cn_degree = H.sum(axis=1).astype(np.int32)
    vn_degree = H.sum(axis=0).astype(np.int32)
    dc = max(1, int(cn_degree.max(initial=0)))
    dv = max(1, int(vn_degree.max(initial=0)))

    cn_vn = np.full((m, dc), n, dtype=np.int32)
    vn_cn = np.full((n, dv), m, dtype=np.int32)
    cn_valid = np.zeros((m, dc), dtype=bool)
    vn_valid = np.zeros((n, dv), dtype=bool)
    # slot position of edge (i, j) in each layout
    cn_slot = np.full((m, n), -1, dtype=np.int32)
    vn_slot = np.full((m, n), -1, dtype=np.int32)

    for i in range(m):
        cols = np.nonzero(H[i])[0]
        cn_vn[i, : cols.size] = cols
        cn_valid[i, : cols.size] = True
        cn_slot[i, cols] = np.arange(cols.size)
    for j in range(n):
        rows = np.nonzero(H[:, j])[0]
        vn_cn[j, : rows.size] = rows
        vn_valid[j, : rows.size] = True
        vn_slot[rows, j] = np.arange(rows.size)

    rows, cols = np.nonzero(H)
    # cn-major flat index of each edge, and vn-major flat index
    cn_flat = rows * dc + cn_slot[rows, cols]
    vn_flat = cols * dv + vn_slot[rows, cols]

    cn_from_vn = np.full(m * dc, n * dv, dtype=np.int32)  # dummy pad slot
    cn_from_vn[cn_flat] = vn_flat
    vn_from_cn = np.full(n * dv, m * dc, dtype=np.int32)
    vn_from_cn[vn_flat] = cn_flat

    # at least ONE inert pad row beyond m: the transposed decimation ops
    # gather CN-side arrays through ``vn_cn``'s dummy index m, and on the
    # real TPU a gather from an odd-height concat source ([m_pad+1, B]
    # when m == m_pad) faults the worker on the [[288]]-family graphs
    # (round 5) — guaranteeing m < m_pad keeps every gather source at
    # the tile-aligned [m_pad, B] shape
    m_pad = -(-(m + 1) // 32) * 32
    cn_vn_sm = np.full((dc, m_pad), n, dtype=np.int32)
    cn_vn_sm[:, :m] = cn_vn.T
    cn_valid_sm = np.zeros((dc, m_pad), dtype=bool)
    cn_valid_sm[:, :m] = cn_valid.T
    # slot-major flat index of edge (i, j): slot * m_pad + i
    vn_from_cn_sm = np.full((n, dv), dc * m_pad, dtype=np.int32)
    vn_from_cn_sm[cols, vn_slot[rows, cols]] = (
        cn_slot[rows, cols] * m_pad + rows
    )

    return TannerGraph(
        m=m,
        n=n,
        dc=dc,
        dv=dv,
        cn_vn=cn_vn,
        cn_valid=cn_valid,
        vn_cn=vn_cn,
        vn_valid=vn_valid,
        cn_from_vn=cn_from_vn,
        vn_from_cn=vn_from_cn,
        cn_degree=cn_degree,
        vn_degree=vn_degree,
        m_pad=m_pad,
        cn_vn_sm=cn_vn_sm,
        cn_valid_sm=cn_valid_sm,
        vn_from_cn_sm=vn_from_cn_sm,
    )


def vn_incidence_host(graph: TannerGraph) -> np.ndarray:
    """Dense 0/1 VN-incidence over slot-major flat edges: A[v, s*m_pad+i]
    = 1 iff check-slot (s, i) is a valid edge of VN v.

    ``A @ mc_flat`` is then the per-VN sum of incoming CN messages — an
    MXU matmul that replaces the VN-side row gather (measured 1.35x
    faster at the flagship window size; the gather path on this backend
    runs ~6x below HBM peak). Only worthwhile when n*dc*m_pad is small
    enough for the constant to stay resident (window-sized graphs)."""
    A = np.zeros((graph.n, graph.dc * graph.m_pad), dtype=np.float32)
    s, i = np.nonzero(graph.cn_valid_sm)
    A[graph.cn_vn_sm[s, i], s * graph.m_pad + i] = 1.0
    return A


def graph_device_arrays(graph: TannerGraph):
    """The jnp pytree of static tables consumed by the BP kernels."""
    import jax.numpy as jnp

    return {
        "cn_vn": jnp.asarray(graph.cn_vn),
        "cn_valid": jnp.asarray(graph.cn_valid),
        "vn_valid": jnp.asarray(graph.vn_valid),
        "cn_from_vn": jnp.asarray(graph.cn_from_vn),
        "vn_from_cn": jnp.asarray(graph.vn_from_cn),
        "vn_cn": jnp.asarray(graph.vn_cn),
        "cn_degree": jnp.asarray(graph.cn_degree),
        "vn_degree": jnp.asarray(graph.vn_degree),
        "cn_vn_sm": jnp.asarray(graph.cn_vn_sm),
        "cn_valid_sm": jnp.asarray(graph.cn_valid_sm),
        "vn_from_cn_sm": jnp.asarray(graph.vn_from_cn_sm),
    }
