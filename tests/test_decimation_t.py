"""Transposed (batch-minor) decimation ops vs the batch-major originals.

The _t forms are the GDG-ensemble hot path (round 5); they must be
bit-equivalent to the batch-major forms under transposition, including
contradiction/dead handling and the cn pad-row inertness contract.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from slidingwindowdecoder_tpu.graphs.tanner import (
    compile_graph,
    graph_device_arrays,
)
from slidingwindowdecoder_tpu.ops.decimation import (
    init_decimation_state,
    init_decimation_state_t,
    peel,
    peel_t,
    unsatisfied_counts,
    unsatisfied_counts_t,
    vn_set_values,
    vn_set_values_t,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _graph(rng, m=48, n=96):
    H = (rng.random((m, n)) < 0.12).astype(np.uint8)
    H[0, :4] = 1
    for j in range(n):  # no empty columns
        if H[:, j].sum() == 0:
            H[rng.integers(0, m), j] = 1
    return H


def _pad_cn(x, m_pad, fill):
    out = np.full((x.shape[0], m_pad), fill, x.dtype)
    out[:, : x.shape[1]] = x
    return out


@pytest.mark.parametrize("m,n", [(48, 96), (64, 96)])  # m=64 => m == m_pad
def test_vn_set_peel_unsat_equivalence(rng, m, n):
    H = _graph(rng, m, n)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    B = 32
    m_pad = g.m_pad

    synds = rng.integers(0, 2, (B, m)).astype(np.uint8)
    vn0, cn0, cd0, dead0 = init_decimation_state(garr, jnp.asarray(synds))
    vn0t, cn0t, cd0t, dead0t = init_decimation_state_t(
        garr, jnp.asarray(synds.T)
    )
    np.testing.assert_array_equal(np.asarray(vn0t), np.asarray(vn0).T)
    np.testing.assert_array_equal(
        np.asarray(cn0t), _pad_cn(np.asarray(cn0), m_pad, -1).T
    )
    np.testing.assert_array_equal(
        np.asarray(cd0t), _pad_cn(np.asarray(cd0), m_pad, 0).T
    )

    # a few rounds of random decisions + peel, comparing full state
    vn, cn, cd, dead = vn0, cn0, cd0, dead0
    vnt, cnt, cdt, deadt = vn0t, cn0t, cd0t, dead0t
    for it in range(3):
        set_mask = rng.random((B, n)) < 0.08
        values = rng.integers(0, 2, (B, n)).astype(np.int8)
        vn, cn, cd, dead = vn_set_values(
            garr, vn, cn, cd, dead, jnp.asarray(set_mask), jnp.asarray(values)
        )
        vnt, cnt, cdt, deadt = vn_set_values_t(
            garr, vnt, cnt, cdt, deadt, jnp.asarray(set_mask.T),
            jnp.asarray(values.T),
        )
        vn, cn, cd, dead = peel(garr, vn, cn, cd, dead)
        vnt, cnt, cdt, deadt = peel_t(garr, vnt, cnt, cdt, deadt)
        np.testing.assert_array_equal(np.asarray(vnt), np.asarray(vn).T)
        np.testing.assert_array_equal(
            np.asarray(cnt), _pad_cn(np.asarray(cn), m_pad, -1).T
        )
        np.testing.assert_array_equal(
            np.asarray(cdt)[:m].T, np.asarray(cd)
        )
        np.testing.assert_array_equal(np.asarray(deadt), np.asarray(dead))

    # unsatisfied counts on a random decoded syndrome
    synd_hat = rng.integers(0, 2, (B, m)).astype(np.int8)
    ref = unsatisfied_counts(
        garr, jnp.zeros((B, n), jnp.int8), jnp.asarray(synds),
        cn, synd_hat=jnp.asarray(synd_hat),
    )
    got = unsatisfied_counts_t(
        garr,
        jnp.asarray(_pad_cn(synd_hat, m_pad, 0).T),
        jnp.asarray(_pad_cn(synds.astype(np.int8), m_pad, 0).T),
        cnt,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref).T)
