import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from slidingwindowdecoder_tpu.ops.gf2_solve import (
    gf2_rank_packed,
    ordered_gauss_jordan,
    osd_candidate_patterns,
    osd_decode,
    pack_rows_host,
)
from slidingwindowdecoder_tpu.utils.gf2 import gf2_matmul, gf2_solve_lower, rank


def greedy_pivots(H, order):
    """Oracle: first independent columns processed in the given order."""
    chosen = []
    r_target = rank(H)
    for j in order:
        if len(chosen) == r_target:
            break
        if rank(H[:, chosen + [j]]) > len(chosen):
            chosen.append(int(j))
    return chosen


def osd_oracle(H, synd, reliability, llr, patterns, k):
    order = np.argsort(reliability, kind="stable")
    piv = greedy_pivots(H, order)
    y = gf2_solve_lower(H[:, piv], synd)
    assert y is not None
    osd0 = np.zeros(H.shape[1], dtype=np.uint8)
    osd0[piv] = y
    nonpiv = [int(j) for j in order if j not in set(piv)][:k]
    best, best_pm = osd0, float(llr[osd0 == 1].sum())
    for pat in patterns:
        sup = [nonpiv[t] for t in range(k) if pat[t]]
        g = (synd + H[:, sup].sum(axis=1)) % 2
        yy = gf2_solve_lower(H[:, piv], g)
        assert yy is not None
        cand = np.zeros(H.shape[1], dtype=np.uint8)
        cand[piv] = yy
        cand[sup] = 1
        pm = float(llr[cand == 1].sum())
        if pm < best_pm:
            best, best_pm = cand, pm
    return osd0, best, best_pm


def full_rank_pcm(rng, m, n):
    while True:
        H = (rng.random((m, n)) < 0.4).astype(np.uint8)
        if H.sum(axis=0).min() >= 1 and rank(H) == m:
            return H


def test_rank_packed(rng):
    for _ in range(10):
        H = (rng.random((20, 35)) < 0.3).astype(np.uint8)
        assert gf2_rank_packed(H) == rank(H)


def test_gauss_jordan_solves(rng):
    for trial in range(6):
        m, n = 10, 24
        H = full_rank_pcm(rng, m, n)
        words = jnp.asarray(pack_rows_host(H))
        B = 4
        x_true = (rng.random((B, n)) < 0.15).astype(np.uint8)
        synd = (x_true @ H.T) % 2
        rel = rng.normal(0, 1, (B, n)).astype(np.float32)
        order = np.argsort(rel, axis=1, kind="stable").astype(np.int32)
        out = ordered_gauss_jordan(
            words, jnp.asarray(synd), jnp.asarray(order), m=m, n=n, rank=m
        )
        osd0 = np.asarray(out["osd0"])
        assert not np.asarray(out["inconsistent"]).any()
        # solves the syndrome equation
        assert np.array_equal((osd0 @ H.T) % 2, synd)
        # support in the greedy pivot set, and pivots match the oracle
        for b in range(B):
            piv = greedy_pivots(H, order[b])
            assert sorted(np.asarray(out["piv_col"][b]).tolist()) == sorted(piv)
            assert set(np.nonzero(osd0[b])[0]).issubset(set(piv))


def test_inconsistent_flag(rng):
    # rank-deficient H and a syndrome outside its column space
    H = np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1]], dtype=np.uint8)
    words = jnp.asarray(pack_rows_host(H))
    synd = np.array([[1, 0, 0]], dtype=np.uint8)
    order = np.arange(3, dtype=np.int32)[None, :]
    out = ordered_gauss_jordan(
        words, jnp.asarray(synd), jnp.asarray(order), m=3, n=3, rank=2
    )
    assert bool(out["inconsistent"][0])


@pytest.mark.parametrize("method,order", [("osd_cs", 3), ("osd_e", 4), ("osd_0", 0)])
def test_osd_matches_oracle(rng, method, order):
    m, n = 9, 22
    H = full_rank_pcm(rng, m, n)
    words = jnp.asarray(pack_rows_host(H))
    k = min(n - m, 8)
    patterns = osd_candidate_patterns(k, order, method)
    B = 5
    x_true = (rng.random((B, n)) < 0.2).astype(np.uint8)
    synd = (x_true @ H.T) % 2
    llr = rng.uniform(0.5, 4.0, n)
    rel = rng.normal(0, 1, (B, n)).astype(np.float32)
    out = osd_decode(
        words,
        jnp.asarray(synd),
        jnp.asarray(rel),
        jnp.asarray(llr, jnp.float32),
        jnp.asarray(patterns),
        m=m,
        n=n,
        rank=m,
        k=k,
    )
    sol = np.asarray(out["solution"])
    osd0 = np.asarray(out["osd0"])
    pm = np.asarray(out["min_pm"])
    for b in range(B):
        o0, best, best_pm = osd_oracle(H, synd[b], rel[b], llr, patterns, k)
        np.testing.assert_array_equal(osd0[b], o0)
        np.testing.assert_array_equal(sol[b], best)
        assert pm[b] == pytest.approx(best_pm, rel=1e-5)
        # candidate solutions still satisfy the syndrome
        assert np.array_equal((sol[b] @ H.T) % 2, synd[b])


def test_osd_candidate_counts():
    # OSD-CS: k weight-1 + order-choose-2 weight-2 (osd_window.pyx:137,155)
    pats = osd_candidate_patterns(10, 4, "osd_cs")
    assert pats.shape == (10 + 6, 10)
    pats = osd_candidate_patterns(6, 3, "osd_e")
    assert pats.shape == (7, 6)
