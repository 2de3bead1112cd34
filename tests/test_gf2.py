import numpy as np
import pytest

from slidingwindowdecoder_tpu.utils.gf2 import (
    bin2int,
    compute_code_distance,
    gf2_matmul,
    gf2_solve_lower,
    int2bin,
    inverse,
    kernel,
    make_systematic,
    rank,
    row_basis,
    row_echelon,
)


def brute_rank(mat):
    """Rank over GF(2) by enumerating the row space (oracle for tiny matrices)."""
    span = {0}
    width = mat.shape[1]
    for row in mat:
        v = bin2int(row)
        if v not in span:
            span = span | {s ^ v for s in span}
    return int(np.log2(len(span)))


def random_mats(rng, count=30, max_m=9, max_n=9):
    for _ in range(count):
        m = rng.integers(1, max_m)
        n = rng.integers(1, max_n)
        yield rng.integers(0, 2, (m, n)).astype(np.uint8)


def test_int_bin_roundtrip():
    assert int2bin(5, 4) == [0, 1, 0, 1]
    assert int2bin(12, 3) == [1, 0, 0]  # truncates to the low 3 bits
    assert bin2int([1, 0, 1]) == 5


def test_row_echelon_properties(rng):
    for mat in random_mats(rng):
        ech, r, transform, pivots = row_echelon(mat)
        assert r == brute_rank(mat)
        assert np.array_equal(gf2_matmul(transform, mat), ech)
        assert len(pivots) == r
        # echelon structure: pivot of row i at pivots[i], zeros below
        for i, c in enumerate(pivots):
            assert ech[i, c] == 1
            assert not ech[i + 1 :, c].any()


def test_reduced_row_echelon(rng):
    for mat in random_mats(rng):
        ech, r, transform, pivots = row_echelon(mat, reduced=True)
        assert np.array_equal(gf2_matmul(transform, mat), ech)
        for i, c in enumerate(pivots):
            col = ech[:, c]
            assert col[i] == 1 and col.sum() == 1


def test_kernel(rng):
    for mat in random_mats(rng):
        ker, r, _ = kernel(mat)
        assert r == brute_rank(mat)
        assert ker.shape[0] == mat.shape[1] - r
        if ker.shape[0]:
            assert not gf2_matmul(mat, ker.T).any()
        assert brute_rank(ker) == ker.shape[0] if ker.shape[0] else True


def test_row_basis(rng):
    for mat in random_mats(rng):
        basis = row_basis(mat)
        assert basis.shape[0] == rank(mat)
        assert rank(basis) == basis.shape[0] if basis.shape[0] else True


def test_inverse_square(rng):
    for _ in range(20):
        n = int(rng.integers(1, 8))
        while True:
            mat = rng.integers(0, 2, (n, n)).astype(np.uint8)
            if rank(mat) == n:
                break
        inv = inverse(mat)
        assert np.array_equal(gf2_matmul(inv, mat), np.eye(n, dtype=np.uint8))


def test_left_inverse(rng):
    for _ in range(10):
        n = int(rng.integers(1, 6))
        m = n + int(rng.integers(1, 4))
        while True:
            mat = rng.integers(0, 2, (m, n)).astype(np.uint8)
            if rank(mat) == n:
                break
        inv = inverse(mat)
        assert np.array_equal(gf2_matmul(inv, mat), np.eye(n, dtype=np.uint8))


def test_solve(rng):
    for mat in random_mats(rng, count=20):
        x_true = rng.integers(0, 2, mat.shape[1]).astype(np.uint8)
        rhs = gf2_matmul(mat, x_true)
        x = gf2_solve_lower(mat, rhs)
        assert x is not None
        assert np.array_equal(gf2_matmul(mat, x), rhs)


def test_solve_inconsistent():
    mat = np.array([[1, 0], [1, 0]], dtype=np.uint8)
    assert gf2_solve_lower(mat, np.array([1, 0])) is None


def test_make_systematic(rng):
    for mat in random_mats(rng, count=15):
        r = rank(mat)
        if r == 0:
            continue
        sys_mat, order = make_systematic(mat)
        assert np.array_equal(sys_mat[:, :r], np.eye(r, dtype=sys_mat.dtype))
        assert sorted(order.tolist()) == list(range(mat.shape[1]))


def test_code_distance_rep_code():
    # repetition code: distance n
    pcm = np.array([[1, 1, 0], [0, 1, 1]], dtype=np.uint8)
    assert compute_code_distance(pcm) == 3
