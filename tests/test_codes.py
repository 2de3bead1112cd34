import numpy as np
import pytest

from slidingwindowdecoder_tpu.codes import (
    CSSCode,
    bb_code_by_n,
    create_2BGA,
    create_bivariate_bicycle_codes,
    create_checkerboard_toric_codes,
    create_circulant_matrix,
    create_generalized_bicycle_codes,
    create_rotated_surface_codes,
    create_surface_codes,
    find_girth,
    hamming_code,
    rep_code,
    read_alist,
    write_alist,
)
from slidingwindowdecoder_tpu.utils.gf2 import gf2_matmul


def check_css_invariants(code):
    assert not gf2_matmul(code.hx, code.hz.T).any()
    # logicals commute with stabilizers, anticommute pairing is full rank
    assert not gf2_matmul(code.hx, code.lz.T).any()
    assert not gf2_matmul(code.hz, code.lx.T).any()
    assert code.lx.shape[0] == code.K
    assert code.lz.shape[0] == code.K
    pairing = gf2_matmul(code.lx, code.lz.T)
    from slidingwindowdecoder_tpu.utils.gf2 import rank as gf2_rank

    assert gf2_rank(pairing) == code.K


@pytest.mark.parametrize(
    "N,K", [(72, 12), (144, 12), (288, 12)]
)
def test_bb_codes(N, K):
    code, A_list, B_list = bb_code_by_n(N)
    assert code.N == N
    assert code.K == K
    check_css_invariants(code)
    # A = sum of monomial matrices, hx = [A | B]
    A = sum(a.astype(int) for a in A_list) % 2
    B = sum(b.astype(int) for b in B_list) % 2
    assert np.array_equal(code.hx[:, : N // 2], A)
    assert np.array_equal(code.hx[:, N // 2 :], B)
    # BB codes are weight-6 LDPC
    assert code.Q == 6 and code.L == 3


def test_bb_90():
    code, _, _ = bb_code_by_n(90)
    assert code.N == 90 and code.K == 8
    check_css_invariants(code)


def test_surface_code():
    code = create_surface_codes(3)
    assert code.N == 13 and code.K == 1
    check_css_invariants(code)


def test_rotated_surface_code():
    code = create_rotated_surface_codes(3)
    assert code.N == 9 and code.K == 1
    check_css_invariants(code)


def test_toric_code():
    code = create_checkerboard_toric_codes(4)
    assert code.N == 16 and code.K == 2
    check_css_invariants(code)


def test_generalized_bicycle():
    code = create_generalized_bicycle_codes(24, [0, 2, 8, 15], [0, 2, 12, 17])
    assert code.N == 48
    check_css_invariants(code)


def test_2bga():
    # abelian special case (k=1) reduces to a generalized bicycle structure
    code = create_2BGA(6, 2, 1, [(0, 0), (1, 0), (0, 1)], [(0, 0), (2, 0), (3, 1)])
    assert code.N == 24
    check_css_invariants(code)


def test_circulant():
    h = create_circulant_matrix(5, [-1])
    # down-shift: column i has a 1 at row (i-1) % 5
    assert h[4, 0] == 1 and h[0, 1] == 1
    assert (h.sum(axis=0) == 1).all() and (h.sum(axis=1) == 1).all()


def test_hamming_rep():
    h = hamming_code(3)
    assert h.shape == (3, 7)
    r = rep_code(5)
    assert r.shape == (4, 5)
    assert (r.sum(axis=1) == 2).all()


def test_girth():
    # 4-cycle: two checks sharing two bits
    pcm = np.array([[1, 1], [1, 1]], dtype=np.uint8)
    assert find_girth(pcm) == 4
    # tree: no cycle
    pcm = np.array([[1, 1, 0], [0, 0, 1]], dtype=np.uint8)
    assert find_girth(pcm) == -1


def test_canonical_logicals():
    code, _, _ = bb_code_by_n(72)
    code.canonical_logicals()
    assert np.array_equal(
        gf2_matmul(code.lx, code.lz.T), np.eye(code.K, dtype=np.uint8)
    )


def test_alist_roundtrip(tmp_path, rng):
    mat = rng.integers(0, 2, (7, 11)).astype(np.uint8)
    path = str(tmp_path / "m.alist")
    write_alist(path, mat)
    assert np.array_equal(read_alist(path), mat)


@pytest.mark.parametrize("N,K", [(108, 8), (360, 12), (756, 16)])
def test_large_bb_codes(N, K):
    code, _, _ = bb_code_by_n(N)
    assert code.N == N and code.K == K
    check_css_invariants(code)


# Golden construction outputs from the reference's Misc.ipynb cell 7:
# the CAMEL (cycle-assemble) and EG (Euclidean-geometry) series print
# name strings encoding (N, K); reproducing them validates the whole
# polynomial/GF(2^m) machinery behind both constructors.
@pytest.mark.parametrize(
    "args,N,K",
    [((7, 3), 50, 12), ((11, 2), 122, 20), ((13, 2), 170, 24),
     ((17, 3), 290, 32), ((19, 3), 362, 36)],
)
def test_camel_codes_golden(args, N, K):
    from slidingwindowdecoder_tpu.codes import create_cycle_assemble_codes

    code = create_cycle_assemble_codes(*args)
    assert (code.N, code.K) == (N, K), code.name
    check_css_invariants(code)


@pytest.mark.parametrize("s,N,K", [(1, 7, 1), (2, 21, 3), (3, 73, 19)])
def test_eg_codes_golden(s, N, K):
    from slidingwindowdecoder_tpu.codes import create_EG_codes

    code = create_EG_codes(s)
    assert (code.N, code.K) == (N, K), code.name
    check_css_invariants(code)


@pytest.mark.slow
@pytest.mark.parametrize("s,N,K", [(4, 273, 111), (5, 1057, 571)])
def test_eg_codes_golden_large(s, N, K):
    from slidingwindowdecoder_tpu.codes import create_EG_codes

    code = create_EG_codes(s)
    assert (code.N, code.K) == (N, K), code.name
