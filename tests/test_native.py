import numpy as np
import pytest

from slidingwindowdecoder_tpu import native
from slidingwindowdecoder_tpu.utils.gf2 import rank

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_rank(rng):
    for _ in range(15):
        m = int(rng.integers(2, 40))
        n = int(rng.integers(2, 90))
        H = (rng.random((m, n)) < 0.3).astype(np.uint8)
        assert native.gf2_rank(H) == rank(H)


def test_native_ordered_solve(rng):
    for _ in range(10):
        m, n = 12, 30
        H = (rng.random((m, n)) < 0.3).astype(np.uint8)
        x_true = (rng.random(n) < 0.2).astype(np.uint8)
        synd = (H @ x_true) % 2
        order = rng.permutation(n).astype(np.int32)
        x, r = native.gf2_ordered_solve(H, order, synd)
        assert x is not None
        assert np.array_equal((H @ x) % 2, synd)


def test_native_solve_inconsistent():
    H = np.array([[1, 1, 0], [1, 1, 0]], dtype=np.uint8)
    x, r = native.gf2_ordered_solve(H, np.arange(3, dtype=np.int32), np.array([1, 0]))
    assert x is None and r == -1


def test_native_bp_matches_python_oracle(rng):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from bp_oracle import bp_oracle

    for _ in range(6):
        m = int(rng.integers(3, 8))
        n = int(rng.integers(m, 12))
        while True:
            H = (rng.random((m, n)) < 0.35).astype(np.uint8)
            if H.sum(axis=1).min() >= 1 and H.sum(axis=0).min() >= 1:
                break
        prior = rng.normal(1.5, 1.0, n)
        synd = rng.integers(0, 2, m).astype(np.uint8)
        iters = int(rng.integers(1, 8))
        got = native.serial_bp_decode(H, prior, synd, max_iter=iters, alpha=0.8)
        ref = bp_oracle(H, prior, synd, iters, alpha=0.8)
        assert got["converged"] == ref["converged"]
        np.testing.assert_array_equal(got["error"], ref["error"])


def test_native_bp_decodes(rng):
    from slidingwindowdecoder_tpu.codes import bb_code_by_n

    code, _, _ = bb_code_by_n(72)
    p = 0.01
    prior = np.full(code.N, np.log((1 - p) / p))
    err = np.zeros(code.N, dtype=np.uint8)
    err[3] = 1
    synd = (code.hx @ err) % 2
    out = native.serial_bp_decode(code.hx, prior, synd, max_iter=50)
    assert out["converged"]
    np.testing.assert_array_equal(out["error"], err)
