import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from slidingwindowdecoder_tpu.graphs.tanner import compile_graph, graph_device_arrays
from slidingwindowdecoder_tpu.ops.bp import decode_bp

from bp_oracle import bp_oracle


def random_pcm(rng, m, n, min_row=1):
    while True:
        H = (rng.random((m, n)) < 0.35).astype(np.uint8)
        if H.sum(axis=1).min() >= min_row and H.sum(axis=0).min() >= 1:
            return H


def run_both(H, prior, synd, num_iter, alpha=1.0, vn_state=None, cn_state=None):
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    kw = {}
    if vn_state is not None:
        kw["vn_state"] = jnp.asarray(vn_state[None], jnp.int8)
    if cn_state is not None:
        kw["cn_state"] = jnp.asarray(cn_state[None], jnp.int8)
    out = decode_bp(
        garr,
        jnp.asarray(prior, jnp.float32),
        jnp.asarray(synd[None]),
        num_iter=num_iter,
        alpha=alpha,
        **kw,
    )
    ref = bp_oracle(H, prior, synd, num_iter, alpha=alpha, vn_state=vn_state, cn_state=cn_state)
    return out, ref


def test_bp_matches_serial_oracle(rng):
    for trial in range(6):
        m = int(rng.integers(3, 8))
        n = int(rng.integers(m, 12))
        H = random_pcm(rng, m, n)
        prior = rng.normal(1.5, 1.0, n)
        synd = rng.integers(0, 2, m)
        num_iter = int(rng.integers(1, 9))
        out, ref = run_both(H, prior, synd, num_iter)
        assert bool(out["converged"][0]) == ref["converged"]
        assert int(out["iterations"][0]) == ref["iterations"]
        np.testing.assert_array_equal(np.asarray(out["error"][0]), ref["error"])
        np.testing.assert_allclose(
            np.asarray(out["history"][0]), ref["history"], rtol=2e-4, atol=2e-4
        )


def test_bp_scaling_factor(rng):
    H = random_pcm(rng, 5, 9)
    prior = rng.normal(1.0, 0.8, 9)
    synd = rng.integers(0, 2, 5)
    out, ref = run_both(H, prior, synd, 6, alpha=0.625)
    assert bool(out["converged"][0]) == ref["converged"]
    np.testing.assert_allclose(
        np.asarray(out["history"][0]), ref["history"], rtol=2e-4, atol=2e-4
    )


def consistent_masked_state(rng, H, err, synd):
    """A decimation state reachable by the reference's vn_set_value/peel.

    Invariants (bpgd.cpp:51-80): cn_state holds the residual parity
    (syndrome XOR decided contributions) for active CNs; a CN is masked
    (-1) only once every neighbor is decided, at which point its residual
    parity must be 0. Deciding VNs to the true error's values guarantees
    fully-decided rows are satisfied.
    """
    m, n = H.shape
    vn_state = -np.ones(n, dtype=np.int64)
    decided = rng.choice(n, size=2, replace=False)
    vn_state[decided] = err[decided]
    # fully decide one CN's neighborhood so it gets masked
    row = int(rng.integers(m))
    for j in np.nonzero(H[row])[0]:
        vn_state[j] = err[j]
    dec = np.where(vn_state >= 0, vn_state, 0)
    cn_state = ((synd + H @ dec) % 2).astype(np.int64)
    undecided = vn_state == -1
    fully_decided = ~(H[:, undecided].astype(bool).any(axis=1))
    assert not cn_state[fully_decided].any()
    cn_state[fully_decided] = -1
    return vn_state, cn_state


def test_bp_masked_matches_oracle(rng):
    done = 0
    while done < 4:
        m = int(rng.integers(4, 8))
        n = int(rng.integers(m + 2, 14))
        H = random_pcm(rng, m, n)
        prior = rng.normal(1.5, 1.0, n)
        err = rng.integers(0, 2, n)
        synd = (H @ err) % 2
        vn_state, cn_state = consistent_masked_state(rng, H, err, synd)
        if (vn_state == -1).sum() < 2 or not (cn_state == -1).any():
            continue
        done += 1
        out, ref = run_both(H, prior, synd, 5, vn_state=vn_state, cn_state=cn_state)
        np.testing.assert_array_equal(np.asarray(out["error"][0]), ref["error"])
        np.testing.assert_allclose(
            np.asarray(out["history"][0]), ref["history"], rtol=2e-4, atol=2e-4
        )


def test_bp_decodes_repetition_code():
    # 7-bit repetition code, single flip: BP must find it in few iterations
    from slidingwindowdecoder_tpu.codes.constructors import rep_code

    H = rep_code(7)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    p = 0.05
    prior = np.full(7, np.log((1 - p) / p), dtype=np.float32)
    err = np.zeros(7, dtype=np.uint8)
    err[3] = 1
    synd = (H @ err) % 2
    out = decode_bp(garr, jnp.asarray(prior), jnp.asarray(synd[None]), num_iter=20)
    assert bool(out["converged"][0])
    np.testing.assert_array_equal(np.asarray(out["error"][0]), err)


def test_bp_batch_independence(rng):
    # decoding a batch must equal decoding each shot alone
    H = random_pcm(rng, 6, 10)
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    prior = rng.normal(1.5, 1.0, 10).astype(np.float32)
    synds = rng.integers(0, 2, (5, 6))
    out_b = decode_bp(garr, jnp.asarray(prior), jnp.asarray(synds), num_iter=8)
    for k in range(5):
        out_1 = decode_bp(garr, jnp.asarray(prior), jnp.asarray(synds[k : k + 1]), num_iter=8)
        np.testing.assert_array_equal(
            np.asarray(out_b["error"][k]), np.asarray(out_1["error"][0])
        )
        assert bool(out_b["converged"][k]) == bool(out_1["converged"][0])


def test_bp_on_bb72_code_capacity(rng):
    # end-to-end sanity: most random weight<=2 errors on [[72]] hx decode
    from slidingwindowdecoder_tpu.codes import bb_code_by_n

    code, _, _ = bb_code_by_n(72)
    H = code.hx
    g = compile_graph(H)
    garr = graph_device_arrays(g)
    p = 0.01
    prior = np.full(code.N, np.log((1 - p) / p), dtype=np.float32)
    shots = 64
    errs = (rng.random((shots, code.N)) < p).astype(np.uint8)
    synds = (errs @ H.T) % 2
    out = decode_bp(garr, jnp.asarray(prior), jnp.asarray(synds), num_iter=50)
    conv = np.asarray(out["converged"])
    errors_hat = np.asarray(out["error"])
    # converged shots must reproduce their syndrome
    resid = (errors_hat @ H.T + synds) % 2
    assert (resid[conv] == 0).all()
    assert conv.mean() > 0.8  # most shots converge at this error rate
