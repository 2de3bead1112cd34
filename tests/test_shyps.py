import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.circuits import compile_dem
from slidingwindowdecoder_tpu.circuits.shyps import build_shyps_circuit, build_shyps_code
from slidingwindowdecoder_tpu.harness.shyps import decode_shyps


def test_shyps_code_structure():
    code = build_shyps_code(3)
    n_r = 7
    assert code.N == 49
    assert code.S_X.shape == (3 * n_r, 49)
    assert code.S_Z.shape == (3 * n_r, 49)
    assert code.gauge_X.shape == (49, 49)
    # aggregation identity: S_X = aggregate_X @ gauge_X over GF(2)
    assert np.array_equal(
        (code.aggregate_X.astype(int) @ code.gauge_X.astype(int)) % 2, code.S_X
    )
    assert np.array_equal(
        (code.aggregate_Z.astype(int) @ code.gauge_Z.astype(int)) % 2, code.S_Z
    )
    # logicals anti-commute pairwise canonically: L_X @ L_Z.T = I_{r^2}
    pairing = (code.L_X.astype(int) @ code.L_Z.astype(int).T) % 2
    assert np.array_equal(pairing, np.eye(9, dtype=int))


def test_shyps_circuit_dem():
    r, num_repeat = 3, 3
    circuit, code = build_shyps_circuit(r, 0.002, num_repeat)
    n_det_round = r * (2**r - 1)
    # per-round detectors + final stabilizer detectors
    assert circuit.num_detectors == n_det_round * (num_repeat + 1)
    assert circuit.num_observables == r * r
    dem = compile_dem(circuit)
    assert dem.num_faults > 0
    assert (dem.priors > 0).all()
    # every detector touched
    assert dem.chk.sum(axis=1).min() > 0


def test_shyps_window_decoding():
    res = decode_shyps(
        r=3, p=0.001, num_repeat=4, num_shots=300, max_iter=60,
        osd_order=0, window=True, W=3, F=1, seed=4, verbose=False,
    )
    # reference LER/r at these settings is ~2.1e-3 (SHYPS.ipynb cell 2);
    # with 300 shots allow generous slack
    assert res["ler_per_round"] < 0.02


def test_shyps_global_decoding():
    res = decode_shyps(
        r=3, p=0.001, num_repeat=3, num_shots=200, max_iter=60,
        osd_order=0, window=False, seed=5, verbose=False,
    )
    assert res["ler_per_round"] < 0.02
