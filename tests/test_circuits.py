import numpy as np
import pytest

from slidingwindowdecoder_tpu.circuits import (
    Circuit,
    PauliFrameSampler,
    build_bb_memory_circuit,
    build_phenomenological_circuit,
    compile_dem,
    propagate_single_fault,
    sample_dem_numpy,
)
from slidingwindowdecoder_tpu.circuits.circuit import NOISE_1Q, NOISE_2Q
from slidingwindowdecoder_tpu.codes import bb_code_by_n


def test_tiny_circuit_dem():
    # one qubit, X error, Z measurement with a detector
    c = Circuit(1)
    c.x_error([0], 0.1)
    c.measure([0])
    c.detector([-1])
    dem = compile_dem(c)
    assert dem.chk.shape == (1, 1)
    assert dem.chk[0, 0] == 1
    assert dem.priors[0] == pytest.approx(0.1)


def test_z_error_invisible_to_z_measurement():
    c = Circuit(1)
    c.z_error([0], 0.1)
    c.measure([0])
    c.detector([-1])
    dem = compile_dem(c)
    assert dem.num_faults == 0


def test_reset_erases_prior_errors():
    c = Circuit(1)
    c.x_error([0], 0.1)
    c.reset([0])
    c.measure([0])
    c.detector([-1])
    assert compile_dem(c).num_faults == 0


def test_cnot_propagation():
    # X on control before CNOT flips both measurements
    c = Circuit(2)
    c.x_error([0], 0.01)
    c.cnot([0], [1])
    c.measure([0, 1])
    c.detector([-2])
    c.detector([-1])
    dem = compile_dem(c)
    assert dem.num_faults == 1
    assert dem.chk[:, 0].tolist() == [1, 1]


def test_merge_xor_rule():
    # two X errors on the same qubit -> one fault with XOR-combined prob
    c = Circuit(1)
    c.x_error([0], 0.1)
    c.x_error([0], 0.2)
    c.measure([0])
    c.detector([-1])
    dem = compile_dem(c)
    assert dem.num_faults == 1
    assert dem.priors[0] == pytest.approx(0.1 * 0.8 + 0.2 * 0.9)


def test_depolarize1_exactness():
    # DEPOLARIZE1 on a measured qubit: X and Y are symptom-equivalent,
    # Z invisible => single fault with prob 2q(1-q) (XOR of two q-mechanisms)
    p = 0.12
    c = Circuit(1)
    c.depolarize1([0], p)
    c.measure([0])
    c.detector([-1])
    dem = compile_dem(c)
    assert dem.num_faults == 1
    q = 0.5 * (1 - np.sqrt(1 - 4 * p / 3))
    assert dem.priors[0] == pytest.approx(2 * q * (1 - q))
    # ground truth: P(X or Y) = 2p/3
    assert dem.priors[0] == pytest.approx(2 * p / 3)


@pytest.fixture(scope="module")
def bb72_circuit():
    code, A_list, B_list = bb_code_by_n(72)
    return code, build_bb_memory_circuit(code, A_list, B_list, p=0.01, num_repeat=3)


@pytest.fixture(scope="module")
def bb72_dem(bb72_circuit):
    _, circ = bb72_circuit
    return compile_dem(circ)


def test_bb72_structure(bb72_circuit, bb72_dem):
    code, circ = bb72_circuit
    r = 3
    assert circ.num_detectors == 36 * (r + 1)
    assert circ.num_measurements == r * 72 + 72
    assert circ.num_observables == code.K == 12
    dem = bb72_dem
    assert dem.chk.shape[0] == 36 * (r + 1)
    assert (dem.priors > 0).all() and (dem.priors < 0.5).all()
    # every detector is touched by at least one fault
    assert dem.chk.sum(axis=1).min() > 0


def test_bb144_dem_shape_matches_reference():
    # Golden structural number: stim produces a 936 x 8784 check matrix for
    # the [[144,12,12]] code at 12 rounds, z basis (SURVEY.md §2.4 / IBM.ipynb
    # cell 3). Our independent DEM compiler must reproduce it exactly.
    code, A_list, B_list = bb_code_by_n(144)
    circ = build_bb_memory_circuit(code, A_list, B_list, p=0.004, num_repeat=12)
    dem = compile_dem(circ)
    assert dem.chk.shape == (936, 8784)
    assert dem.obs.shape[0] == 12


def test_single_fault_signatures_match_frame_sim(bb72_circuit, bb72_dem, rng):
    """Inject elementary faults into the frame simulator; the resulting
    detector/observable pattern must equal the DEM compiler's signature."""
    code, circ = bb72_circuit
    noise_insts = [
        (i, inst)
        for i, inst in enumerate(circ.instructions)
        if inst.name in NOISE_1Q | NOISE_2Q
    ]
    picks = rng.choice(len(noise_insts), size=25, replace=False)
    for pick in picks:
        inst_index, inst = noise_insts[pick]
        k = inst.num_targets()
        target_index = int(rng.integers(k))
        if inst.name in NOISE_2Q:
            pauli = ["IX", "XZ", "YY", "ZI", "XY"][int(rng.integers(5))]
        elif inst.name == "DEPOLARIZE1":
            pauli = "XYZ"[int(rng.integers(3))]
        else:
            pauli = {"X_ERROR": "X", "Z_ERROR": "Z", "Y_ERROR": "Y"}[inst.name]

        sig = propagate_single_fault(circ, inst_index, target_index, pauli)

        def injector(idx, cur, x, z):
            if idx != inst_index:
                return
            t = cur.targets
            if t.ndim == 2:
                pairs = ((t[0][target_index], pauli[0]), (t[1][target_index], pauli[1]))
            else:
                pairs = ((t[target_index], pauli),)
            for q, pp in pairs:
                if pp in ("X", "Y"):
                    x[:, q] ^= True
                if pp in ("Z", "Y"):
                    z[:, q] ^= True

        det, obs = PauliFrameSampler(circ, seed=0).sample(1, fault_injector=injector)
        observed = np.concatenate([det[0], obs[0]])
        assert np.array_equal(observed, sig), (
            f"fault at inst {inst_index} ({inst.name}, slot {target_index}, "
            f"{pauli}) mismatch"
        )


def test_frame_vs_dem_sampler_statistics(bb72_circuit, bb72_dem):
    """The frame simulator (raw channels) and the DEM sampler (independent
    mechanisms) must produce identical detector marginals up to MC error."""
    code, circ = bb72_circuit
    dem = bb72_dem
    shots = 4000
    det_f, _ = PauliFrameSampler(circ, seed=7).sample(shots)
    det_d, _, _ = sample_dem_numpy(dem, shots, np.random.default_rng(11))
    mean_f = det_f.mean(axis=0)
    mean_d = det_d.mean(axis=0)
    # detector firing rates ~ a few %, MC std ~ sqrt(p/shots) ~ 3e-3
    assert np.abs(mean_f - mean_d).max() < 0.025
    assert np.abs(mean_f.mean() - mean_d.mean()) < 0.003


def test_phenomenological_circuit():
    code, _, _ = bb_code_by_n(72)
    circ = build_phenomenological_circuit(code.hx, code.lx, 0.03, 1e-3, 3)
    dem = compile_dem(circ)
    assert circ.num_detectors == 36 * 4
    assert dem.num_faults > 0


def test_builder_variants_compile():
    # use_both and HZH schedule variants produce valid DEMs
    code, A, B = bb_code_by_n(72)
    for kw in ({"use_both": True}, {"HZH": True}, {"z_basis": False, "use_both": True}):
        circ = build_bb_memory_circuit(code, A, B, p=0.005, num_repeat=2, **kw)
        dem = compile_dem(circ)
        assert dem.num_faults > 0
        assert dem.chk.sum(axis=1).min() > 0
