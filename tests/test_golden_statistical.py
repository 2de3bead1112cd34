"""Statistical golden-number regression tests against the reference's
committed notebook outputs (BASELINE.md). Marked slow — run explicitly with

    python -m pytest tests/test_golden_statistical.py -m slow -q

(preferably on the TPU; they take minutes each on CPU).
Acceptance is a two-proportion z-test at 3 sigma, not exact equality
(SURVEY.md §4: the reference's own QA is statistical reproduction).
Shot counts are sized so a 2x LER regression fails the test.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.utils.metrics import rates_compatible

pytestmark = pytest.mark.slow


def test_golden_144_w3_bposd():
    # BASELINE.md row 1: LER/r 2.14e-3 => LER 254/10^4 at r=12
    from slidingwindowdecoder_tpu.harness.circuit_level import sliding_window_decoder

    shots = 16384
    res = sliding_window_decoder(
        N=144, p=0.004, num_repeat=12, num_shots=shots, max_iter=200,
        W=3, F=1, method=1, osd_method="osd_cs", osd_order=10,
        seed=99, verbose=False,
    )
    assert rates_compatible(res["num_failed"], shots, 254, 10000), res


def test_golden_144_w3_gdg():
    # BASELINE.md row 11: [[144]] SW GDG W=3 p=0.005 r=12: LER/r 6.92e-3
    # => LER = 1-(1-6.92e-3)^12 ~= 0.080
    from slidingwindowdecoder_tpu.harness.circuit_level import sliding_window_gdg

    shots = 8192
    res = sliding_window_gdg(
        N=144, p=0.005, num_repeat=12, num_shots=shots, max_iter=8,
        W=3, F=1, seed=42, verbose=False,
    )
    expect = round((1 - (1 - 6.92e-3) ** 12) * 5000)  # reference counts /5e3
    assert rates_compatible(res["num_failed"], shots, expect, 5000), res


def test_golden_shyps_window():
    # BASELINE.md row 19: SHYPS r=3 window, p=0.001, r=4: LER/r 2.13e-3
    from slidingwindowdecoder_tpu.harness.shyps import decode_shyps

    shots = 16384
    res = decode_shyps(
        r=3, p=0.001, num_repeat=4, num_shots=shots, max_iter=1000,
        osd_order=0, window=True, W=3, F=1, seed=7, verbose=False,
    )
    expect = round((1 - (1 - 2.13e-3) ** 4) * 20000)
    assert rates_compatible(res["num_failed"], shots, expect, 20000), res
