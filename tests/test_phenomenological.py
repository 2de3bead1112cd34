import numpy as np
import pytest

jax = pytest.importorskip("jax")

from slidingwindowdecoder_tpu.codes import bb_code_by_n
from slidingwindowdecoder_tpu.decoders import BPOSD, GDG
from slidingwindowdecoder_tpu.harness.phenomenological import decode_phenomenological


def test_phenomenological_osd_vs_gdg():
    code, _, _ = bb_code_by_n(72)
    res = decode_phenomenological(
        code,
        p=0.02,
        p_synd=1e-3,
        num_shots=400,
        decoder_builders={
            "bposd": lambda pcm, pr: BPOSD(
                pcm, pr, max_iter=60, ms_scaling_factor=0.625,
                osd_method="osd_cs", osd_order=4,
            ),
            "gdg": lambda pcm, pr: GDG(
                pcm, pr, max_iter=24, ms_scaling_factor=0.625,
                gdg_factor=0.625, max_step=30, low_error_mode=True,
                ensemble_bucket=16,
            ),
        },
        batch_size=200,
        seed=17,
        verbose=False,
    )
    assert res["bposd"]["shots"] == 400
    # both decode the large majority at these rates on [[72]]
    assert res["bposd"]["ler"] < 0.1
    assert res["gdg"]["ler"] < 0.1
