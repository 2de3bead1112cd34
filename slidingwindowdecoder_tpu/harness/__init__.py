from .code_capacity import data_qubit_noise_decoding
from .device_campaign import make_cc_step, run_cc_campaign_device
from .circuit_level import (
    build_bb_window_experiment,
    global_decoder,
    sliding_window_decoder,
    sliding_window_gdg,
)
from .phenomenological import decode_phenomenological
from .depolarizing import depolarizing_decoding
from .shyps import decode_shyps
