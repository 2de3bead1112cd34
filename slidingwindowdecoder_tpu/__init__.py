"""slidingwindowdecoder_tpu — a TPU-native sliding-window QLDPC decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
gongaa/SlidingWindowDecoder: CSS code construction, syndrome-extraction
circuit building + detector-error-model compilation, batched min-sum BP,
batched GF(2) OSD, guided-decimation (BPGD/GDG) ensembles, and (W,F)
sliding-window orchestration — all as fixed-shape batched device kernels
sharded over shots on TPU meshes.
"""

__version__ = "0.1.0"
