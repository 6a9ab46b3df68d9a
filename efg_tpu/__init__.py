"""efg_tpu — a TPU-native (JAX / XLA / Pallas / pjit) research framework for 3D/2D
detection, tracking and segmentation, with the capability surface of V2AI/EFG.

Built from scratch for TPU: fixed-shape batched pipelines, jit-compiled functional
training steps, gather-GEMM sparse convolution on the MXU, and `jax.sharding`-based
data parallelism over ICI.
"""

__version__ = "0.1.0"
