"""ZeroShape-TPU: a TPU-native zero-shot 3D shape reconstruction framework.

Built from scratch in JAX/Flax/Pallas with the capabilities of
zxhuang1698/ZeroShape (CVPR 2024), redesigned for TPU: SPMD data parallelism
over a jax.sharding.Mesh, bf16 matmuls on the MXU, Pallas kernels for
nearest-neighbor (Chamfer) search, and an XLA-native marching-cubes/eval path
that never leaves the device.
"""

__version__ = "0.1.0"
