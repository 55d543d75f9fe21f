"""epic_tpu — TPU-native progressive image compression with variance-aware
masking.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the WACV'25
"Efficient Progressive Image Compression with Variance-aware Masking"
reference implementation (PyTorch/CUDA/CompressAI). Compute path: jitted
NHWC flax transforms on TPU; entropy coding: batched C++ rANS on the TPU-VM
host; scaling: jax.sharding meshes over ICI.
"""

__version__ = "0.1.0"
