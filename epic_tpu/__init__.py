"""epic_tpu — TPU-native progressive image compression with variance-aware
masking.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the WACV'25
"Efficient Progressive Image Compression with Variance-aware Masking"
reference implementation (PyTorch/CUDA/CompressAI). Compute path: jitted
NHWC flax transforms on TPU; entropy coding: batched C++ rANS on the TPU-VM
host; scaling: jax.sharding meshes over ICI.

Quick API:
    from epic_tpu import get_model, PICCodec
    model = get_model("pic")
    params = model.init({"params": key}, x, method="init_all")["params"]
    codec = PICCodec(model, {"params": params})
    bitstream = codec.compress(x, quality=2.5)
    out = codec.decompress(bitstream)
"""

__version__ = "0.1.0"

from .models import get_model, MODELS, VarianceMaskingPIC, \
    VarianceMaskingPICREM  # noqa: E402
from .codec import (PICCodec, progressive_encode, progressive_decode,  # noqa
                    progressive_decode_all, dump_bitstreams,
                    load_bitstreams)

__all__ = [
    "get_model", "MODELS", "VarianceMaskingPIC", "VarianceMaskingPICREM",
    "PICCodec", "progressive_encode", "progressive_decode",
    "progressive_decode_all", "dump_bitstreams", "load_bitstreams",
]
