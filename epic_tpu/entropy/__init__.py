"""Entropy models and the host entropy-coding interface.

Device side (JAX/XLA): likelihood evaluation, CDF table construction,
quantization, index building. Host side (C++): the sequential rANS coder,
fed with packed numpy buffers — one device->host hand-off per batch instead
of the per-slice Python-list marshalling the reference does
(reference: entropy_models.py:231-239, 280-291).
"""

from .coder import RansCoder, pmf_to_quantized_cdf, pmf_to_quantized_cdf_batch
from .gaussian import GaussianConditional, build_gaussian_cdf_tables, get_scale_table
from .bottleneck import EntropyBottleneck
from .ops import lower_bound, ste_round, quantize_ste

__all__ = [
    "RansCoder",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_batch",
    "GaussianConditional",
    "build_gaussian_cdf_tables",
    "get_scale_table",
    "EntropyBottleneck",
    "lower_bound",
    "ste_round",
    "quantize_ste",
]
