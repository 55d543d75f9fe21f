"""Conditional Gaussian entropy model, TPU-native.

Reference behavior: src/entropy_models/entropy_models.py:528-673
(GaussianConditional) — likelihood via the standardized normal CDF, scales
clamped from below at 0.11, a 64-entry log-spaced scale table
(reference: models/pic.py:12-18), per-bucket quantized CDF tables for the
host rANS coder.

Everything differentiable or data-parallel lives here as pure jittable
functions; only the final pmf->integer-CDF quantization runs on the host
(C++, batched).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .ops import lower_bound
from .coder import pmf_to_quantized_cdf_batch

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
_TAIL_MASS = 1e-9


def get_scale_table(minimum: float = SCALES_MIN, maximum: float = SCALES_MAX,
                    levels: int = SCALES_LEVELS) -> np.ndarray:
    """64 log-spaced scales in [0.11, 256] (reference: pic.py:17-18)."""
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels,
                              dtype=np.float64)).astype(np.float32)


def _standardized_cumulative(x):
    """Phi(x) via erfc for numerical stability in the upper tail."""
    return 0.5 * jax.lax.erfc(-(2 ** -0.5) * x)


def _standardized_quantile(q: float) -> float:
    """Host-side Phi^-1(q) (reference uses scipy.stats.norm.ppf)."""
    from scipy.stats import norm  # scipy ships with the baked-in env

    return float(norm.ppf(q))


def gaussian_likelihood(inputs, scales, means=None,
                        scale_bound: float = SCALES_MIN,
                        likelihood_bound: float = 1e-9):
    """P(round-to-int bin of (inputs - means)) under N(0, scales^2).

    Mirrors reference entropy_models.py:620-652 (incl. the LowerBound on
    scales and on the likelihood).
    """
    values = inputs - means if means is not None else inputs
    scales = lower_bound(scales, scale_bound)
    values = jnp.abs(values)
    upper = _standardized_cumulative((0.5 - values) / scales)
    lower = _standardized_cumulative((-0.5 - values) / scales)
    likelihood = upper - lower
    if likelihood_bound > 0:
        likelihood = lower_bound(likelihood, likelihood_bound)
    return likelihood


def gaussian_noise_quantize(rng, inputs, mask=None):
    """Training-time additive-uniform-noise 'quantization'; optional mask
    zeroes the noise where elements are not transmitted
    (reference: entropy_models.py:132-138)."""
    noise = jax.random.uniform(rng, inputs.shape, inputs.dtype, -0.5, 0.5)
    if mask is not None:
        noise = noise * mask
    return inputs + noise


def build_indexes(scales, scale_table, scale_bound: float = SCALES_MIN):
    """Map each scale to its table bucket (reference:
    entropy_models.py:654-659): smallest table entry >= scale."""
    scales = lower_bound(scales, scale_bound)
    table = jnp.asarray(scale_table, dtype=scales.dtype)
    return jnp.sum(scales[..., None] > table[:-1], axis=-1).astype(jnp.int32)


def _gaussian_pmf_device(scale_table: jnp.ndarray, pmf_center: jnp.ndarray,
                         max_length: int):
    """Per-bucket pmf over [-center, center], computed on device.

    Returns (pmf [levels, max_length], tail_mass [levels, 1]).
    Reference: entropy_models.py:591-611.
    """
    samples = jnp.abs(
        jnp.arange(max_length, dtype=jnp.int32)[None, :] - pmf_center[:, None]
    ).astype(jnp.float32)
    s = scale_table[:, None].astype(jnp.float32)
    upper = _standardized_cumulative((0.5 - samples) / s)
    lower = _standardized_cumulative((-0.5 - samples) / s)
    pmf = upper - lower
    tail_mass = 2.0 * lower[:, :1]
    return pmf, tail_mass


@dataclass
class CdfTables:
    """The (quantized_cdf, cdf_length, offset) triple fed to the host coder —
    the same registered-buffer layout as the reference
    (entropy_models.py:98-101)."""

    quantized_cdf: np.ndarray  # int32 [num_tables, max_len]
    cdf_length: np.ndarray     # int32 [num_tables]
    offset: np.ndarray         # int32 [num_tables]


def build_gaussian_cdf_tables(scale_table=None,
                              tail_mass: float = _TAIL_MASS,
                              precision: int = 16) -> CdfTables:
    """Build quantized CDF tables for every scale bucket.

    The pmf evaluation runs on device (one fused XLA computation over the
    whole table), then a single host transfer feeds the batched C++
    quantizer. Reference: entropy_models.py:591-618 + per-row C++ calls at
    entropy_models.py:175-183; ours is one batched call.
    """
    if scale_table is None:
        scale_table = get_scale_table()
    scale_table = np.asarray(scale_table, dtype=np.float32)
    multiplier = -_standardized_quantile(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    pmf, tail = jax.jit(
        _gaussian_pmf_device, static_argnums=2
    )(jnp.asarray(scale_table), jnp.asarray(pmf_center), max_length)
    pmf = np.asarray(jax.device_get(pmf), dtype=np.float32)
    tail = np.asarray(jax.device_get(tail), dtype=np.float32)

    # Row i: pmf_length[i] real symbols + 1 tail slot -> quantize together.
    m = scale_table.shape[0]
    padded = np.zeros((m, max_length + 1), dtype=np.float32)
    for i in range(m):
        n = int(pmf_length[i])
        padded[i, :n] = pmf[i, :n]
        padded[i, n] = tail[i, 0]
    cdf = pmf_to_quantized_cdf_batch(padded, pmf_length + 1, precision)
    return CdfTables(
        quantized_cdf=cdf.astype(np.int32),
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-pmf_center).astype(np.int32),
    )


@dataclass
class GaussianConditional:
    """Bundles the scale table, its CDF tables, and the pure-fn API."""

    scale_table: np.ndarray = field(default_factory=get_scale_table)
    scale_bound: float = SCALES_MIN
    likelihood_bound: float = 1e-9
    tail_mass: float = _TAIL_MASS
    tables: CdfTables | None = None

    def update(self, scale_table=None, force: bool = False) -> "GaussianConditional":
        if scale_table is not None:
            self.scale_table = np.asarray(scale_table, dtype=np.float32)
        if self.tables is None or force or scale_table is not None:
            self.tables = build_gaussian_cdf_tables(
                self.scale_table, self.tail_mass
            )
        return self

    # jittable
    def likelihood(self, inputs, scales, means=None):
        return gaussian_likelihood(inputs, scales, means,
                                   self.scale_bound, self.likelihood_bound)

    # jittable
    def build_indexes(self, scales):
        return build_indexes(scales, self.scale_table, self.scale_bound)

    def coder(self, nthreads: int | None = None):
        from .coder import RansCoder

        if self.tables is None:
            raise ValueError("run update() before entropy coding")
        t = self.tables
        return RansCoder(t.quantized_cdf, t.cdf_length, t.offset,
                         nthreads=nthreads)
