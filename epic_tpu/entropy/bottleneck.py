"""Factorized-prior entropy bottleneck (Ballé et al.), TPU-native flax module.

Reference behavior: src/entropy_models/entropy_models.py:297-525
(EntropyBottleneck): a learned monotone per-channel CDF parameterized by
matrix/bias/factor stacks, trainable quantiles with an auxiliary loss, and
quantized-CDF table construction for the host rANS coder.

Layout note: epic_tpu is NHWC end to end (TPU-native); the per-channel
density evaluation reshapes to [C, 1, B*H*W] internally.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .ops import lower_bound
from .coder import pmf_to_quantized_cdf_batch
from .gaussian import CdfTables


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        c = self.channels
        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / f[i + 1]))
            matrices.append(self.param(
                f"matrix_{i}",
                lambda key, shape, v=init: jnp.full(shape, v, jnp.float32),
                (c, f[i + 1], f[i]),
            ))
            biases.append(self.param(
                f"bias_{i}",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -0.5, 0.5),
                (c, f[i + 1], 1),
            ))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor_{i}", nn.initializers.zeros, (c, f[i + 1], 1)))
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale],
                          jnp.float32), (shape[0], 1, 1)),
            (c, 1, 3),
        )

    # -- density -----------------------------------------------------------

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: [C, 1, N] -> logits of the cumulative at each input."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = self._matrices[i]
            bias = self._biases[i]
            if stop_gradient:
                matrix = jax.lax.stop_gradient(matrix)
                bias = jax.lax.stop_gradient(bias)
            logits = jnp.einsum(
                "cof,cfn->con", jax.nn.softplus(matrix), logits)
            logits = logits + bias
            if i < len(self.filters):
                factor = self._factors[i]
                if stop_gradient:
                    factor = jax.lax.stop_gradient(factor)
                logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
        return logits

    def _likelihood(self, inputs):
        lower = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def medians(self):
        return self.quantiles[:, :, 1:2]  # [C, 1, 1]

    def __call__(self, x, training: bool = True, rng=None):
        """x: NHWC. Returns (x_tilde, likelihoods), both NHWC."""
        b, h, w, c = x.shape
        values = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)
        medians = self.medians()
        if training:
            if rng is None:
                rng = self.make_rng("noise")
            noise = jax.random.uniform(rng, values.shape, values.dtype,
                                       -0.5, 0.5)
            outputs = values + noise
        else:
            outputs = jnp.round(values - medians) + medians
        likelihood = self._likelihood(outputs)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(likelihood, self.likelihood_bound)

        def unshape(t):
            return jnp.transpose(t.reshape(c, b, h, w), (1, 2, 3, 0))

        return unshape(outputs), unshape(likelihood)

    def aux_loss(self):
        """Quantile-fitting loss (reference: entropy_models.py:398-401)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2 / self.tail_mass - 1)
        target = jnp.array([-t, 0.0, t], jnp.float32)[None, None, :]
        return jnp.abs(logits - target).sum()

    # -- update() support: pmf evaluation on device ------------------------

    def update_support(self):
        """Returns (quantiles [C,3]) for the host to size the pmf grid."""
        return self.quantiles[:, 0, :]

    def pmf_grid(self, pmf_start, max_length: int):
        """pmf_start: [C]. Evaluates pmf and tail mass on a [C, max_length]
        integer grid (reference: entropy_models.py:374-391)."""
        samples = (jnp.arange(max_length, dtype=jnp.float32)[None, None, :]
                   + pmf_start[:, None, None])
        lower = self._logits_cumulative(samples - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        pmf = pmf[:, 0, :]
        tail = (jax.nn.sigmoid(lower[:, 0, :1])
                + jax.nn.sigmoid(-upper[:, 0, -1:]))
        return pmf, tail


def build_bottleneck_cdf_tables(module: EntropyBottleneck, variables,
                                precision: int = 16):
    """Host-side update(): build quantized CDF tables + per-channel medians.

    Mirrors reference entropy_models.py:358-396 but evaluates the pmf grid
    in one jitted device call and quantizes all channels in one batched C++
    call. Returns (CdfTables, medians float32 [C]).
    """
    quantiles = np.asarray(jax.device_get(
        module.apply(variables, method=EntropyBottleneck.update_support)))
    medians = quantiles[:, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0]).astype(np.int32), 0,
                     None)
    maxima = np.clip(np.ceil(quantiles[:, 2] - medians).astype(np.int32), 0,
                     None)
    pmf_start = medians - minima
    pmf_length = (maxima + minima + 1).astype(np.int32)
    max_length = int(pmf_length.max())

    pmf, tail = module.apply(
        variables, jnp.asarray(pmf_start, jnp.float32), max_length,
        method=EntropyBottleneck.pmf_grid)
    pmf = np.asarray(jax.device_get(pmf), dtype=np.float32)
    tail = np.asarray(jax.device_get(tail), dtype=np.float32)

    c = pmf.shape[0]
    padded = np.zeros((c, max_length + 1), dtype=np.float32)
    for i in range(c):
        n = int(pmf_length[i])
        padded[i, :n] = pmf[i, :n]
        padded[i, n] = tail[i, 0]
    cdf = pmf_to_quantized_cdf_batch(padded, pmf_length + 1, precision)
    tables = CdfTables(
        quantized_cdf=cdf.astype(np.int32),
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-minima).astype(np.int32),
    )
    return tables, medians.astype(np.float32)
