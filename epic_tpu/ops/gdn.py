"""Generalized Divisive Normalization, TPU-native.

y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j,i] * x[j]^2)   (inverse: * sqrt)

Reference behavior: src/layers/gdn.py:26-75 (a 1x1 conv over x^2 with
non-negative reparametrized beta/gamma). Here the channel mixing is a plain
[C,C] matmul over NHWC — exactly what the MXU wants — and the reparam is the
same offset/sqrt scheme (see entropy/ops.py: nn_param_*).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.ops import nn_param_apply, nn_param_init

_BETA_MIN = 1e-6
_GAMMA_INIT = 0.1


class GDN(nn.Module):
    channels: int
    inverse: bool = False
    # None = auto: fused Pallas kernel on TPU backends, einsum elsewhere
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta = self.param(
            "beta",
            lambda key, shape: nn_param_init(jnp.ones(shape), _BETA_MIN),
            (c,),
        )
        gamma = self.param(
            "gamma",
            lambda key, shape: nn_param_init(
                _GAMMA_INIT * jnp.eye(shape[0]), 0.0),
            (c, c),
        )
        beta = nn_param_apply(beta, _BETA_MIN)
        gamma = nn_param_apply(gamma, 0.0)

        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # normalization math stays f32
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() in ("tpu", "axon")
        if use_pallas:
            from .pallas_gdn import gdn_pallas

            return gdn_pallas(x, gamma, beta, self.inverse).astype(in_dtype)
        # norm[..., i] = beta[i] + sum_j x^2[..., j] * gamma[j, i]
        norm = jnp.einsum("bhwj,ji->bhwi", jnp.square(x), gamma) + beta
        out = x * jnp.sqrt(norm) if self.inverse else x * jax.lax.rsqrt(norm)
        return out.astype(in_dtype)


class GDN1(nn.Module):
    """Simplified GDN (Johnston et al. 2019): y = x / (beta + |x| @ gamma)
    (reference: gdn.py:78-105; present in the reference layer library,
    unused by its models)."""

    channels: int
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.channels
        beta = self.param(
            "beta",
            lambda key, shape: nn_param_init(jnp.ones(shape), _BETA_MIN),
            (c,),
        )
        gamma = self.param(
            "gamma",
            lambda key, shape: nn_param_init(
                _GAMMA_INIT * jnp.eye(shape[0]), 0.0),
            (c, c),
        )
        beta = nn_param_apply(beta, _BETA_MIN)
        gamma = nn_param_apply(gamma, 0.0)
        norm = jnp.einsum("bhwj,ji->bhwi", jnp.abs(x), gamma) + beta
        if self.inverse:
            return x * norm
        return x / norm
