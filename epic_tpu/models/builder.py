"""Analysis/synthesis/hyperprior transform stacks (NHWC flax modules).

Reference behavior: src/models/builder.py — g_a = 4x stride-2 conv + GDN +
two windowed-attention blocks (16x downsampling); g_s is the mirror with
transposed convs + IGDN; h_a/h_s are 4x-down/up hyper transforms with GELU
and subpel upsampling; the per-slice entropy parameter nets are 5-layer
3x3 conv stacks 224-176-128-64-32 with GELU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import GDN, SubpelConv, WinNoShiftAttention, conv, conv3x3, deconv


class AnalysisTransform(nn.Module):
    """g_a: image [B,H,W,3] -> latent [B,H/16,W/16,out_dim]."""

    n: int
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n, dt = self.n, self.dtype
        x = conv(n, dtype=dt)(x)
        x = GDN(n)(x)
        x = conv(n, dtype=dt)(x)
        x = GDN(n)(x)
        x = WinNoShiftAttention(n, num_heads=8, window=8, shift=4,
                                dtype=dt)(x)
        x = conv(n, dtype=dt)(x)
        x = GDN(n)(x)
        x = conv(self.out_dim, dtype=dt)(x)
        x = WinNoShiftAttention(self.out_dim, num_heads=8, window=4,
                                shift=2, dtype=dt)(x)
        return x.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """g_s: latent [B,h,w,in_dim] -> image [B,16h,16w,3]."""

    n: int
    in_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n, dt = self.n, self.dtype
        x = WinNoShiftAttention(self.in_dim, num_heads=8, window=4,
                                shift=2, dtype=dt)(x)
        x = deconv(n, dtype=dt)(x)
        x = GDN(n, inverse=True)(x)
        x = deconv(n, dtype=dt)(x)
        x = GDN(n, inverse=True)(x)
        x = WinNoShiftAttention(n, num_heads=8, window=8, shift=4,
                                dtype=dt)(x)
        x = deconv(n, dtype=dt)(x)
        x = GDN(n, inverse=True)(x)
        x = deconv(3, dtype=dt)(x)
        return x.astype(jnp.float32)


class HyperAnalysis(nn.Module):
    """h_a: y [B,h,w,M] -> z [B,h/4,w/4,N]."""

    n: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = conv3x3(320, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(288, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(256, stride=2, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(224, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(self.n, stride=2, dtype=dt)(x)
        return x.astype(jnp.float32)


class HyperSynthesis(nn.Module):
    """h_s branch: z_hat [B,h/4,w/4,N] -> params [B,h,w,out_dim].

    first_width: width of the first conv — 192 in the reference's
    multi-hyperprior branch (builder.py:89), N in the single-hyperprior
    h_mean_s (builder.py:114 conv3x3(N, N))."""

    out_dim: int
    dtype: object = None
    first_width: int = 192

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = conv3x3(self.first_width, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = SubpelConv(224, 2, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(256, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = SubpelConv(288, 2, dtype=dt)(x)
        x = jax.nn.gelu(x)
        x = conv3x3(self.out_dim, dtype=dt)(x)
        return x.astype(jnp.float32)


class ParamNet(nn.Module):
    """Per-slice entropy-parameter head: 3x3 conv stack 224-176-128-64-32
    with GELU (reference: pic.py:83-164). Output is always float32 —
    entropy parameters feed masks/likelihoods/CDF indexing."""

    out_dim: int = 32
    widths: Sequence[int] = (224, 176, 128, 64)
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for w in self.widths:
            x = conv3x3(w, dtype=self.dtype)(x)
            x = jax.nn.gelu(x)
        return conv3x3(self.out_dim, dtype=self.dtype)(x).astype(
            jnp.float32)
