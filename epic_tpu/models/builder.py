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


def paramnet_apply(kernels, biases, x, i, dtype=None):
    """Pure per-slice application of a stacked ParamNet weight set.

    kernels: tuple of [S,3,3,in,w] arrays; biases: tuple of [S,w]. ``i``
    may be a static python int or a traced int32 (lax.scan index) — both
    select the same weights, so encoder/decoder bit-identity holds across
    call styles. Kept flax-free so slice chains can lax.scan over it
    without lifted transforms."""
    n_layers = len(kernels)
    for layer in range(n_layers):
        if isinstance(i, int):
            k_i, b_i = kernels[layer][i], biases[layer][i]
        else:
            k_i = jnp.take(kernels[layer], i, axis=0)
            b_i = jnp.take(biases[layer], i, axis=0)
        if dtype is not None:
            x = x.astype(dtype)
            k_i = k_i.astype(dtype)
            b_i = b_i.astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, k_i, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_i
        if layer < n_layers - 1:
            x = jax.nn.gelu(x)
    return x.astype(jnp.float32)


class StackedParamNet(nn.Module):
    """All S per-slice entropy-parameter heads of one kind, stored as ONE
    stacked weight tree with a leading slice axis (kernels [S,3,3,in,w]).

    The reference instantiates a separate 5-layer conv stack per slice with
    a growing first-layer input width (pic.py:83-164). Stacking them (with
    the ragged first-layer widths zero-padded to ``in_width``) lets the
    slice chains run as ONE ``lax.scan`` body instead of S unrolled
    programs — an order-of-magnitude first-compile/init saving — while
    remaining exactly equivalent: callers feed fixed-width support tensors
    whose unused channels are zero, and zero inputs contribute zero through
    the conv regardless of the (also zero-padded) weight rows.
    """

    n_slices: int
    in_width: int
    out_dim: int = 32
    widths: Sequence[int] = (224, 176, 128, 64)
    dtype: object = None

    def setup(self):
        dims = ((self.in_width,) + tuple(self.widths) + (self.out_dim,))
        # same gain-1.0 fan_in scaling as ops.conv.DEFAULT_INIT, with the
        # leading slice axis excluded from the fan computation
        init = nn.initializers.variance_scaling(
            1.0, "fan_in", "normal", in_axis=-2, out_axis=-1,
            batch_axis=(0,))
        kernels, biases = [], []
        for layer in range(len(dims) - 1):
            kernels.append(self.param(
                f"Conv_{layer}_kernel", init,
                (self.n_slices, 3, 3, dims[layer], dims[layer + 1]),
                jnp.float32))
            biases.append(self.param(
                f"Conv_{layer}_bias", nn.initializers.zeros,
                (self.n_slices, dims[layer + 1]), jnp.float32))
        self.kernels = tuple(kernels)
        self.biases = tuple(biases)

    def stacked(self):
        """Raw stacked weights, for flax-free use inside lax.scan."""
        return self.kernels, self.biases

    def __call__(self, x, i):
        return paramnet_apply(self.kernels, self.biases, x, i, self.dtype)


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
