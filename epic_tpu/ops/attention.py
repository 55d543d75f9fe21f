"""Swin-style windowed attention blocks (NHWC).

Reference behavior: src/layers/win_attention.py (W-MSA / SW-MSA with
relative position bias, cyclic shift + computed attention mask) and the
STF gating wrapper src/layers/layers.py:30-74 (trunk of residual units gated
by a sigmoid attention branch).

TPU notes: windows are 4x4 / 8x8, so attention matrices are tiny (16/64
tokens); the heavy lifting is the qkv/proj matmuls, which XLA maps to the
MXU. Shift masks and relative-position indexes are static (computed with
numpy at trace time) so nothing data-dependent enters the graph.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import conv1x1, conv3x3


def window_partition(x, window: int):
    """[B,H,W,C] -> [B*nW, window*window, C]"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows, window: int, h: int, w: int):
    """[B*nW, window*window, C] -> [B,H,W,C]"""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(window: int) -> np.ndarray:
    """Static [window^2, window^2] index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))          # [2, w, w]
    flat = coords.reshape(2, -1)                            # [2, w*w]
    rel = flat[:, :, None] - flat[:, None, :]               # [2, n, n]
    rel = rel.transpose(1, 2, 0)                            # [n, n, 2]
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                                      # [n, n]


def _shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Static SW-MSA mask: [nW, n, n] of 0 / -100 (reference:
    win_attention.py:159-177)."""
    img = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = img.reshape(1, h // window, window, w // window, window, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Multi-head self-attention inside one window with relative bias."""

    dim: int
    window: int
    num_heads: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None):
        """x: [B_, n, C] with n = window^2; mask: [nW, n, n] or None."""
        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim ** -0.5

        qkv = nn.Dense(3 * c, use_bias=True, name="qkv",
                       dtype=self.dtype)(x)
        qkv = qkv.reshape(b_, n, 3, heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]            # [B_, heads, n, hd]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, heads),
        )
        idx = _relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(b_, heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, name="proj", dtype=self.dtype)(out)


class WinBasedAttention(nn.Module):
    """One W-MSA or SW-MSA block with residual (reference:
    win_attention.py:118-207)."""

    dim: int
    num_heads: int = 8
    window: int = 8
    shift: int = 0
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        if self.shift > 0:
            mask = _shift_attn_mask(h, w, self.window, self.shift)
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        else:
            mask = None
        xw = window_partition(x, self.window)
        xw = WindowAttention(self.dim, self.window, self.num_heads,
                             self.dtype, name="attn")(xw, mask)
        x = window_reverse(xw, self.window, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        return shortcut + x


class ResidualUnit(nn.Module):
    """1x1 -> GELU -> 3x3 -> GELU -> 1x1 bottleneck with residual + GELU
    (reference: layers.py:30-48)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n = self.features
        y = conv1x1(n // 2, dtype=self.dtype)(x)
        y = jax.nn.gelu(y)
        y = conv3x3(n // 2, dtype=self.dtype)(y)
        y = jax.nn.gelu(y)
        y = conv1x1(n, dtype=self.dtype)(y)
        return jax.nn.gelu(x + y)


class WinNoShiftAttention(nn.Module):
    """STF attention wrapper: residual trunk gated by sigmoid of a windowed
    attention branch (reference: layers.py:50-74)."""

    dim: int
    num_heads: int = 8
    window: int = 8
    shift: int = 0
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        n = self.dim
        a = x
        for i in range(3):
            a = ResidualUnit(n, self.dtype, name=f"trunk_{i}")(a)
        b = WinBasedAttention(n, self.num_heads, self.window, self.shift,
                              self.dtype, name="attn_block")(x)
        for i in range(3):
            b = ResidualUnit(n, self.dtype, name=f"branch_{i}")(b)
        b = conv1x1(n, dtype=self.dtype)(b)
        return x + a * jax.nn.sigmoid(b)
