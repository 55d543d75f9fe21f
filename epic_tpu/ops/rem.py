"""Rate Enhancement Module blocks.

Reference behavior: src/layers/rem.py — LeakyReLU residual conv blocks and
LatentRateReduction: three encoders (checkpoint latent, base entropy params,
progressive entropy params) fused by a trunk whose output, gated by the
variance attention mask, residually refines the progressive entropy params.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .conv import conv1x1, conv3x3


class ResidualBlockSmall(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = conv3x3(self.features)(x)
        y = nn.leaky_relu(y)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features)(x)
        return x + y


class ResidualBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = conv3x3(self.features)(x)
        y = nn.leaky_relu(y)
        y = conv3x3(self.features)(y)
        y = nn.leaky_relu(y)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features)(x)
        return x + y


def _conv_from_params(p, x, padding):
    import jax

    return jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


def _res_block_apply(p, x):
    """Pure-function ResidualBlock matching the flax module's ops/order
    bitwise (Conv_0/Conv_1 3x3, optional Conv_2 1x1 projection)."""
    y = _conv_from_params(p["Conv_0"], x, [(1, 1), (1, 1)])
    y = nn.leaky_relu(y)
    y = _conv_from_params(p["Conv_1"], y, [(1, 1), (1, 1)])
    y = nn.leaky_relu(y)
    if "Conv_2" in p:
        x = _conv_from_params(p["Conv_2"], x, [(0, 0), (0, 0)])
    return x + y


def lrr_apply(params, x_base, params_base, params_prog, att_mask):
    """Flax-free application of a LatentRateReduction param subtree.

    Used to run ONE slice of an nn.vmap-stacked REM bank (take(i) on the
    stacked leaves gives a plain LRR tree) inside codec programs and scan
    bodies, where constructing a flax module is not allowed. Mirrors
    LatentRateReduction.__call__ exactly (same ops, same order)."""
    f_base = x_base
    i = 0
    while f"enc_base_rep_{i}" in params:
        f_base = _res_block_apply(params[f"enc_base_rep_{i}"], f_base)
        i += 1
    f_ent_base = params_base
    i = 0
    while f"enc_base_entropy_{i}" in params:
        f_ent_base = _res_block_apply(params[f"enc_base_entropy_{i}"],
                                      f_ent_base)
        i += 1
    f_ent_prog = params_prog
    i = 0
    while f"enc_prog_entropy_{i}" in params:
        f_ent_prog = _res_block_apply(params[f"enc_prog_entropy_{i}"],
                                      f_ent_prog)
        i += 1
    fused = jnp.concatenate([f_base, f_ent_base, f_ent_prog], axis=-1)
    i = 0
    while f"fuse_{i}" in params:
        fused = _res_block_apply(params[f"fuse_{i}"], fused)
        i += 1
    return params_prog + fused * att_mask


class LatentRateReduction(nn.Module):
    """Refine progressive (mu, sigma) from an already-decoded checkpoint
    latent (reference: rem.py:69-141).

    Inputs (NHWC):
      x_base:      [B,H,W,N]      checkpoint latent slice
      params_base: [B,H,W,2N]     base mu||sigma
      params_prog: [B,H,W,2N|N]   progressive mu||sigma (or sigma only)
      att_mask:    same channels as the output; the variance mask at the
                   target quality, duplicated for mu||sigma when mu_std
    Output: refined params_prog (residual add, masked).
    """

    dim_chunk: int = 32
    mu_std: bool = True
    dimension: str = "middle"  # "middle" (2/3 blocks) or "big" (3/4)

    @nn.compact
    def __call__(self, x_base, params_base, params_prog, att_mask):
        n = self.dim_chunk
        depth = 3 if self.dimension == "big" else 2

        f_base = x_base
        for i in range(depth):
            f_base = ResidualBlock(n, name=f"enc_base_rep_{i}")(f_base)

        f_ent_base = params_base
        for i in range(depth):
            f_ent_base = ResidualBlock(
                n, name=f"enc_base_entropy_{i}")(f_ent_base)

        f_ent_prog = params_prog
        for i in range(depth):
            f_ent_prog = ResidualBlock(
                n, name=f"enc_prog_entropy_{i}")(f_ent_prog)

        out_ch = 2 * n if self.mu_std else n
        fused = jnp.concatenate([f_base, f_ent_base, f_ent_prog], axis=-1)
        widths = [2 * n] * depth + [out_ch]
        for i, wd in enumerate(widths):
            fused = ResidualBlock(wd, name=f"fuse_{i}")(fused)
        return params_prog + fused * att_mask
