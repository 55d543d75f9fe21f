"""Convolution helpers (NHWC).

Shape behavior matches the reference's helpers (src/layers/layers.py:5-26,
82-87): stride-2 k=5 convs halve spatial dims exactly, transposed convs
double them, subpel conv = 3x3 conv + pixel shuffle. Weight layout and edge
phase follow JAX conventions — this framework trains its own checkpoints.
"""

from __future__ import annotations

from flax import linen as nn

# Kernel initialization. The reference applies Kaiming-normal (fan_in,
# gain sqrt(2)) to every Conv2d/ConvTranspose2d (src/models/base.py:31-36);
# KAIMING reproduces that and stays available via `kernel_init=`. It is NOT
# the default: under flax's fan conventions the sqrt(2)-per-layer gain
# compounds through the ~20-deep transform stacks and the inverse-GDN
# multiplier (x -> x*sqrt(beta+gamma*x^2), super-exponential once
# activations exceed O(1)) into x_hat ~ 3e4 at init (measured, N=128
# config) — the R-D loss starts at ~2e10 and never recovers. Gain-1.0
# fan_in scaling (He init for linear activations) gives x_hat ~ 0.25 and
# init loss ~5e2. torch's deconv fan convention (out_ch*k*k, weight dim 1)
# differs from flax's (in_ch*k*k), so literal parity is ill-defined anyway;
# stability wins. flax's bias default is already zeros (reference zeroes
# biases too).
KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
DEFAULT_INIT = nn.initializers.variance_scaling(1.0, "fan_in", "normal")


def conv(features: int, kernel_size: int = 5, stride: int = 2,
         dtype=None, kernel_init=DEFAULT_INIT) -> nn.Conv:
    """k x k conv with PyTorch-style p = k//2 padding (out = ceil(in/s))."""
    p = kernel_size // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dtype=dtype,
        kernel_init=kernel_init,
    )


def deconv(features: int, kernel_size: int = 5, stride: int = 2,
           dtype=None, kernel_init=DEFAULT_INIT) -> nn.ConvTranspose:
    """Transposed conv that exactly multiplies spatial dims by `stride`."""
    return nn.ConvTranspose(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding="SAME",
        dtype=dtype,
        kernel_init=kernel_init,
    )


def conv1x1(features: int, stride: int = 1, dtype=None,
            kernel_init=DEFAULT_INIT) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding="VALID", dtype=dtype, kernel_init=kernel_init)


def conv3x3(features: int, stride: int = 1, dtype=None,
            kernel_init=DEFAULT_INIT) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=[(1, 1), (1, 1)], dtype=dtype,
                   kernel_init=kernel_init)


class SubpelConv(nn.Module):
    """3x3 conv to features*r^2 channels + depth-to-space upsampling."""

    features: int
    r: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        r = self.r
        y = conv3x3(self.features * r * r, dtype=self.dtype)(x)
        # depth_to_space: [B,H,W,C*r^2] -> [B,H*r,W*r,C]
        y = y.reshape(b, h, w, r, r, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h * r, w * r, self.features)
