"""Quality metrics: PSNR and MS-SSIM (and its dB form).

Reference behavior: utility/functions.py:172-177 (PSNR, pytorch_msssim) and
step.py:323-324 (MS-SSIM in dB = -10*log10(1-msssim)). MS-SSIM is
implemented here in JAX (no pytorch_msssim in this environment): the
standard 5-scale MS-SSIM with the Wang et al. weights, 11x11 Gaussian
window (sigma 1.5), computed per channel and averaged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def compute_psnr(a, b, data_range: float = 1.0) -> float:
    mse = float(jnp.mean((jnp.asarray(a) - jnp.asarray(b)) ** 2))
    if mse <= 0:
        return float("inf")
    return 10.0 * math.log10(data_range ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (xs / sigma) ** 2)
    g = g / g.sum()
    return g


def _filter2d(x, kernel1d):
    """Separable valid-mode Gaussian filter over NHWC.

    HIGHEST precision is load-bearing: at the TPU's default conv
    precision f32 inputs are rounded to bf16 in the MXU, and the
    E[x^2]-mu^2 variance terms downstream cancel catastrophically
    (observed: msssim=1.0 spikes / non-monotone junk on TPU while the
    same code is exact on CPU). Metric cost is negligible.
    """
    c = x.shape[-1]
    # depthwise via grouped conv
    k_h = jnp.tile(kernel1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    k_w = jnp.tile(kernel1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, k_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(
        y, k_w, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return y


def _ssim_components(x, y, data_range: float = 1.0):
    """Per-(batch, channel) spatial means of the SSIM and CS maps.

    pytorch_msssim keeps ssim/cs per channel through the scale pyramid
    (relu'd per channel, weighted product per channel, channel-averaged at
    the END) — a whole-batch scalar mean here would let one negative mean
    zero the product for every image at once.
    """
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    w = _gaussian_kernel()
    mu_x = _filter2d(x, w)
    mu_y = _filter2d(y, w)
    sxx = _filter2d(x * x, w) - mu_x * mu_x
    syy = _filter2d(y * y, w) - mu_y * mu_y
    sxy = _filter2d(x * y, w) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return ssim.mean(axis=(1, 2)), cs.mean(axis=(1, 2))


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


@jax.jit
def _ms_ssim_jit(x, y):
    # f32 INSIDE the jit: callers hand us bfloat16 x_hat straight from the
    # codec, and x*x in bf16 makes E[x^2]-mu^2 cancel catastrophically
    # (observed: BENCH_r03 msssim_db of 120/-0.0).
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    levels = len(_MSSSIM_WEIGHTS)
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim_components(x, y)   # (N, C) each
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    mcs_stack = jnp.stack(mcs)                  # (levels-1, N, C)
    per_ch = (jnp.prod(mcs_stack ** weights[:-1, None, None], axis=0)
              * jnp.maximum(ssim_val, 0.0) ** weights[-1])
    return per_ch.mean()


def compute_msssim(a, b) -> float:
    """MS-SSIM over NHWC float images in [0,1]; needs H,W >= 176."""
    return float(_ms_ssim_jit(jnp.asarray(a), jnp.asarray(b)))


def msssim_db(msssim: float) -> float:
    """-10*log10(1 - msssim) (reference: step.py:323-324)."""
    return -10.0 * math.log10(max(1.0 - msssim, 1e-12))


class AverageMeter:
    """Running average (reference: functions.py:88-101)."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
