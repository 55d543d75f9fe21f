"""Neural building blocks (NHWC, TPU-first).

TPU-native counterparts of the reference layer library
(src/layers/: conv helpers, GDN, window attention, ChannelMask, REM blocks).
Everything is flax.linen over NHWC tensors; channel mixing ops are expressed
as matmuls/einsums so XLA tiles them onto the MXU.
"""

from .conv import conv, deconv, conv1x1, conv3x3, SubpelConv
from .gdn import GDN, GDN1
from .attention import WinBasedAttention, WinNoShiftAttention, ResidualUnit
from .masking import (
    variance_mask,
    prog_mask,
    apply_noise_mask,
    delta_shell_mask,
)
from .rem import ResidualBlock, ResidualBlockSmall, LatentRateReduction

__all__ = [
    "conv", "deconv", "conv1x1", "conv3x3", "SubpelConv",
    "GDN", "GDN1",
    "WinBasedAttention", "WinNoShiftAttention", "ResidualUnit",
    "variance_mask", "prog_mask", "apply_noise_mask", "delta_shell_mask",
    "ResidualBlock", "ResidualBlockSmall", "LatentRateReduction",
]
