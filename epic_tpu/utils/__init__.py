"""Utilities: metrics, padding, RD anchors, plotting, config."""

from .metrics import compute_psnr, compute_msssim, msssim_db, AverageMeter
from .padding import compute_padding, pad_image, unpad_image

__all__ = [
    "compute_psnr", "compute_msssim", "msssim_db", "AverageMeter",
    "compute_padding", "pad_image", "unpad_image",
]
