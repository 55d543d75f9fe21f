"""Centered padding to a stride multiple (reference:
utility/functions.py:191-218, used to pad inputs to /64)."""

from __future__ import annotations

import jax.numpy as jnp


def compute_padding(in_h: int, in_w: int, *, out_h=None, out_w=None,
                    min_div: int = 64):
    if out_h is None:
        out_h = (in_h + min_div - 1) // min_div * min_div
    if out_w is None:
        out_w = (in_w + min_div - 1) // min_div * min_div
    if out_h % min_div != 0 or out_w % min_div != 0:
        raise ValueError(f"output dims must be divisible by {min_div}")
    left = (out_w - in_w) // 2
    right = out_w - in_w - left
    top = (out_h - in_h) // 2
    bottom = out_h - in_h - top
    return (left, right, top, bottom), (-left, -right, -top, -bottom)


def pad_image(x, min_div: int = 64):
    """x: [B,H,W,C] -> (padded, unpad spec)."""
    _, h, w, _ = x.shape
    pad, unpad = compute_padding(h, w, min_div=min_div)
    left, right, top, bottom = pad
    xp = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))
    return xp, unpad


def unpad_image(x, unpad):
    left, right, top, bottom = unpad
    h, w = x.shape[1], x.shape[2]
    return x[:, -top:h + bottom, -left:w + right, :]
