"""Variance-aware masking — the paper's parameter-free progressivity system.

Reference behavior: src/layers/channel_mask.py (ChannelMask). Quality is a
scalar q in [0, 10]; a slice keeps the top q*10% of elements ranked by the
hyperprior-predicted std. Untransmitted elements decode to the predicted
mean. The mask is never transmitted: encoder and decoder both derive it from
sigma, which is a deterministic function of decoded content — so these
functions must be bitwise-reproducible between the two sides (same dtype,
same reduction order; guaranteed here by using identical jitted code).

TPU-native formulation: per-sample quantile over the slice (jnp.quantile ==
sort-based, vectorized over batch / slices / quality levels) instead of the
reference's per-sample Python loops (channel_mask.py:38-45,142-149).
Supports both static Python-float qualities (compile-time short-circuits to
ones/zeros, reference:133-136) and traced qualities (jnp.where).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..entropy.ops import ste_round


def _quantile_mask(scale, p_keep):
    """scale: [B, ...]; p_keep in (0,1): keep the top p fraction by value.

    quantile with linear interpolation at (1 - p_keep) over each sample's
    flattened values; mask = scale >= quantile (ties kept, like the
    reference).
    """
    b = scale.shape[0]
    flat = scale.reshape(b, -1)
    q = jnp.quantile(flat, 1.0 - p_keep, axis=1)
    q = q.reshape((b,) + (1,) * (scale.ndim - 1))
    return (scale >= q).astype(scale.dtype)


def variance_mask(scale, pr, policy: str = "point-based-std"):
    """Binary mask of the top pr*10% highest-std elements, per sample.

    scale: [B, H, W, C] (one slice). pr: python float or traced scalar in
    [0, 10]. Reference: channel_mask.py:132-153.
    """
    if policy == "two-levels":
        if isinstance(pr, (int, float)):
            return (jnp.zeros_like(scale) if pr == 0
                    else jnp.ones_like(scale))
        return jnp.where(pr == 0, jnp.zeros_like(scale),
                         jnp.ones_like(scale))
    if policy != "point-based-std":
        raise NotImplementedError(f"mask policy {policy!r}")

    if isinstance(pr, (int, float)):
        # static quality -> compile-time short circuit
        if pr >= 10:
            return jnp.ones_like(scale)
        if pr <= 0:
            return jnp.zeros_like(scale)
        return _quantile_mask(scale, pr * 0.1)

    pr = jnp.clip(pr, 0.0, 10.0)
    p = pr * 0.1
    # clamp into the valid quantile range for the computation, then override
    # the degenerate endpoints
    p_safe = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    m = _quantile_mask(scale, p_safe)
    return jnp.where(p <= 0.0, jnp.zeros_like(scale),
                     jnp.where(p >= 1.0, jnp.ones_like(scale), m))


def prog_mask(scales, pr, policy: str = "point-based-std"):
    """Stacked-slice variant for the single-bitstream codec.

    scales: [S, B, H, W, C] per-slice stds. Quantile is computed per (S, B)
    slice — same granularity as variance_mask, vectorized over S instead of
    the reference's Python loop (channel_mask.py:18-49).
    """
    s, b = scales.shape[:2]
    flat = scales.reshape(s * b, *scales.shape[2:])
    out = variance_mask(flat, pr, policy)
    return out.reshape(scales.shape)


def delta_shell_mask(scales, q_init, q_end):
    """The incremental shell between two qualities: elements transmitted at
    q_end but not at q_init (reference computes this as
    ProgMask(q_end) - ProgMask(q_init); functions_encode.py:180-187)."""
    return prog_mask(scales, q_end) - prog_mask(scales, q_init)


def apply_noise_mask(mask, training: bool):
    """Round the mask, STE in training (reference: channel_mask.py:81-86).
    A no-op for the binary point-based-std masks; kept for learnable
    policies."""
    if training:
        return ste_round(mask)
    return jnp.round(mask)
