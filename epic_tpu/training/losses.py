"""Rate-distortion losses (pure jittable functions).

Reference behavior: src/training/loss.py — four criteria keyed to the four
training stages. All return a dict with 'loss', 'mse_loss', 'bpp_loss',
'bpp_base', 'bpp_scalable', 'bpp_hype'.

Shapes: output['x_hat'] is [L,B,H,W,3] (L reconstruction levels, base
first) or [B,H,W,3]; target is [B,H,W,3].
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

WEIGHT = 255.0 ** 2
DEFAULT_LMBDA_LIST = (0.0055, 0.04)  # parser default (utility/parser.py:33)


def _levels_mse(x_hat, target):
    if x_hat.ndim == target.ndim:
        x_hat = x_hat[None]
    diff = x_hat - target[None]
    return jnp.mean(diff * diff, axis=tuple(range(1, diff.ndim)))  # [L]


def _bpp_terms(output, target) -> Dict[str, jnp.ndarray]:
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    den = -math.log(2) * num_pixels
    lik = output["likelihoods"]
    out = {"bpp_hype": jnp.log(lik["z"]).sum() / den}
    # the reference multiplies the hyperprior term by x_hat.shape[0] —
    # the level count for multi-quality outputs and the BATCH size for
    # single-quality forwards (loss.py:23,56,60: batch_size_recon)
    levels = output["x_hat"].shape[0]
    if "y_prog" in lik:
        out["bpp_base"] = jnp.log(lik["y"]).sum() / den
        out["bpp_scalable"] = jnp.log(lik["y_prog"]).sum() / den
    else:
        out["bpp_base"] = jnp.log(lik["y"]).sum() / den
        out["bpp_scalable"] = jnp.zeros(())
    out["bpp_loss"] = (out["bpp_scalable"] + out["bpp_base"]
                       + levels * out["bpp_hype"])
    return out


def scalable_rate_distortion_loss(output, target, lmbda=None,
                                  weight: float = WEIGHT):
    """Multi-quality R-D (stage: first_train; reference loss.py:6-62).
    lmbda: [L] per-level weights (defaults to the 2-level (0.0055, 0.04))."""
    if lmbda is None:
        lmbda = jnp.asarray(DEFAULT_LMBDA_LIST)
    lmbda = jnp.atleast_1d(jnp.asarray(lmbda))
    out = _bpp_terms(output, target)
    mse = _levels_mse(output["x_hat"], target)
    out["mse_loss"] = mse
    out["loss"] = out["bpp_loss"] + weight * jnp.mean(lmbda * mse)
    return out


def rate_distortion_loss(output, target, lmbda, weight: float = WEIGHT):
    """Single-lambda R-D (stage: refine_gs_ga with a log-spaced lambda per
    sampled quality; reference loss.py:67-122)."""
    out = _bpp_terms(output, target)
    mse = _levels_mse(output["x_hat"], target)
    out["mse_loss"] = mse
    out["loss"] = out["bpp_loss"] + weight * jnp.mean(lmbda * mse)
    return out


def distortion_loss(output, target, lmbda=1e-2, weight: float = WEIGHT):
    """Distortion only (stage: refine_gs, decoder fine-tune; reference
    loss.py:126-182 — rate terms are bookkeeping only)."""
    out = _bpp_terms(output, target)
    mse = _levels_mse(output["x_hat"], target)
    out["mse_loss"] = mse
    out["loss"] = weight * jnp.mean(lmbda * mse)
    return out


def rate_loss(output, target, lmbda=None, weight: float = WEIGHT):
    """Rate only (stage: rems — REMs can only shrink rate; reference
    loss.py:189-229)."""
    del lmbda, weight
    b, h, w, _ = target.shape
    den = -math.log(2) * b * h * w
    lik = output["likelihoods"]
    out = {"bpp_hype": jnp.log(lik["z"]).sum() / den}
    levels = output["x_hat"].shape[0]
    out["bpp_base"] = jnp.log(lik["y"]).sum() / den
    out["bpp_scalable"] = (jnp.log(lik["y_prog"]).sum() / den
                           if "y_prog" in lik else jnp.zeros(()))
    out["bpp_loss"] = (out["bpp_base"] + out["bpp_scalable"]
                       + levels * out["bpp_hype"])
    out["mse_loss"] = _levels_mse(output["x_hat"], target)
    out["loss"] = out["bpp_loss"]
    return out


CRITERIA = {
    "first_train": scalable_rate_distortion_loss,
    "refine_gs": distortion_loss,
    "refine_gs_ga": rate_distortion_loss,
    "rems": rate_loss,
}
