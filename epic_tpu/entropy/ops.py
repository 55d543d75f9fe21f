"""Small differentiable primitives used by the entropy models.

TPU-native equivalents of the reference's autograd helpers:
- ``lower_bound``: compressai.ops.LowerBound (clamp with pass-through
  gradient; reference usage: entropy_models.py:557,628) as a jax.custom_vjp.
- ``ste_round``: straight-through rounding (reference: models/utils.py:4-5).
- ``non_negative_param``: compressai.ops.parametrizers.NonNegativeParametrizer
  (offset/sqrt reparam used by GDN; reference: gdn.py:52-60) as plain
  functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    # Gradient passes through where x >= bound, or where pushing x up
    # (negative gradient) would move it back toward the feasible region.
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def ste_round(x):
    """round(x) in the forward pass, identity gradient in the backward."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_ste(x, means=None):
    """STE quantization around optional means: ste_round(x - mu) + mu."""
    if means is None:
        return ste_round(x)
    return ste_round(x - means) + means


# -- NonNegativeParametrizer ------------------------------------------------
# value = reparam**2 - pedestal, trained in sqrt space so the underlying
# quantity stays >= minimum.

_REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2


def nn_param_init(value, minimum: float = 0.0):
    """Map an initial non-negative value to its reparametrized (sqrt) form."""
    del minimum  # kept for signature symmetry with nn_param_apply
    return jnp.sqrt(jnp.maximum(value + _PEDESTAL, _PEDESTAL))


def nn_param_apply(reparam, minimum: float = 0.0):
    """Recover the non-negative value from its reparametrized form."""
    bound = (minimum + _PEDESTAL) ** 0.5
    out = lower_bound(reparam, bound)
    return out ** 2 - _PEDESTAL
