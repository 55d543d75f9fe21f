"""Fused GDN as a Pallas TPU kernel.

y = x * (beta + x^2 @ gamma)^(-1/2)        (inverse: * (...)^(+1/2))

The XLA lowering materializes x^2 and the norm to HBM between the square,
the channel matmul, and the rsqrt/mul. This kernel streams x through VMEM
once: square on the VPU, channel mixing on the MXU against a resident
[C, C] gamma, epilogue rsqrt+mul, one write. Backward is closed-form XLA
(matmuls), attached via jax.custom_vjp.

Used by ops.gdn.GDN when running on TPU (falls back to the einsum form
elsewhere). Reference math: src/layers/gdn.py:62-75.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 512


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    norm = jnp.dot(x * x, gamma_ref[:],
                   preferred_element_type=jnp.float32) + beta_ref[:]
    if inverse:
        out_ref[:] = x * jnp.sqrt(norm)
    else:
        out_ref[:] = x * jax.lax.rsqrt(norm)


def _gdn_pallas_2d(x2d, gamma, beta, inverse: bool, interpret: bool):
    n, c = x2d.shape
    n_pad = (-n) % _TILE_N
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)), constant_values=1.0)
    grid = (x2d.shape[0] // _TILE_N,)
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, gamma, beta.reshape(1, c))
    return out[:n] if n_pad else out


def _gdn_forward(x, gamma, beta, inverse: bool, interpret: bool):
    b, h, w, c = x.shape
    out = _gdn_pallas_2d(x.reshape(-1, c), gamma, beta, inverse, interpret)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_pallas(x, gamma, beta, inverse: bool = False,
               interpret: bool = False):
    """Fused GDN over NHWC x with gamma [C,C], beta [C]."""
    return _gdn_forward(x, gamma, beta, inverse, interpret)


def _fwd(x, gamma, beta, inverse, interpret):
    y = _gdn_forward(x, gamma, beta, inverse, interpret)
    return y, (x, gamma, beta)


def _bwd(inverse, interpret, res, g):
    # closed form: n = beta + x^2 @ gamma
    # GDN:  y = x n^{-1/2}; u = g*x*n^{-3/2}
    #   dx = g n^{-1/2} - x * (u @ gamma^T)
    #   dgamma = -1/2 (x^2)^T @ u ; dbeta = -1/2 sum u
    # IGDN: y = x n^{1/2};  v = g*x*n^{-1/2}
    #   dx = g n^{1/2} + 1/2 x * (v @ gamma^T) ... (sign flipped, factor +)
    del interpret
    x, gamma, beta = res
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c)
    n = x2 * x2 @ gamma + beta
    if inverse:
        sqrt_n = jnp.sqrt(n)
        v = g2 * x2 / sqrt_n
        dx = g2 * sqrt_n + x2 * (v @ gamma.T)
        dgamma = 0.5 * (x2 * x2).T @ v
        dbeta = 0.5 * v.sum(axis=0)
    else:
        inv_sqrt = jax.lax.rsqrt(n)
        u = g2 * x2 * inv_sqrt ** 3
        dx = g2 * inv_sqrt - x2 * (u @ gamma.T)
        dgamma = -0.5 * (x2 * x2).T @ u
        dbeta = -0.5 * u.sum(axis=0)
    return dx.reshape(x.shape), dgamma, dbeta


gdn_pallas.defvjp(_fwd, _bwd)
