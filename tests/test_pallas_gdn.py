"""Pallas fused GDN vs the XLA einsum reference (interpret mode on CPU).

Checks forward parity (GDN + inverse), the closed-form custom-VJP gradients
against autodiff of the einsum form, and non-tile-aligned row counts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.ops.pallas_gdn import gdn_pallas


def _ref(x, gamma, beta, inverse):
    norm = jnp.einsum("bhwj,ji->bhwi", jnp.square(x), gamma) + beta
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    c = 32
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 12, c)).astype(np.float32))
    gamma = jnp.asarray(
        (0.1 * np.eye(c) + 0.01 * rng.random((c, c))).astype(np.float32))
    beta = jnp.asarray((1.0 + 0.1 * rng.random(c)).astype(np.float32))
    return x, gamma, beta


@pytest.mark.parametrize("inverse", [False, True])
def test_forward_parity(data, inverse):
    x, gamma, beta = data
    got = gdn_pallas(x, gamma, beta, inverse, True)  # interpret mode
    want = _ref(x, gamma, beta, inverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("inverse", [False, True])
def test_gradients_match_autodiff(data, inverse):
    x, gamma, beta = data

    def loss_pallas(x, gamma, beta):
        return (gdn_pallas(x, gamma, beta, inverse, True) ** 2).sum()

    def loss_ref(x, gamma, beta):
        return (_ref(x, gamma, beta, inverse) ** 2).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_unaligned_rows(data):
    _, gamma, beta = data
    rng = np.random.default_rng(1)
    # B*H*W = 1*3*7 = 21 rows, far from the 512 tile
    x = jnp.asarray(rng.normal(0, 1, (1, 3, 7, 32)).astype(np.float32))
    got = gdn_pallas(x, gamma, beta, False, True)
    want = _ref(x, gamma, beta, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
