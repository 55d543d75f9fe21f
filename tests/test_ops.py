"""Tests for the NHWC layer library: shapes, gradients, masking oracle.

Reference behaviors under test: conv/deconv spatial arithmetic
(layers.py:5-26), GDN math (gdn.py:62-75), window attention residual blocks
(win_attention.py), variance masking quantile semantics
(channel_mask.py:132-151) against a NumPy oracle, REM identity under zero
mask (rem.py:130-141).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.ops import (
    GDN,
    LatentRateReduction,
    SubpelConv,
    WinBasedAttention,
    WinNoShiftAttention,
    conv,
    deconv,
    delta_shell_mask,
    prog_mask,
    variance_mask,
)

KEY = jax.random.key(0)


class TestConvShapes:
    def test_stride2_conv_halves(self):
        x = jnp.zeros((2, 32, 48, 8))
        m = conv(16)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == (2, 16, 24, 16)

    def test_deconv_doubles(self):
        x = jnp.zeros((2, 16, 24, 16))
        m = deconv(8)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == (2, 32, 48, 8)

    def test_subpel_upsamples(self):
        x = jnp.zeros((1, 8, 8, 8))
        m = SubpelConv(12, 2)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == (1, 16, 16, 12)


class TestGDN:
    def test_math_matches_formula(self):
        x = jax.random.normal(KEY, (2, 4, 4, 8))
        m = GDN(8)
        v = m.init(KEY, x)
        y = np.asarray(m.apply(v, x))
        # at init: beta=1, gamma=0.1*I -> y = x / sqrt(1 + 0.1*x^2)
        xn = np.asarray(x)
        want = xn / np.sqrt(1.0 + 0.1 * xn ** 2)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    def test_inverse_gdn(self):
        x = jax.random.normal(KEY, (2, 4, 4, 8))
        m = GDN(8, inverse=True)
        v = m.init(KEY, x)
        y = np.asarray(m.apply(v, x))
        xn = np.asarray(x)
        want = xn * np.sqrt(1.0 + 0.1 * xn ** 2)
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    def test_gradients_finite(self):
        x = jax.random.normal(KEY, (2, 4, 4, 8))
        m = GDN(8)
        v = m.init(KEY, x)
        g = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(v)
        assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


class TestAttention:
    def test_shift_block_shape_and_residual(self):
        x = jax.random.normal(KEY, (2, 16, 16, 8))
        m = WinBasedAttention(8, num_heads=2, window=8, shift=4)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == x.shape

    def test_gated_wrapper(self):
        x = jax.random.normal(KEY, (1, 16, 16, 8))
        m = WinNoShiftAttention(8, num_heads=2, window=4, shift=2)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == x.shape

    def test_window_partition_roundtrip(self):
        from epic_tpu.ops.attention import window_partition, window_reverse

        x = jax.random.normal(KEY, (2, 16, 16, 4))
        w = window_partition(x, 8)
        assert w.shape == (2 * 4, 64, 4)
        back = window_reverse(w, 8, 16, 16)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestVarianceMask:
    @pytest.fixture(scope="class")
    def scale(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(
            np.abs(rng.normal(1, 1, (3, 8, 8, 4))).astype(np.float32))

    def test_matches_numpy_quantile_oracle(self, scale):
        sn = np.asarray(scale)
        for pr in [0.5, 2.5, 7.0]:
            m = np.asarray(variance_mask(scale, pr))
            for b in range(sn.shape[0]):
                q = np.quantile(sn[b].ravel(), 1 - pr * 0.1)
                np.testing.assert_array_equal(
                    m[b], (sn[b] >= q).astype(np.float32))

    def test_endpoints(self, scale):
        assert np.asarray(variance_mask(scale, 0.0)).sum() == 0
        assert (np.asarray(variance_mask(scale, 10.0)) == 1).all()
        assert (np.asarray(variance_mask(scale, 12.0)) == 1).all()

    def test_traced_equals_static(self, scale):
        for pr in [0.0, 2.5, 10.0]:
            mt = np.asarray(jax.jit(variance_mask)(scale, jnp.float32(pr)))
            ms = np.asarray(variance_mask(scale, pr))
            np.testing.assert_array_equal(mt, ms)

    def test_monotone_in_quality(self, scale):
        prev = np.zeros_like(np.asarray(scale))
        for pr in [0.5, 1.0, 2.0, 5.0, 10.0]:
            m = np.asarray(variance_mask(scale, pr))
            assert (m >= prev).all()  # masks only grow with quality
            prev = m

    def test_two_levels_policy(self, scale):
        assert np.asarray(
            variance_mask(scale, 0, policy="two-levels")).sum() == 0
        assert (np.asarray(
            variance_mask(scale, 3, policy="two-levels")) == 1).all()

    def test_delta_shells_disjoint(self):
        rng = np.random.default_rng(1)
        scales = jnp.asarray(
            np.abs(rng.normal(1, 1, (10, 1, 8, 8, 32))).astype(np.float32))
        d1 = np.asarray(delta_shell_mask(scales, 0.0, 1.0))
        d2 = np.asarray(delta_shell_mask(scales, 1.0, 3.0))
        assert ((d1 == 1) & (d2 == 1)).sum() == 0
        assert (d1 >= 0).all() and (d2 >= 0).all()

    def test_prog_mask_per_slice_quantile(self):
        rng = np.random.default_rng(2)
        scales = jnp.asarray(
            np.abs(rng.normal(1, 1, (4, 2, 4, 4, 8))).astype(np.float32))
        m = np.asarray(prog_mask(scales, 3.0))
        sn = np.asarray(scales)
        for s in range(4):
            for b in range(2):
                q = np.quantile(sn[s, b].ravel(), 0.7)
                np.testing.assert_array_equal(
                    m[s, b], (sn[s, b] >= q).astype(np.float32))


class TestREM:
    def test_zero_mask_is_identity(self):
        m = LatentRateReduction(dim_chunk=8, mu_std=True)
        xb = jax.random.normal(KEY, (1, 8, 8, 8))
        pb = jax.random.normal(jax.random.key(1), (1, 8, 8, 16))
        pp = jax.random.normal(jax.random.key(2), (1, 8, 8, 16))
        v = m.init(KEY, xb, pb, pp, jnp.ones((1, 8, 8, 16)))
        out0 = m.apply(v, xb, pb, pp, jnp.zeros((1, 8, 8, 16)))
        np.testing.assert_allclose(np.asarray(out0), np.asarray(pp))

    def test_big_variant_and_scale_only(self):
        m = LatentRateReduction(dim_chunk=8, mu_std=False, dimension="big")
        xb = jax.random.normal(KEY, (1, 4, 4, 8))
        pb = jax.random.normal(KEY, (1, 4, 4, 16))
        pp = jax.random.normal(KEY, (1, 4, 4, 8))
        am = jnp.ones((1, 4, 4, 8))
        v = m.init(KEY, xb, pb, pp, am)
        assert m.apply(v, xb, pb, pp, am).shape == (1, 4, 4, 8)


class TestInitStability:
    """Regression: the default kernel init must keep the training-mode
    forward in a trainable regime at init. A gain-sqrt(2) (Kaiming) default
    was measured to blow x_hat up to ~3e4 through the deep transform stacks
    + inverse-GDN amplification (see ops/conv.py) — training never
    recovered. DEFAULT_INIT (gain 1.0) keeps activations O(1)."""

    def test_training_forward_bounded_at_init(self):
        from epic_tpu.models import get_model
        from epic_tpu.training import scalable_rate_distortion_loss

        x = jax.random.uniform(KEY, (1, 64, 64, 3))
        m = get_model("pic", n=16, m=32, division=(16, 32), dim_chunk=8,
                      param_net_widths=(24, 16))
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        out = m.apply(v, x, [0, 10], True, rngs={"noise": jax.random.key(3)})
        assert float(jnp.abs(out["x_hat"]).max()) < 10.0
        d = scalable_rate_distortion_loss(
            out, x, jnp.asarray([0.0055, 0.04], jnp.float32))
        assert float(d["loss"]) < 1e5 and np.isfinite(float(d["loss"]))

    def test_kaiming_still_available(self):
        from epic_tpu.ops.conv import KAIMING, conv

        k = conv(8, kernel_init=KAIMING)
        w = k.init(KEY, jnp.zeros((1, 16, 16, 4)))["params"]["kernel"]
        # He: std ~ sqrt(2 / fan_in), fan_in = 5*5*4
        assert abs(float(w.std()) - (2 / 100) ** 0.5) < 0.02
