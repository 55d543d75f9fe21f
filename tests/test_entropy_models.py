"""Tests for the JAX entropy models (GaussianConditional, EntropyBottleneck).

Oracles: closed-form normal CDF via scipy, estimated-vs-real bpp gap, exact
round-trips through the host coder. Reference behaviors:
entropy_models.py:528-673 (Gaussian), 297-525 (bottleneck).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.stats

from epic_tpu.entropy import (
    EntropyBottleneck,
    GaussianConditional,
    get_scale_table,
    lower_bound,
)
from epic_tpu.entropy.bottleneck import build_bottleneck_cdf_tables


class TestLowerBound:
    def test_forward_clamps(self):
        x = jnp.array([-1.0, 0.05, 0.5])
        np.testing.assert_allclose(lower_bound(x, 0.11),
                                   [0.11, 0.11, 0.5])

    def test_gradient_pass_through(self):
        # grad flows where x >= bound, or where gradient pushes x upward
        def f(x):
            return lower_bound(x, 0.11).sum()

        g = jax.grad(f)(jnp.array([-1.0, 0.5]))
        np.testing.assert_allclose(g, [0.0, 1.0])

        def f2(x):
            return (-lower_bound(x, 0.11)).sum()

        g2 = jax.grad(f2)(jnp.array([-1.0, 0.5]))
        np.testing.assert_allclose(g2, [-1.0, -1.0])


class TestScaleTable:
    def test_log_spaced_64(self):
        t = get_scale_table()
        assert t.shape == (64,)
        np.testing.assert_allclose(t[0], 0.11, rtol=1e-6)
        np.testing.assert_allclose(t[-1], 256.0, rtol=1e-5)
        ratios = t[1:] / t[:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)


class TestGaussianConditional:
    @pytest.fixture(scope="class")
    def gc(self):
        return GaussianConditional().update()

    def test_likelihood_matches_scipy(self, gc):
        rng = np.random.default_rng(0)
        y = rng.normal(0, 3, (2, 4, 4, 8)).astype(np.float32)
        s = (np.abs(rng.normal(1, 1, y.shape)) + 0.2).astype(np.float32)
        m = rng.normal(0, 1, y.shape).astype(np.float32)
        got = np.asarray(gc.likelihood(jnp.asarray(y), jnp.asarray(s),
                                       jnp.asarray(m)))
        v = np.abs(y - m)
        want = (scipy.stats.norm.cdf((0.5 - v) / s)
                - scipy.stats.norm.cdf((-0.5 - v) / s))
        np.testing.assert_allclose(got, np.maximum(want, 1e-9),
                                   rtol=2e-4, atol=1e-7)

    def test_build_indexes_buckets(self, gc):
        table = gc.scale_table
        scales = jnp.asarray(
            [0.01, table[0], (table[3] + table[4]) / 2, table[10],
             table[-1], 1000.0], dtype=jnp.float32)[None, :]
        idx = np.asarray(gc.build_indexes(scales))[0]
        # smallest table entry >= scale (scale below min -> 0, above max -> 63)
        np.testing.assert_array_equal(idx, [0, 0, 4, 10, 63, 63])

    def test_roundtrip_and_bpp_gap(self, gc):
        rng = np.random.default_rng(1)
        scales = (np.abs(rng.normal(1.0, 2.0, (1, 16, 16, 32))) + 0.05
                  ).astype(np.float32)
        means = rng.normal(0, 1, scales.shape).astype(np.float32)
        y = (rng.normal(0, 1, scales.shape) * scales + means
             ).astype(np.float32)
        idx = np.asarray(gc.build_indexes(jnp.asarray(scales)))
        sym = np.round(y - means).astype(np.int32)
        coder = gc.coder()
        blob = coder.encode_with_indexes(sym.ravel(), idx.ravel())
        dec = coder.decode_with_indexes(blob, idx.ravel()).reshape(sym.shape)
        np.testing.assert_array_equal(dec, sym)
        yq = sym + means
        lik = np.asarray(gc.likelihood(jnp.asarray(yq), jnp.asarray(scales),
                                       jnp.asarray(means)))
        est_bits = -np.log2(lik).sum()
        real_bits = len(blob) * 8
        # real rate within ~5% of the estimate (bucketing + quantized CDFs)
        assert real_bits < est_bits * 1.05 + 64
        assert real_bits > est_bits * 0.8


class TestEntropyBottleneck:
    @pytest.fixture(scope="class")
    def eb_and_vars(self):
        eb = EntropyBottleneck(channels=8)
        v = eb.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                    jnp.zeros((1, 4, 4, 8)), True)
        return eb, v

    def test_eval_output_is_shifted_round(self, eb_and_vars):
        eb, v = eb_and_vars
        x = jnp.asarray(
            np.random.default_rng(2).normal(0, 3, (2, 4, 4, 8)).astype(
                np.float32))
        out, lik = eb.apply(v, x, False)
        med = np.asarray(
            eb.apply(v, method=EntropyBottleneck.medians))[:, 0, 0]
        want = np.round(np.asarray(x) - med) + med
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
        assert np.all(np.asarray(lik) > 0)

    def test_training_noise_bounded(self, eb_and_vars):
        eb, v = eb_and_vars
        x = jnp.zeros((1, 4, 4, 8))
        out, _ = eb.apply(v, x, True, rngs={"noise": jax.random.key(3)})
        assert np.all(np.abs(np.asarray(out)) <= 0.5 + 1e-6)

    def test_aux_loss_finite_and_decreasing_under_opt(self, eb_and_vars):
        eb, v = eb_and_vars
        loss0 = float(eb.apply(v, method=EntropyBottleneck.aux_loss))
        assert np.isfinite(loss0)

        def loss_fn(params):
            return eb.apply({"params": params},
                            method=EntropyBottleneck.aux_loss)

        g = jax.grad(loss_fn)(v["params"])
        params = jax.tree.map(lambda p, gg: p - 0.05 * gg, v["params"], g)
        loss1 = float(loss_fn(params))
        assert loss1 < loss0

    def test_compress_roundtrip(self, eb_and_vars):
        eb, v = eb_and_vars
        tables, medians = build_bottleneck_cdf_tables(eb, v)
        from epic_tpu.entropy.coder import RansCoder

        coder = RansCoder(tables.quantized_cdf, tables.cdf_length,
                          tables.offset)
        rng = np.random.default_rng(4)
        z = rng.normal(0, 3, (2, 6, 6, 8)).astype(np.float32)
        sym = np.round(z - medians[None, None, None, :]).astype(np.int32)
        idx = np.ascontiguousarray(
            np.broadcast_to(np.arange(8, dtype=np.int32), z.shape))
        blob = coder.encode_with_indexes(sym.ravel(), idx.ravel())
        dec = coder.decode_with_indexes(blob, idx.ravel()).reshape(sym.shape)
        np.testing.assert_array_equal(dec, sym)
