"""Scan-chain equivalence + stacked-ParamNet layout tests.

The slice chains run as lax.scan over stacked per-slice weights
(models/builder.py:StackedParamNet, models/pic.py:_base_chain_scan /
_prog_param_chain_scan). These tests pin the two invariants that make the
refactor safe:

1. scan_chains=True and scan_chains=False produce BITWISE identical
   outputs from the same stacked params (the codec's static-index
   programs and the training scan are the same math).
2. Legacy per-slice checkpoints (cc_mean_0.. layout, round-1/2 training
   runs) convert via stack_legacy_param_nets into stacked params that
   reproduce the original forward exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.models import get_model

TINY = dict(n=16, m=64, division=(16, 32), dim_chunk=8,
            param_net_widths=(24, 16))


@pytest.fixture(scope="module")
def tiny_pair():
    m_scan = get_model("pic", scan_chains=True, **TINY)
    m_unrl = get_model("pic", scan_chains=False, **TINY)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3),
                                                    np.float32))
    v = jax.jit(lambda: m_scan.init({"params": jax.random.key(0)}, x,
                                    method="init_all"))()
    return m_scan, m_unrl, v, x


class TestScanEqualsUnrolled:
    def test_multi_quality_forward(self, tiny_pair):
        m_scan, m_unrl, v, x = tiny_pair
        o1 = m_scan.apply(v, x, [0, 0.5, 2, 10], training=False)
        o2 = m_unrl.apply(v, x, [0, 0.5, 2, 10], training=False)
        np.testing.assert_array_equal(np.asarray(o1["x_hat"]),
                                      np.asarray(o2["x_hat"]))
        np.testing.assert_array_equal(
            np.asarray(o1["likelihoods"]["y_prog"]),
            np.asarray(o2["likelihoods"]["y_prog"]))

    def test_single_quality_forward(self, tiny_pair):
        m_scan, m_unrl, v, x = tiny_pair
        for q in (0.0, 0.7, 10.0):
            o1 = m_scan.apply(v, x, q, False,
                              method=type(m_scan).forward_single_quality)
            o2 = m_unrl.apply(v, x, q, False,
                              method=type(m_unrl).forward_single_quality)
            np.testing.assert_array_equal(np.asarray(o1["x_hat"]),
                                          np.asarray(o2["x_hat"]))

    def test_traced_vs_static_slice_index(self, tiny_pair):
        """The codec programs index slices with static ints; the scan uses
        traced int32. Both must select identical weights."""
        from epic_tpu.models.builder import paramnet_apply

        m_scan, _, v, x = tiny_pair
        p = v["params"]["cc_mean"]
        kernels = tuple(p[f"Conv_{l}_kernel"] for l in range(3))
        biases = tuple(p[f"Conv_{l}_bias"] for l in range(3))
        xin = jnp.asarray(np.random.default_rng(1).random(
            (1, 4, 4, kernels[0].shape[3]), np.float32))
        f_traced = jax.jit(
            lambda ii: paramnet_apply(kernels, biases, xin, ii))
        for i in range(kernels[0].shape[0]):
            a = paramnet_apply(kernels, biases, xin, i)
            b = f_traced(jnp.int32(i))
            # same weights either way; eager vs jit may fuse differently,
            # so numerical (not bitwise) agreement is the invariant here —
            # bit-identity holds within any one compiled program
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


class TestRemChainScan:
    """The codec's chained-REM param program (_p_prog_params_rem_chain)
    runs as one lax.scan when scan_chains=True; it must reproduce the
    unrolled per-slice chain exactly (VERDICT r3 item 5: the unrolled
    form was the dominant cold-start compile with REMs on)."""

    def _inputs(self, model, n_ck, seed=4):
        rng = np.random.default_rng(seed)
        b, h, w = 1, 4, 4
        c = model.dim_chunk
        dp = model.division[1] - model.division[0]
        f32 = np.float32
        lm = jnp.asarray(rng.standard_normal((b, h, w,
                                              model.division[1])).astype(f32))
        ls = jnp.asarray(rng.random((b, h, w,
                                     model.division[1])).astype(f32) + 0.1)
        base = tuple(jnp.asarray(rng.standard_normal(
            (b, h, w, c)).astype(f32)) for _ in range(model.ns0))
        ckpts = tuple(jnp.asarray(rng.standard_normal(
            (b, h, w, dp)).astype(f32)) for _ in range(n_ck))
        mu_b = tuple(jnp.asarray(rng.standard_normal(
            (b, h, w, c)).astype(f32)) for _ in range(model.ns0))
        std_b = tuple(jnp.asarray(rng.random(
            (b, h, w, c)).astype(f32) + 0.1) for _ in range(model.ns0))
        return base, lm, ls, ckpts, mu_b, std_b

    @pytest.mark.parametrize("check_levels", [(0.75,), (0.5, 2.0)])
    def test_scan_equals_unrolled(self, check_levels):
        from epic_tpu.codec import PICCodec

        cfg = dict(check_levels=check_levels, rem_dimension="middle",
                   **TINY)
        m_scan = get_model("rem", scan_chains=True, **cfg)
        m_unrl = get_model("rem", scan_chains=False, **cfg)
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3),
                                                        np.float32))
        v = jax.jit(lambda: m_scan.init({"params": jax.random.key(1)}, x,
                                        method="init_all"))()
        n_ck = len(check_levels)
        args = self._inputs(m_scan, n_ck)
        o1 = PICCodec(m_scan, v)._p_prog_params_rem_chain(n_ck)(v, *args)
        o2 = PICCodec(m_unrl, v)._p_prog_params_rem_chain(n_ck)(v, *args)
        for name, a, b in zip(("mu", "scale", "idx"), o1[:3], o2[:3]):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-6, atol=1e-6, err_msg=f"rem chain {name} diverged")
        for a, b in zip(o1[3], o2[3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


class TestLrrApply:
    def test_pure_fn_matches_module(self):
        """lrr_apply (the flax-free slice evaluator used inside codec
        programs/scan bodies) is bitwise the LatentRateReduction module."""
        from epic_tpu.ops import LatentRateReduction
        from epic_tpu.ops.rem import lrr_apply

        rng = np.random.default_rng(0)
        c = 8
        for dim, mu_std in (("middle", True), ("big", False)):
            mod = LatentRateReduction(c, mu_std, dim)
            xb = jnp.asarray(rng.random((2, 4, 4, c), np.float32))
            pb = jnp.asarray(rng.random((2, 4, 4, 2 * c), np.float32))
            pp = jnp.asarray(rng.random(
                (2, 4, 4, 2 * c if mu_std else c), np.float32))
            att = jnp.ones_like(pp)
            v = mod.init(jax.random.key(0), xb, pb, pp, att)
            a = mod.apply(v, xb, pb, pp, att)
            b = lrr_apply(v["params"], xb, pb, pp, att)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDeadRowZeroing:
    """zero_dead_rows (checkpoint de-padding, VERDICT r2 item 8): the
    padded stacked rows that only ever multiply zero support channels must
    be removable with BITWISE-identical outputs — and the utility must
    actually remove nonzero init values (the compression win)."""

    def test_bitwise_identical_forward(self, tiny_pair):
        from epic_tpu.training.checkpoint import zero_dead_rows

        m_scan, _, v, x = tiny_pair
        p0 = v["params"]
        p1 = zero_dead_rows(p0, m_scan)
        changed = sum(
            int((np.asarray(a) != np.asarray(b)).sum())
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
        assert changed > 0, "no dead rows found to zero"
        o0 = m_scan.apply({"params": p0}, x, [0, 0.5, 10], training=False)
        o1 = m_scan.apply({"params": p1}, x, [0, 0.5, 10], training=False)
        np.testing.assert_array_equal(np.asarray(o0["x_hat"]),
                                      np.asarray(o1["x_hat"]))
        for k in o0["likelihoods"]:
            np.testing.assert_array_equal(
                np.asarray(o0["likelihoods"][k]),
                np.asarray(o1["likelihoods"][k]))

    def test_artifact_roundtrip_depads(self, tiny_pair, tmp_path):
        from epic_tpu.training.checkpoint import (load_checkpoint,
                                                  save_artifact)

        m_scan, _, v, x = tiny_pair
        cfg = dict(model="pic", scan_chains=True, **TINY)
        save_artifact(str(tmp_path), v["params"], cfg, step=1)
        model2, params2, _, _ = load_checkpoint(str(tmp_path), "last")
        k = np.asarray(params2["cc_mean"]["Conv_0_kernel"])
        # slice 0 has zero support slots -> its pad block must be zeros
        d0 = TINY["division"][0]
        assert (k[0, :, :, d0:, :] == 0).all()


class TestLegacyRemap:
    def test_legacy_layout_reproduces_forward(self, tiny_pair):
        """Strip each slice's zero-pad rows out of the stacked first-layer
        kernels to fabricate a legacy (per-slice) tree, remap it back
        through stack_legacy_param_nets, and check the forward is exactly
        reproduced."""
        from epic_tpu.training.checkpoint import stack_legacy_param_nets

        m_scan, _, v, x = tiny_pair
        model = m_scan
        c = model.dim_chunk
        d0 = model.division[0]
        dp = model.division[1] - model.division[0]
        nb, npg = model._n_slots_base, model._n_slots_prog
        nprog = model.ns1 - model.ns0

        def unpad(kern, pos, pad):
            return np.concatenate([kern[:, :, :pos],
                                   kern[:, :, pos + pad:]], axis=2)

        legacy = {}
        for key, sub in v["params"].items():
            if key not in ("cc_mean", "cc_scale", "lrp", "cc_mean_prog",
                           "cc_scale_prog", "lrp_prog"):
                legacy[key] = sub
                continue
            n_layers = len(sub) // 2
            s_count = sub["Conv_0_kernel"].shape[0]
            for i in range(s_count):
                tree = {}
                for layer in range(n_layers):
                    kern = np.asarray(sub[f"Conv_{layer}_kernel"][i])
                    if layer == 0:
                        if key in ("cc_mean", "cc_scale", "lrp"):
                            k_i = i if model.max_support_slices < 0 else \
                                min(model.max_support_slices, i)
                            pos, pad = d0 + k_i * c, (nb - k_i) * c
                        else:
                            k_i = min(model.support_progressive_slices, i) \
                                if model.support_progressive_slices > 0 \
                                else 0
                            pos, pad = dp + c, (npg - k_i) * c
                        if pad:
                            kern = unpad(kern, pos, pad)
                    tree[f"Conv_{layer}"] = {
                        "kernel": jnp.asarray(kern),
                        "bias": sub[f"Conv_{layer}_bias"][i],
                    }
                legacy[f"{key}_{i}"] = tree

        restacked = stack_legacy_param_nets(legacy, model)
        o_ref = model.apply(v, x, [0, 1, 10], training=False)
        o_new = model.apply({"params": restacked}, x, [0, 1, 10],
                            training=False)
        np.testing.assert_array_equal(np.asarray(o_ref["x_hat"]),
                                      np.asarray(o_new["x_hat"]))

    def test_legacy_rem_banks_restack(self):
        """post_latent_{r}_{i} per-slice banks (round-2 training layout)
        restack into the nn.vmap layout and reproduce the REM-refined
        forward exactly."""
        from epic_tpu.training.checkpoint import stack_legacy_param_nets

        model = get_model("rem", check_levels=(0.5, 2.0),
                          rem_dimension="middle", **TINY)
        x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3),
                                                        np.float32))
        v = jax.jit(lambda: model.init({"params": jax.random.key(5)}, x,
                                       method="init_all"))()
        ckpt = jnp.asarray(np.random.default_rng(3).random(
            (1, 4, 4, model.division[0]), np.float32))

        legacy = {}
        for key, sub in v["params"].items():
            if not key.startswith("post_latent_"):
                legacy[key] = sub
                continue
            s_count = jax.tree.leaves(sub)[0].shape[0]
            for i in range(s_count):
                legacy[f"{key}_{i}"] = jax.tree.map(lambda a: a[i], sub)
        assert "post_latent_0_0" in legacy
        restacked = stack_legacy_param_nets(legacy, model)

        o_ref = model.apply(v, x, 1.5, False, checkpoint_ref=ckpt)
        o_new = model.apply({"params": restacked}, x, 1.5, False,
                            checkpoint_ref=ckpt)
        np.testing.assert_array_equal(np.asarray(o_ref["x_hat"]),
                                      np.asarray(o_new["x_hat"]))
