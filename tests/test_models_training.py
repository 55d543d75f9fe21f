"""Tests: model registry (WACNN/PIC/REM), REM codec parity, training
subsystem (losses, stage plans, masks, one optimization step).

Reference behaviors: models/__init__.py:5-55 (registry), rem_pic.py (REM
refinement + bracketing), train.py:132-186 (stage recipes),
utility/functions.py:23-59 (optimizers), training/loss.py (criteria).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.models import get_model, MODELS, VarianceMaskingPICREM
from epic_tpu.codec import PICCodec
from epic_tpu.training import (
    create_train_state,
    make_stage,
    make_train_step,
    make_eval_step,
    trainable_mask,
    scalable_rate_distortion_loss,
    rate_loss,
)
from epic_tpu.training.step import extract_quality_ref, make_ckpt_extractor

TINY_PIC = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                param_net_widths=(24, 16))
TINY_REM = dict(**TINY_PIC, check_levels=(0.5, 2.0), rem_dimension="middle")


@pytest.fixture(scope="module")
def x():
    return jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))


@pytest.fixture(scope="module")
def rem_setup(x):
    model = get_model("rem", **TINY_REM)
    v = model.init({"params": jax.random.key(3), "noise": jax.random.key(4)},
                   x, method="init_all")
    return model, v


class TestRegistry:
    def test_names(self):
        assert set(MODELS) == {"cnn", "pic", "rem"}

    def test_wacnn_is_single_branch(self, x):
        w = get_model("cnn", n=16, m=32, dim_chunk=8,
                      param_net_widths=(24, 16))
        assert w.ns0 == w.ns1 == 4
        assert not w.multiple_encoder
        v = w.init({"params": jax.random.key(1)}, x, method="init_all")
        out = w.apply(v, x, [0], False)
        assert out["x_hat"].shape == (1, 2, 64, 64, 3)
        assert "y_prog" not in out["likelihoods"]
        # standalone-class surface (models/cnn.py; reference cnn.py:26-188)
        from epic_tpu.models import WACNN

        assert isinstance(w, WACNN)
        # geometry is pinned even against inconsistent caller config
        forced = WACNN(n=16, m=32, dim_chunk=8, param_net_widths=(24, 16),
                       division=(8, 16), multiple_encoder=True)
        assert tuple(forced.division) == (32, 32)
        assert not forced.multiple_encoder
        assert jax.tree_util.tree_structure(
            forced.init({"params": jax.random.key(1)}, x,
                        method="init_all")) == \
            jax.tree_util.tree_structure(v)
        # reference forward contract: single x_hat, {y, z} likelihoods
        fwd = w.apply(v, x, False, method="forward")
        assert fwd["x_hat"].shape == x.shape
        assert set(fwd["likelihoods"]) == {"y", "z"}
        np.testing.assert_array_equal(np.asarray(fwd["x_hat"]),
                                      np.asarray(out["x_hat"][0]))

    def test_unknown_model_raises(self):
        with pytest.raises(KeyError):
            get_model("nope")


class TestREM:
    def test_find_check_quality_brackets(self):
        m = VarianceMaskingPICREM(check_levels=(0.01, 0.25, 1.75))
        assert m.find_check_quality(0.005) == (0.0, 0.0, -1)
        assert m.find_check_quality(0.1) == (0.01, 0.25, 0)
        assert m.find_check_quality(1.0) == (0.25, 1.75, 1)
        assert m.find_check_quality(5.0) == (1.75, 10.0, 2)

    def test_refined_codec_roundtrip_bit_exact(self, x, rem_setup):
        model, v = rem_setup
        codec = PICCodec(model, v)
        ckpt = codec.extract_checkpoint(x, 0.5)
        out = codec.compress(x, 3.0, return_latents=True,
                             checkpoint_rep=ckpt)
        dec = codec.decompress(out, checkpoint_rep=ckpt)
        np.testing.assert_array_equal(np.asarray(out["y_hat"]),
                                      np.asarray(dec["y_hat"]))

    def test_rem_changes_the_stream(self, x, rem_setup):
        model, v = rem_setup
        codec = PICCodec(model, v)
        ckpt = codec.extract_checkpoint(x, 0.5)
        with_rem = codec.compress(x, 3.0, checkpoint_rep=ckpt)
        without = codec.compress(x, 3.0)
        b1 = b"".join(s for sl in with_rem["strings"][0] for s in sl)
        b2 = b"".join(s for sl in without["strings"][0] for s in sl)
        assert b1 != b2

    def test_extract_quality_ref(self):
        assert extract_quality_ref(0.3, (0.5, 2.0)) == 0.0
        assert extract_quality_ref(1.0, (0.5, 2.0)) == 0.5
        assert extract_quality_ref(5.0, (0.5, 2.0)) == 2.0


class TestStages:
    def test_plans(self):
        p = make_stage("first_train")
        assert p.list_quality == [0, 10] and not p.sampling
        p = make_stage("refine_gs")
        assert p.sampling and len(p.list_quality) > 200
        p = make_stage("refine_gs_ga", lmbda_list=(0.0055, 0.04))
        assert p.lmbda_schedule is not None
        assert len(p.lmbda_schedule) == len(p.list_quality)
        p = make_stage("rems", check_levels=(0.75,), check_levels_np=(24,))
        assert p.rems == [0.75] and 10.0 in p.list_quality

    def test_trainable_masks(self, x):
        model = get_model("pic", **TINY_PIC)
        v = model.init({"params": jax.random.key(1)}, x, method="init_all")
        params = v["params"]

        def frac_true(mask):
            leaves = jax.tree.leaves(mask)
            return sum(bool(l) for l in leaves) / len(leaves)

        m_all = trainable_mask(params, "first_train")
        assert 0.9 < frac_true(m_all) <= 1.0  # all but quantiles
        m_gs = trainable_mask(params, "refine_gs")
        flat = jax.tree_util.tree_flatten_with_path(m_gs)[0]
        on = ["/".join(str(getattr(k, 'key', k)) for k in p)
              for p, v_ in flat if v_]
        assert on and all(s.startswith("g_s_1") for s in on)
        m_ga = trainable_mask(params, "refine_gs_ga")
        on = ["/".join(str(getattr(k, 'key', k)) for k in p)
              for p, v_ in jax.tree_util.tree_flatten_with_path(m_ga)[0]
              if v_]
        assert any(s.startswith("g_a_1") for s in on)
        assert all(s.startswith(("g_a_1", "g_s_1")) for s in on)


class TestTrainingSteps:
    def test_first_train_step_decreases_loss(self, x):
        model = get_model("pic", **TINY_PIC)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, x, method="init_all")
        plan = make_stage("first_train")
        state = create_train_state(v["params"], "first_train",
                                   learning_rate=1e-3)
        step = make_train_step(model, plan)
        rng = jax.random.key(5)
        losses = []
        for i in range(4):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, x, sub)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_sampling_step_no_recompile_across_qualities(self, x):
        model = get_model("pic", **TINY_PIC)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, x, method="init_all")
        plan = make_stage("refine_gs")
        state = create_train_state(v["params"], "refine_gs")
        step = make_train_step(model, plan)
        rng = jax.random.key(6)
        for q in [0.3, 1.7, 9.4]:  # one compile, many qualities
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, x, sub, jnp.float32(q),
                                  jnp.float32(0.01))
            assert np.isfinite(float(metrics["loss"]))

    def test_rems_stage_with_checkpoint(self, x, rem_setup):
        model, v = rem_setup
        plan = make_stage("rems", check_levels=(0.5, 2.0),
                          check_levels_np=(4, 4))
        state = create_train_state(v["params"], "rems")
        step = make_train_step(model, plan)
        extractor = make_ckpt_extractor(model)
        q = 1.2
        qref = extract_quality_ref(q, (0.5, 2.0))
        ckpt = extractor(state.params, x, jnp.float32(qref))
        rng = jax.random.key(7)
        state2, metrics = step(state, x, rng, jnp.float32(q),
                               jnp.float32(0.0), ckpt)
        assert np.isfinite(float(metrics["loss"]))
        # only post_latent params changed
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, state2.params)
        flat = jax.tree_util.tree_flatten_with_path(diff)[0]
        for path, d in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if d > 0 and "quantiles" not in name:
                assert name.startswith("post_latent"), name

    def test_eval_step(self, x):
        model = get_model("pic", **TINY_PIC)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, x, method="init_all")
        ev = make_eval_step(model)
        _, bpp0, _ = ev(v["params"], x, jnp.float32(0.0))
        _, bpp10, _ = ev(v["params"], x, jnp.float32(10.0))
        assert float(bpp10) > float(bpp0) > 0


class TestLosses:
    def test_scalable_loss_fields(self, x):
        fake = {
            "x_hat": jnp.stack([x, x * 0.9]),
            "likelihoods": {
                "y": jnp.full((2, 4, 4, 32), 0.5),
                "y_prog": jnp.full((1, 2, 4, 4, 64), 0.5),
                "z": jnp.full((2, 1, 1, 16), 0.5),
            },
        }
        out = scalable_rate_distortion_loss(fake, x, jnp.asarray([0.01, 0.1]))
        for k in ["loss", "bpp_loss", "bpp_base", "bpp_scalable",
                  "bpp_hype", "mse_loss"]:
            assert k in out
        assert out["mse_loss"].shape == (2,)
        assert float(out["bpp_hype"]) > 0

    def test_rate_loss_is_rate_only(self, x):
        fake = {
            "x_hat": x * 0.5,  # large distortion must not matter
            "likelihoods": {
                "y": jnp.full((2, 4, 4, 64), 0.5),
                "z": jnp.full((2, 1, 1, 16), 0.5),
            },
        }
        out = rate_loss(fake, x)
        np.testing.assert_allclose(float(out["loss"]),
                                   float(out["bpp_loss"]))


class TestBufferedCodec:
    def test_buffered_base_stream_roundtrip(self, x):
        from epic_tpu.codec import PICCodec

        w = get_model("cnn", n=16, m=32, dim_chunk=8,
                      param_net_widths=(24, 16))
        v = w.init({"params": jax.random.key(1)}, x, method="init_all")
        codec = PICCodec(w, v)
        per = codec.compress(x, 0, return_latents=True)
        buf = codec.compress(x, 0, return_latents=True, buffered=True)
        # one stream per image instead of one per slice
        assert len(buf["strings"][0]) == 1
        assert len(buf["strings"][0][0]) == x.shape[0]
        dec = codec.decompress(buf)
        np.testing.assert_array_equal(np.asarray(buf["y_hat_base"]),
                                      np.asarray(dec["y_hat"]))
        # buffered saves the per-message flush overhead
        b_per = sum(len(s) for sl in per["strings"][0] for s in sl)
        b_buf = sum(len(s) for sl in buf["strings"][0] for s in sl)
        assert b_buf < b_per


    def test_wacnn_reference_geometry_roundtrip(self, x):
        """The 'cnn' registry entry at the reference's own slice geometry:
        M=320, dim_chunk=32 -> 10 slices with the 5-slice mean-support cap
        (reference cnn.py:26-133, compress 244-281 / decompress 283-345).
        Narrow N/ParamNet widths keep the CPU test fast; the support
        topology is the reference's."""
        from epic_tpu.codec import PICCodec

        w = get_model("cnn", n=32, m=320, dim_chunk=32,
                      param_net_widths=(48, 32))
        assert w.ns0 == 10 and w.max_support_slices == 5
        assert w._n_slots_base == 5
        v = w.init({"params": jax.random.key(1)}, x, method="init_all")
        codec = PICCodec(w, v)
        buf = codec.compress(x, 0, return_latents=True, buffered=True)
        # WACNN layout: ONE buffered y-stream per image (cnn.py:244-281)
        assert len(buf["strings"][0]) == 1
        assert len(buf["strings"][0][0]) == x.shape[0]
        dec = codec.decompress(buf)
        np.testing.assert_array_equal(np.asarray(buf["y_hat_base"]),
                                      np.asarray(dec["y_hat"]))
        # per-slice layout decodes identically (stream framing only)
        per = codec.compress(x, 0, return_latents=True)
        dec2 = codec.decompress(per)
        np.testing.assert_array_equal(np.asarray(dec["y_hat"]),
                                      np.asarray(dec2["y_hat"]))


class TestParallelEval:
    def test_data_parallel_eval_on_mesh(self, x):
        from epic_tpu.parallel import (make_mesh, make_parallel_eval_step,
                                       replicate, shard_batch)

        model = get_model("pic", **TINY_PIC)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, x, method="init_all")
        mesh = make_mesh(2)
        step = make_parallel_eval_step(model, mesh)
        params = replicate(v["params"], mesh)
        batch = shard_batch(x, mesh)  # B=2 -> 1 per device
        x_hat, bpp, mse = step(params, batch, jnp.float32(5.0))
        assert x_hat.shape == x.shape
        assert float(bpp) > 0 and np.isfinite(np.asarray(mse)).all()


class TestReviewFixes:
    """Regression tests for the round-1 code-review findings."""

    def test_non_all_scalable_support_is_decoded_slices(self, x):
        m = get_model("pic", all_scalable=False, **TINY_PIC)
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        out = m.apply(v, x, 5.0, False,
                      method=m.forward_single_quality)
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        # multi-quality path too
        out2 = m.apply(v, x, [0, 2.0, 10], False)
        assert out2["x_hat"].shape[0] == 3
        # and it actually differs from the all_scalable model with the
        # same weights (different support conditioning)
        m2 = get_model("pic", all_scalable=True, **TINY_PIC)
        out3 = m2.apply(v, x, 5.0, False,
                        method=m2.forward_single_quality)
        assert not np.allclose(np.asarray(out["x_hat"]),
                               np.asarray(out3["x_hat"]))

    def test_non_all_scalable_codec_roundtrip_bit_exact(self, x):
        """all_scalable=False real codec: per-slice interleaved decode
        reproduces the encoder's latent bitwise at several qualities, and
        the progressive (shell) codec refuses the config with a clear
        error (reference pic.py:671-967 handles both configs)."""
        m = get_model("pic", all_scalable=False, **TINY_PIC)
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        codec = PICCodec(m, v)
        sizes = []
        for q in (0.5, 2.0, 10.0):
            enc = codec.compress(x, quality=q, return_latents=True)
            dec = codec.decompress(enc)
            np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                          np.asarray(dec["y_hat"]))
            assert dec["x_hat"].shape == x.shape
            sizes.append(sum(len(s) for sl in enc["strings"][0]
                             for s in sl))
        # more quality -> more transmitted residual mass
        assert sizes[0] <= sizes[1] <= sizes[2]

        from epic_tpu.codec import progressive_encode
        with pytest.raises(ValueError, match="all_scalable"):
            progressive_encode(codec, x, q_list=[0.5, 10.0])

    def test_non_all_scalable_rem_codec_roundtrip(self, x):
        """REM refinement through the interleaved (all_scalable=False)
        codec path: checkpoint-latent conditioning round-trips bitwise."""
        m = get_model("rem", all_scalable=False, **TINY_REM)
        v = m.init({"params": jax.random.key(3),
                    "noise": jax.random.key(4)}, x, method="init_all")
        codec = PICCodec(m, v)
        ckpt = codec.extract_checkpoint(x, 0.5)
        enc = codec.compress(x, quality=3.0, return_latents=True,
                             checkpoint_rep=ckpt)
        dec = codec.decompress(enc, checkpoint_rep=ckpt)
        np.testing.assert_array_equal(np.asarray(enc["y_hat"]),
                                      np.asarray(dec["y_hat"]))

    def test_negative_max_support_uses_all_slices(self, x):
        m = get_model("pic", max_support_slices=-1, **TINY_PIC)
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        out = m.apply(v, x, 0.0, False, method=m.forward_single_quality)
        assert np.isfinite(np.asarray(out["x_hat"])).all()

    def test_single_quality_hype_weight_is_batch_size(self, x):
        from epic_tpu.training.losses import rate_distortion_loss

        fake = {
            "x_hat": x,  # [B=2, ...] single-quality output
            "likelihoods": {
                "y": jnp.full((2, 4, 4, 32), 0.5),
                "z": jnp.full((2, 1, 1, 16), 0.5),
            },
        }
        out = rate_distortion_loss(fake, x, 0.01)
        # bpp_loss = bpp_base + B * bpp_hype (reference loss.py:23,116)
        expect = float(out["bpp_base"]) + 2 * float(out["bpp_hype"])
        assert abs(float(out["bpp_loss"]) - expect) < 1e-6

    def test_data_loader_deterministic(self):
        import tempfile
        from epic_tpu.data import ImageFolder, data_loader
        from PIL import Image

        with tempfile.TemporaryDirectory() as d:
            rng = np.random.default_rng(0)
            for i in range(4):
                Image.fromarray(
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8)
                ).save(f"{d}/img{i}.png")
            ds = ImageFolder(d, split="", patch_size=32)
            b1 = list(data_loader(ds, 2, seed=7, steps=3))
            b2 = list(data_loader(ds, 2, seed=7, steps=3))
            for a, b in zip(b1, b2):
                np.testing.assert_array_equal(a, b)

    def test_parser_no_flags(self):
        from epic_tpu.utils.parser import parse_train_args

        a = parse_train_args(["--no_delta_encode", "--no_all_scalable"])
        assert not a.delta_encode and not a.all_scalable
        assert a.total_mu_rep  # untouched defaults stay on


class TestSingleBranchConfigs:
    """The multiple_*=False variants (reference supports mixed configs;
    builder.py:20-31,55-66,112-135)."""

    def test_single_everything_pic_roundtrip(self, x):
        m = get_model("pic", n=16, m=32, division=(16, 32), dim_chunk=8,
                      param_net_widths=(24, 16), multiple_encoder=False,
                      multiple_decoder=False, multiple_hyperprior=False)
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        out = m.apply(v, x, 5.0, False, method=m.forward_single_quality)
        assert np.isfinite(np.asarray(out["x_hat"])).all()
        codec = PICCodec(m, v)
        o = codec.compress(x, 3.0, return_latents=True)
        d = codec.decompress(o)
        np.testing.assert_array_equal(np.asarray(o["y_hat"]),
                                      np.asarray(d["y_hat"]))

    def test_mixed_config_forward(self, x):
        # dual encoder, single decoder, dual hyperprior
        m = get_model("pic", n=16, m=32, division=(16, 32), dim_chunk=8,
                      param_net_widths=(24, 16), multiple_decoder=False)
        v = m.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)}, x, method="init_all")
        out = m.apply(v, x, [0, 10], False)
        assert out["x_hat"].shape == (2, 2, 64, 64, 3)
        assert np.isfinite(np.asarray(out["x_hat"])).all()


class TestNonFiniteGradGuard:
    """apply_if_finite wrapping (training/state.py): one non-finite
    gradient must NOT poison params through clip_by_global_norm (inf
    global norm -> NaN scale -> NaN tree — observed once at flagship
    step ~30.7k); the bad update is skipped and training continues."""

    def test_poisoned_update_skipped_then_recovers(self):
        from epic_tpu.training.state import (create_train_state,
                                             get_learning_rate,
                                             set_learning_rate)

        params = {"g_s_1": {"w": jnp.ones((4,))},
                  "g_a_1": {"w": jnp.ones((3,))},
                  "entropy_bottleneck": {"quantiles": jnp.ones((2,))}}
        st = create_train_state(params, "first_train")
        g = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
        g_bad = jax.tree.map(lambda p: jnp.full_like(p, np.inf), params)
        st2 = st.apply_main(g)
        st3 = st2.apply_main(g_bad)   # skipped: params unchanged
        for a, b in zip(jax.tree.leaves(st2.params),
                        jax.tree.leaves(st3.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        st4 = st3.apply_main(g)       # recovers
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(st4.params))
        # LR plumbing still reaches through ApplyIfFiniteState
        assert np.isclose(get_learning_rate(st4), 1e-4, rtol=1e-5)
        st5 = set_learning_rate(st4, 5e-5)
        assert np.isclose(get_learning_rate(st5), 5e-5, rtol=1e-5)
        # aux optimizer guarded too
        st6 = st5.apply_aux(g_bad)
        for a, b in zip(jax.tree.leaves(st5.params),
                        jax.tree.leaves(st6.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
