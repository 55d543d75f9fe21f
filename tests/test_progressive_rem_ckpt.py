"""Tests: REM-refined progressive bitstream + orbax checkpoint round-trip.

Reference behaviors: demo.py REM flow (checkpoint-latent chaining,
demo.py:86-93,126-153), functions_encode/decode REM refinement, and
config-carrying checkpoints (train.py:361-384).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.models import get_model
from epic_tpu.codec import PICCodec, progressive_decode, progressive_encode

TINY_REM = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                param_net_widths=(24, 16), check_levels=(0.5, 2.0),
                rem_dimension="middle")


@pytest.fixture(scope="module")
def rem_codec():
    model = get_model("rem", **TINY_REM)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    v = model.init({"params": jax.random.key(1), "noise": jax.random.key(2)},
                   x, method="init_all")
    return model, v, x, PICCodec(model, v)


class TestREMProgressive:
    def test_rem_progressive_roundtrip_deterministic(self, rem_codec):
        model, v, x, codec = rem_codec
        ckpts, prev = [], None
        for cl in model.check_levels:
            prev = codec.extract_checkpoint(x, cl, checkpoint_rep=prev)
            ckpts.append(prev)
        q_list = [0.5, 2.0, 10.0]
        bs, bits = progressive_encode(codec, x, q_list, rems=True,
                                      y_checkpoints=ckpts)
        r1 = progressive_decode(codec, bs, 3, {}, rems=True,
                                y_checkpoints=ckpts)
        r2 = progressive_decode(codec, bs, 3, {}, rems=True,
                                y_checkpoints=ckpts)
        np.testing.assert_array_equal(np.asarray(r1["y_hat"]),
                                      np.asarray(r2["y_hat"]))
        # shell compaction: empty shells cost exactly 0 bits
        assert sum(bits[2]) > 0 and all(b >= 0 for b in bits[2])

    def test_rem_stream_differs_from_plain(self, rem_codec):
        model, v, x, codec = rem_codec
        ckpts, prev = [], None
        for cl in model.check_levels:
            prev = codec.extract_checkpoint(x, cl, checkpoint_rep=prev)
            ckpts.append(prev)
        q_list = [2.0, 10.0]
        bs_rem, _ = progressive_encode(codec, x, q_list, rems=True,
                                       y_checkpoints=ckpts,
                                       layout="messages")
        bs_plain, _ = progressive_encode(codec, x, q_list,
                                         layout="messages")
        rem_blob = b"".join(s for sl in bs_rem["progressive"] for s in sl)
        plain_blob = b"".join(s for sl in bs_plain["progressive"]
                              for s in sl)
        assert rem_blob != plain_blob
        # base stream is REM-independent
        assert bs_rem["base"] == bs_plain["base"]

    def test_rem_incremental_equals_fresh(self, rem_codec):
        model, v, x, codec = rem_codec
        ckpts, prev = [], None
        for cl in model.check_levels:
            prev = codec.extract_checkpoint(x, cl, checkpoint_rep=prev)
            ckpts.append(prev)
        q_list = [0.5, 2.0, 10.0]
        bs, _ = progressive_encode(codec, x, q_list, rems=True,
                                   y_checkpoints=ckpts)
        cache = {}
        for j in range(1, 4):
            inc = progressive_decode(codec, bs, j, cache, rems=True,
                                     y_checkpoints=ckpts)
            fresh = progressive_decode(codec, bs, j, {}, rems=True,
                                       y_checkpoints=ckpts)
            np.testing.assert_array_equal(np.asarray(inc["y_hat"]),
                                          np.asarray(fresh["y_hat"]))


class TestCheckpointIO:
    def test_save_load_roundtrip(self, rem_codec, tmp_path):
        from epic_tpu.training import load_checkpoint, save_checkpoint

        model, v, x, codec = rem_codec
        cfg = dict(TINY_REM)
        cfg["model"] = "rem"
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, v["params"], cfg, step=7, is_best=True)
        model2, params2, cfg2, step = load_checkpoint(d, "best")
        assert step == 7
        assert cfg2["model"] == "rem"
        assert type(model2).__name__ == "VarianceMaskingPICREM"
        assert tuple(model2.check_levels) == (0.5, 2.0)
        # params equal
        a = jax.tree.leaves(v["params"])
        b = jax.tree.leaves(params2)
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        # and produce identical outputs
        o1 = model.apply({"params": v["params"]}, x, 3.0, False)
        o2 = model2.apply({"params": params2}, x, 3.0, False)
        np.testing.assert_array_equal(np.asarray(o1["x_hat"]),
                                      np.asarray(o2["x_hat"]))

    def test_artifact_npz_roundtrip(self, rem_codec, tmp_path):
        """Compact committed-artifact format (config.json + npz): loads
        through the same load_checkpoint entry; values equal up to the
        bf16 storage cast and the de-padding of dead stacked rows
        (zero_dead_rows — functionally a no-op, tested bitwise in
        test_scan_chains.py)."""
        from epic_tpu.training import load_checkpoint
        from epic_tpu.training.checkpoint import (save_artifact,
                                                  zero_dead_rows)

        model, v, x, codec = rem_codec
        cfg = dict(TINY_REM)
        cfg["model"] = "rem"
        d = str(tmp_path / "artifact")
        out = save_artifact(d, v["params"], cfg, step=11)
        assert out.endswith("last.npz")
        model2, params2, cfg2, step = load_checkpoint(d)
        assert step == 11 and cfg2["model"] == "rem"
        expected = zero_dead_rows(v["params"], model)
        a, b = jax.tree.leaves(expected), jax.tree.leaves(params2)
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            assert pb.dtype == jnp.float32
            np.testing.assert_array_equal(
                np.asarray(pa).astype(jnp.bfloat16).astype(np.float32),
                np.asarray(pb))

    def test_config_overrides(self, rem_codec, tmp_path):
        from epic_tpu.training import load_checkpoint, save_checkpoint

        model, v, _, _ = rem_codec
        cfg = dict(TINY_REM)
        cfg["model"] = "rem"
        d = str(tmp_path / "ckpt2")
        save_checkpoint(d, v["params"], cfg)
        model2, _, cfg2, _ = load_checkpoint(
            d, config_overrides={"check_levels": (0.1, 1.0)})
        assert tuple(model2.check_levels) == (0.1, 1.0)


class TestAutoCheckpoints:
    def test_fused_auto_extraction_equals_explicit(self, rem_codec):
        """progressive_encode_start(rems=True, y_checkpoints=None)
        auto-extracts the chained check-level latents fused into the
        encode; they must be BITWISE the chained codec extraction, and
        the resulting stream must equal the explicit-checkpoint encode
        (this is the bench's n_ck>=2 path)."""
        from epic_tpu.codec.progressive import (progressive_encode_finish,
                                                progressive_encode_start)

        model, v, x, codec = rem_codec
        q_list = [0.5, 2.0, 10.0]
        st = progressive_encode_start(codec, x, q_list, rems=True)
        ckpts, prev = [], None
        for j, cl in enumerate(model.check_levels):
            prev = codec.extract_checkpoint(x, float(cl),
                                            checkpoint_rep=prev)
            ckpts.append(prev)
            np.testing.assert_array_equal(
                np.asarray(st["auto_ckpts"][j]), np.asarray(prev))
        bs, bits = progressive_encode_finish(codec, st)
        bs2, bits2 = progressive_encode(codec, x, q_list, rems=True,
                                        y_checkpoints=ckpts)
        assert b"".join(bs["y"]) == b"".join(bs2["y"])
        assert bits == bits2


class TestREMDisableOnLoad:
    def test_pic_checkpoint_as_rem_degrades_to_pic(self, tmp_path):
        """A 'rem' load whose checkpoint has no post_latent banks returns
        a working PIC codec with REMs off (reference load_state_dict,
        rem_pic.py:66-78) instead of failing downstream."""
        from epic_tpu.training import load_checkpoint, save_checkpoint

        cfg_pic = {k: v for k, v in TINY_REM.items()
                   if k not in ("check_levels", "rem_dimension")}
        model = get_model("pic", **cfg_pic)
        x = jax.random.uniform(jax.random.key(3), (1, 64, 64, 3))
        v = model.init({"params": jax.random.key(4),
                        "noise": jax.random.key(5)}, x, method="init_all")
        d = str(tmp_path / "pic_ckpt")
        save_checkpoint(d, v["params"], dict(cfg_pic, model="pic"))

        model2, params2, cfg2, _ = load_checkpoint(
            d, config_overrides={"model": "rem",
                                 "check_levels": (0.5, 2.0),
                                 "rem_dimension": "middle"})
        assert cfg2["model"] == "pic"
        assert type(model2).__name__ == "VarianceMaskingPIC"
        codec = PICCodec(model2, {"params": params2})
        out = codec.compress(x, quality=1.0)
        rec = codec.decompress(out)
        ref = codec.compress(x, quality=1.0, return_latents=True)
        np.testing.assert_array_equal(np.asarray(rec["y_hat"]),
                                      np.asarray(ref["y_hat"]))

    def test_training_path_keeps_rem_model(self, tmp_path):
        """disable_rems_if_missing=False (the PIC->REM stage transition)
        still returns the REM model so the trainer can fresh-init banks."""
        from epic_tpu.training import load_checkpoint, save_checkpoint

        cfg_pic = {k: v for k, v in TINY_REM.items()
                   if k not in ("check_levels", "rem_dimension")}
        model = get_model("pic", **cfg_pic)
        x = jnp.zeros((1, 64, 64, 3))
        v = model.init({"params": jax.random.key(6),
                        "noise": jax.random.key(7)}, x, method="init_all")
        d = str(tmp_path / "pic_ckpt2")
        save_checkpoint(d, v["params"], dict(cfg_pic, model="pic"))
        model2, _, cfg2, _ = load_checkpoint(
            d, config_overrides={"model": "rem",
                                 "check_levels": (0.5,)},
            disable_rems_if_missing=False)
        assert cfg2["model"] == "rem"
        assert type(model2).__name__ == "VarianceMaskingPICREM"


class TestExtendRemBanks:
    def test_extend_reindexes_trained_bank(self, rem_codec, tmp_path):
        """tools/extend_rem_banks: growing check_levels re-indexes trained
        banks to the new index with the same lower bracket edge (bank j
        covers (c_j, c_{j+1}], rem_pic.py:200-214) and fresh-inits only
        the new brackets."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tools"))
        import extend_rem_banks
        from epic_tpu.training import load_checkpoint, save_checkpoint

        model, v, x, codec = rem_codec  # check_levels (0.5, 2.0)
        cfg = dict(TINY_REM, model="rem")
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst" / "rems")
        save_checkpoint(src, v["params"], cfg, step=3)
        extend_rem_banks.main([src, dst, "--check_levels",
                               "0.1", "0.5", "2.0"])
        model2, params2, cfg2, step2 = load_checkpoint(dst)
        assert tuple(model2.check_levels) == (0.1, 0.5, 2.0)
        assert step2 == 0
        # trained banks moved: old bank 0 (edge 0.5) -> new bank 1,
        # old bank 1 (edge 2.0) -> new bank 2; bank 0 is fresh
        for old_j, new_j in ((0, 1), (1, 2)):
            a = jax.tree.leaves(v["params"][f"post_latent_{old_j}"])
            b = jax.tree.leaves(params2[f"post_latent_{new_j}"])
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(pa),
                                              np.asarray(pb))
        fresh0 = jax.tree.leaves(params2["post_latent_0"])
        old0 = jax.tree.leaves(v["params"]["post_latent_0"])
        assert any(not np.array_equal(np.asarray(pa), np.asarray(pb))
                   for pa, pb in zip(fresh0, old0))
        # journal primes a resumable rems stage
        with open(tmp_path / "dst" / "progress.json") as f:
            import json
            assert json.load(f)["stage"] == "rems"


class TestDeviceExtract:
    def test_device_extract_bitwise_equals_codec_extract(self, rem_codec):
        """extract_checkpoint_device (device-only, no host entropy coding)
        must be BITWISE the compress-based extract_checkpoint — the bench
        feeds it to both encoder and decoder, and cli/codec transmits the
        compress-based one (chained: 2nd level conditioned on the 1st)."""
        model, v, x, codec = rem_codec
        prev_c = prev_d = None
        for cl in model.check_levels:
            prev_c = codec.extract_checkpoint(x, float(cl),
                                              checkpoint_rep=prev_c)
            prev_d = codec.extract_checkpoint_device(x, float(cl),
                                                     checkpoint_rep=prev_d)
            np.testing.assert_array_equal(np.asarray(prev_c),
                                          np.asarray(prev_d))

    def test_device_extract_base_quality(self, rem_codec):
        model, v, x, codec = rem_codec
        a = codec.extract_checkpoint(x, 0.0)
        b = codec.extract_checkpoint_device(x, 0.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
