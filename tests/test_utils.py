"""Tests for utils: padding, metrics, container edge cases, parsers,
anchors, logging.
"""

import json
import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

from epic_tpu.utils.padding import compute_padding, pad_image, unpad_image
from epic_tpu.utils.metrics import (AverageMeter, compute_msssim,
                                    compute_psnr, msssim_db)
from epic_tpu.utils.parser import (model_config_from_args, parse_demo_args,
                                   parse_train_args)
from epic_tpu.utils.comparison import anchor, load_anchors
from epic_tpu.codec.container import dump_bitstreams, load_bitstreams


class TestPadding:
    def test_kodak_exact(self):
        pad, unpad = compute_padding(512, 768, min_div=64)
        assert pad == (0, 0, 0, 0)

    def test_centered_pad_and_unpad_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).random((1, 300, 500, 3),
                                                        ).astype(np.float32))
        xp, unpad = pad_image(x, 64)
        assert xp.shape[1] % 64 == 0 and xp.shape[2] % 64 == 0
        back = unpad_image(xp, unpad)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_reference_formula(self):
        # reference: functions.py:191-218 centered padding
        pad, unpad = compute_padding(300, 500, min_div=64)
        left, right, top, bottom = pad
        assert left + right == 512 - 500
        assert top + bottom == 320 - 300
        assert abs(left - right) <= 1 and abs(top - bottom) <= 1


class TestMetrics:
    def test_psnr(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        assert abs(compute_psnr(a, b) - 20.0) < 1e-3
        assert compute_psnr(a, a) == float("inf")

    def test_msssim_identity_and_degradation(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 192, 192, 3)).astype(np.float32))
        s_same = compute_msssim(x, x)
        assert s_same > 0.999
        y = jnp.clip(x + 0.2 * jnp.asarray(
            rng.random((1, 192, 192, 3)).astype(np.float32)), 0, 1)
        assert compute_msssim(x, y) < s_same

    def test_msssim_db(self):
        assert abs(msssim_db(0.9) - 10.0) < 1e-6

    def test_msssim_bf16_input_matches_f32(self):
        # BENCH_r03 regression: codec hands bf16 x_hat to _ms_ssim_jit
        # directly; the jit must cast INSIDE (bf16 x*x makes the variance
        # terms cancel and produced msssim_db of 120 / -0.0).
        rng = np.random.default_rng(1)
        x = rng.random((1, 192, 192, 3)).astype(np.float32)
        y = np.clip(x + 0.05 * rng.standard_normal(x.shape,
                                                   ).astype(np.float32), 0, 1)
        s32 = compute_msssim(x, y)
        s16 = compute_msssim(jnp.asarray(x, jnp.bfloat16),
                             jnp.asarray(y, jnp.bfloat16))
        # bf16 rounds the INPUT pixels (~3 decimal digits) but the math
        # runs in f32, so the scores must be close and both sane
        assert 0.0 < s16 <= 1.0
        assert abs(s32 - s16) < 5e-3

    def test_msssim_golden_known_degradations(self):
        # golden sanity: constant-shift and noise degradations land in the
        # ranges pytorch_msssim gives (smooth, monotone with severity)
        rng = np.random.default_rng(2)
        base = rng.random((1, 192, 192, 3)).astype(np.float32) * 0.6 + 0.2
        scores = []
        for sigma in (0.01, 0.05, 0.15):
            y = np.clip(base + sigma * rng.standard_normal(
                base.shape).astype(np.float32), 0, 1)
            scores.append(compute_msssim(base, y))
        assert scores[0] > scores[1] > scores[2] > 0.1
        assert scores[0] > 0.98
        # physically possible values only — never negative / above 1
        for s in scores:
            assert 0.0 <= s <= 1.0

    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0, n=3)
        assert m.avg == pytest.approx(2.5)


class TestContainer:
    def test_empty_progressive(self):
        bs = {"q_list": [], "shape": (2, 3), "z": [b"zz"],
              "base": [[b"a", b"b"]], "progressive": []}
        out = load_bitstreams(dump_bitstreams(bs))
        assert out["progressive"] == []
        assert out["base"] == [[b"a", b"b"]]

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            load_bitstreams(b"NOTMAGIC" + b"\x00" * 16)

    def test_binary_safety(self):
        blob = bytes(range(256)) * 3
        bs = {"q_list": [1.0], "shape": (1, 1), "z": [blob],
              "base": [[blob]], "progressive": [[blob]]}
        out = load_bitstreams(dump_bitstreams(bs))
        assert out["z"][0] == blob


class TestParsers:
    def test_train_defaults_match_reference(self):
        a = parse_train_args([])
        assert a.N == 192 and a.M == 640
        assert a.division_dimension == [320, 640]
        assert a.lmbda_list == [0.0055, 0.04]
        assert a.mask_policy == "point-based-std"
        cfg = model_config_from_args(a)
        assert cfg["division"] == (320, 640)
        assert cfg["support_progressive_slices"] == 5

    def test_demo_default_qlevs(self):
        a = parse_demo_args(["--path_image", "x.png"])
        assert len(a.q_levs) == 15 and a.q_levs[-1] == 10

    def test_rem_config(self):
        a = parse_train_args(["--model", "rem", "--check_levels", "0.75"])
        cfg = model_config_from_args(a)
        assert cfg["check_levels"] == (0.75,)
        assert cfg["rem_dimension"] == "big"


class TestAnchors:
    def test_reference_curve_loaded(self):
        bpp, psnr = anchor("reference_pic")
        assert len(bpp) == 20 and len(psnr) == 20
        assert bpp == sorted(bpp)
        assert 29.0 < psnr[0] < 30.5 and 34.5 < psnr[-1] < 35.5

    def test_all_anchor_names(self):
        names = set(load_anchors())
        assert {"reference_pic", "tri_planet_23",
                "tri_planet_22", "train_fallback_base"} <= names


class TestLogging:
    def test_jsonl_sink(self, tmp_path):
        from epic_tpu.utils.logging import MetricsLogger

        lg = MetricsLogger(str(tmp_path))
        lg.log({"loss": 1.5, "bpp": jnp.float32(0.3)}, step=7)
        lg.close()
        rec = json.loads(open(os.path.join(tmp_path,
                                           "metrics.jsonl")).read())
        assert rec["step"] == 7 and abs(rec["bpp"] - 0.3) < 1e-6
