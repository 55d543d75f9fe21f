"""Tests: concurrent sweep pipeline (codec.pipeline.SweepPipeline).

The pipeline overlaps independent sweeps' host phases on worker threads;
its results must be BITWISE identical to serial encode/decode per batch —
concurrency is a scheduling change, never a semantic one.
"""

import numpy as np
import jax

from epic_tpu.models import get_model
from epic_tpu.models.pic import VarianceMaskingPIC
from epic_tpu.codec import (PICCodec, SweepPipeline,
                            progressive_encode, progressive_decode_all,
                            progressive_encode_start,
                            progressive_encode_finish)

TINY = dict(n=32, m=64, division=(32, 64), dim_chunk=8,
            param_net_widths=(32, 24))
TINY_REM = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                param_net_widths=(24, 16), check_levels=(0.5, 2.0),
                rem_dimension="middle")


def _batches(n, b=1, seed=0):
    return [jax.random.uniform(jax.random.key(seed + i), (b, 64, 64, 3))
            for i in range(n)]


class TestSweepPipeline:
    def test_matches_serial_bitwise(self):
        model = VarianceMaskingPIC(**TINY)
        xs = _batches(4, b=2)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, xs[0], [0, 10], True)
        codec = PICCodec(model, v)
        q_list = [0.5, 2.0, 10.0]

        pipe = SweepPipeline(codec, q_list, workers=3)
        results = list(pipe.run(xs))
        assert len(results) == len(xs)

        for x, res in zip(xs, results):
            bs_ref, bits_ref = progressive_encode(codec, x, q_list)
            out_ref = progressive_decode_all(codec, bs_ref)
            # identical bitstream bytes and prefix tables
            assert res["bitstreams"]["y"] == bs_ref["y"]
            assert res["bitstreams"]["z"] == bs_ref["z"]
            np.testing.assert_array_equal(res["bitstreams"]["prefix"],
                                          bs_ref["prefix"])
            assert res["bits"][0] == bits_ref[0]
            assert res["bits"][1] == bits_ref[1]
            assert list(res["bits"][2]) == list(bits_ref[2])
            # identical reconstructions at every level
            np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                          np.asarray(out_ref["x_hat"]))

    def test_rem_chained_matches_serial(self):
        model = get_model("rem", **TINY_REM)
        xs = _batches(3, b=1, seed=10)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, xs[0],
                       method="init_all")
        codec = PICCodec(model, v)
        q_list = [0.5, 2.0, 10.0]

        pipe = SweepPipeline(codec, q_list, rems=True, workers=2)
        results = list(pipe.run(xs))

        for x, res in zip(xs, results):
            # serial path: the same fused auto-checkpoint extraction
            st = progressive_encode_start(codec, x, q_list, rems=True)
            bs_ref, _ = progressive_encode_finish(codec, st)
            out_ref = progressive_decode_all(
                codec, bs_ref, rems=True, y_checkpoints=st["auto_ckpts"])
            assert res["bitstreams"]["y"] == bs_ref["y"]
            for a, b in zip(res["ckpts"], st["auto_ckpts"]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(res["x_hat"]),
                                          np.asarray(out_ref["x_hat"]))

    def test_max_in_flight_bounds_and_order(self):
        model = VarianceMaskingPIC(**TINY)
        xs = _batches(5, b=1, seed=20)
        v = model.init({"params": jax.random.key(1),
                        "noise": jax.random.key(2)}, xs[0], [0, 10], True)
        codec = PICCodec(model, v)
        pipe = SweepPipeline(codec, [1.0, 10.0], workers=2, max_in_flight=2)
        results = list(pipe.run(xs))
        assert len(results) == 5
        # submission order preserved: result i encodes batch i
        for x, res in zip(xs, results):
            bs_ref, _ = progressive_encode(codec, x, [1.0, 10.0])
            assert res["bitstreams"]["y"] == bs_ref["y"]
