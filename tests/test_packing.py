"""Tunnel bit-packing round trips (device pack <-> host unpack).

The codec packs every dense buffer crossing the host<->device link to
its information width (PICCodec._p_pack4u/_p_pack4_sym/_p_pack6 on the
producing device side, progressive._unpack4u/_unpack4s/_unpack6 on the
host; the decoded-symbol canvas goes the other way via _pack4s_np /
_p_unpack4s_widen). All transforms must be exact bit moves — any loss
desyncs the bitstream. The end-to-end exercise is the existing
progressive round-trip tests (they run through the packed paths
unconditionally at the tiny config's widths).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def codec():
    import jax
    import jax.numpy as jnp
    from epic_tpu.codec import PICCodec
    from epic_tpu.models import get_model

    m = get_model("pic", n=32, m=64, division=(16, 32), dim_chunk=8,
                  param_net_widths=(24, 16))
    v = jax.jit(lambda: m.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 64, 64, 3)),
                               method="init_all"))()
    return PICCodec(m, v)


class TestPackRoundTrips:
    def test_pack4u(self, codec):
        from epic_tpu.codec.progressive import _unpack4u

        rng = np.random.default_rng(0)
        a = rng.integers(0, 16, (3, 2, 4, 6, 8)).astype(np.int8)
        p = np.asarray(codec._p_pack4u()(a))
        assert p.shape == a.shape[:-1] + (4,) and p.dtype == np.uint8
        np.testing.assert_array_equal(_unpack4u(p, 8), a)

    def test_pack4_sym_in_range(self, codec):
        from epic_tpu.codec.progressive import _unpack4s

        rng = np.random.default_rng(1)
        a = rng.integers(-8, 8, (2, 1, 3, 5, 8)).astype(np.int8)
        p, flag = codec._p_pack4_sym()(a)
        assert not bool(np.asarray(flag))
        np.testing.assert_array_equal(_unpack4s(np.asarray(p), 8), a)

    def test_pack4_sym_overflow_flags(self, codec):
        a = np.zeros((1, 1, 1, 1, 8), np.int8)
        for bad in (8, -9, 127, -128):
            a[..., 3] = bad
            _, flag = codec._p_pack4_sym()(a)
            assert bool(np.asarray(flag)), bad
        a[..., 3] = 7
        _, flag = codec._p_pack4_sym()(a)
        assert not bool(np.asarray(flag))

    def test_pack6(self, codec):
        from epic_tpu.codec.progressive import _unpack6

        rng = np.random.default_rng(2)
        a = rng.integers(0, 64, (4, 2, 3, 3, 8)).astype(np.int8)
        p = np.asarray(codec._p_pack6()(a))
        assert p.shape == a.shape[:-1] + (6,) and p.dtype == np.uint8
        np.testing.assert_array_equal(_unpack6(p, 8), a)

    def test_canvas_pack4s_h2d(self, codec):
        from epic_tpu.codec.progressive import _pack4s_np

        rng = np.random.default_rng(3)
        a = rng.integers(-8, 8, (2, 1, 4, 4, 8)).astype(np.int8)
        import jax.numpy as jnp

        dev = codec._p_unpack4s_widen()(jnp.asarray(_pack4s_np(a)))
        assert np.asarray(dev).dtype == np.int32
        np.testing.assert_array_equal(np.asarray(dev), a.astype(np.int32))

    def test_canvas_to_device_caches_and_falls_back(self, codec):
        from epic_tpu.codec.progressive import _canvas_to_device

        cache = {"decoded_upto": 3}
        a = np.full((1, 1, 2, 2, 8), 5, np.int8)
        d1 = _canvas_to_device(codec, cache, a)
        d2 = _canvas_to_device(codec, cache, a)
        assert d1 is d2  # cached by decoded_upto
        np.testing.assert_array_equal(np.asarray(d1), a.astype(np.int32))
        cache["decoded_upto"] = 4  # advancing the level invalidates
        a16 = np.full((1, 1, 2, 2, 8), 300, np.int16)  # 4-bit overflow
        d3 = _canvas_to_device(codec, cache, a16)
        np.testing.assert_array_equal(np.asarray(d3), a16.astype(np.int32))

    def test_pack_widths_guards(self, codec):
        from epic_tpu.codec.progressive import _pack_widths

        p4, p6 = _pack_widths(codec, 15)
        assert p4 and p6  # dim_chunk=8, 64-entry table
        p4, _ = _pack_widths(codec, 16)  # 17 shell ids don't fit 4 bits
        assert not p4
