"""Integration tests: VarianceMaskingPIC forward + real codec round-trips.

The reference's implicit invariants promoted to tests (SURVEY.md §4):
- decompress(compress(x)) reconstructs y_hat bit-exactly (the encoder
  simulates the decoder, pic.py:689,741)
- encoder- and decoder-side variance masks are identical (never transmitted)
- coded size grows monotonically with quality
- the progressive single-bitstream decode equals the random-access codec's
  reconstruction at every quality level
- estimated (likelihood) bpp tracks real (string-length) bpp
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epic_tpu.models.pic import VarianceMaskingPIC
from epic_tpu.codec import (
    PICCodec,
    dump_bitstreams,
    load_bitstreams,
    progressive_decode,
    progressive_encode,
)

TINY = dict(n=32, m=64, division=(32, 64), dim_chunk=8,
            param_net_widths=(32, 24))


@pytest.fixture(scope="module")
def setup():
    model = VarianceMaskingPIC(**TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    v = model.init({"params": jax.random.key(1), "noise": jax.random.key(2)},
                   x, [0, 10], True)
    codec = PICCodec(model, v)
    return model, v, x, codec


class TestForward:
    def test_multi_quality_shapes(self, setup):
        model, v, x, _ = setup
        out = model.apply(v, x, [0, 1.0, 10], True,
                          rngs={"noise": jax.random.key(3)})
        assert out["x_hat"].shape == (3, 2, 64, 64, 3)
        assert out["likelihoods"]["y"].shape == (2, 4, 4, 32)
        assert out["likelihoods"]["y_prog"].shape == (2, 2, 4, 4, 64)
        assert np.isfinite(np.asarray(out["x_hat"])).all()

    def test_single_quality_bpp_monotone(self, setup):
        model, v, x, _ = setup

        def bpp(q):
            o = model.apply(v, x, q, False,
                            method=VarianceMaskingPIC.forward_single_quality)
            npix = x.shape[0] * x.shape[1] * x.shape[2]
            return sum(float(-jnp.log2(l).sum())
                       for l in jax.tree.leaves(o["likelihoods"])) / npix

        b = [bpp(q) for q in [0.0, 2.0, 5.0, 10.0]]
        assert b[0] < b[1] < b[2] < b[3]

    def test_traced_quality_equals_static(self, setup):
        model, v, x, _ = setup
        f = jax.jit(lambda vv, xx, q: model.apply(
            vv, xx, q, False,
            method=VarianceMaskingPIC.forward_single_quality))
        out_t = f(v, x, jnp.float32(5.0))
        out_s = model.apply(v, x, 5.0, False,
                            method=VarianceMaskingPIC.forward_single_quality)
        # jit(traced q) and eager(static q) are different compiled programs;
        # sigma values that land exactly on the quantile threshold may flip
        # in/out of the mask under reordered float reductions. Require the
        # overwhelming majority of pixels to agree tightly — only sparse
        # borderline flips are tolerable (the real codec guarantees bitwise
        # mask identity by running the SAME program on both sides).
        a = np.asarray(out_t["x_hat"])
        b = np.asarray(out_s["x_hat"])
        mismatch = np.abs(a - b) > 2e-5
        assert mismatch.mean() < 0.01, f"{mismatch.mean():.4%} mismatched"

    def test_training_forward_differentiable(self, setup):
        model, v, x, _ = setup

        def loss(params):
            out = model.apply({"params": params}, x, [0, 10], True,
                              rngs={"noise": jax.random.key(4)})
            lik = out["likelihoods"]
            bits = sum(-jnp.log(l).sum() for l in jax.tree.leaves(lik))
            mse = ((out["x_hat"] - x[None]) ** 2).mean()
            return bits * 1e-4 + mse

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(l).all() for l in leaves)
        # gradients reach the encoder, decoder and entropy params
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


class TestRealCodec:
    def test_base_roundtrip_bit_exact(self, setup):
        _, _, x, codec = setup
        out = codec.compress(x, quality=0, return_latents=True)
        dec = codec.decompress(out)
        np.testing.assert_array_equal(np.asarray(out["y_hat_base"]),
                                      np.asarray(dec["y_hat"]))

    def test_progressive_quality_roundtrip_bit_exact(self, setup):
        _, _, x, codec = setup
        out = codec.compress(x, quality=3.0, return_latents=True)
        dec = codec.decompress(out)
        np.testing.assert_array_equal(np.asarray(out["y_hat"]),
                                      np.asarray(dec["y_hat"]))

    def test_rate_monotone_in_quality(self, setup):
        _, _, x, codec = setup
        sizes = []
        for q in [0, 0.5, 2.0, 10.0]:
            o = codec.compress(x, quality=q)
            sizes.append(sum(len(s) for sl in o["strings"][0] for s in sl))
        assert sizes == sorted(sizes) and len(set(sizes)) == len(sizes)

    def test_estimated_vs_real_bpp(self, setup):
        model, v, x, codec = setup
        q = 10.0
        o = model.apply(v, x, q, False,
                        method=VarianceMaskingPIC.forward_single_quality)
        npix = x.shape[0] * x.shape[1] * x.shape[2]
        est = sum(float(-jnp.log2(l).sum())
                  for l in jax.tree.leaves(o["likelihoods"])) / npix
        out = codec.compress(x, quality=q)
        real_bits = (sum(len(s) for sl in out["strings"][0] for s in sl)
                     + sum(len(s) for s in out["strings"][1])) * 8
        real = real_bits / npix
        # real coding should be within ~15% of the entropy estimate on a
        # tiny random-weight model (plus per-message constant overhead)
        assert abs(real - est) / est < 0.25

    def test_codec_matches_eval_forward(self, setup):
        # The real codec must reconstruct exactly what the differentiable
        # eval forward predicts (the dual-path parity the reference checks
        # empirically, SURVEY.md §4).
        model, v, x, codec = setup
        for q in [0.0, 3.0]:
            fwd = model.apply(
                v, x, q, False,
                method=VarianceMaskingPIC.forward_single_quality)
            dec = codec.decompress(codec.compress(x, quality=q))
            np.testing.assert_allclose(np.asarray(dec["y_hat"]),
                                       np.asarray(fwd["y_hat"]),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(dec["x_hat"]),
                                       np.asarray(fwd["x_hat"]),
                                       atol=1e-3)


class TestProgressiveBitstream:
    def test_matches_random_access_bit_exact(self, setup):
        _, _, x, codec = setup
        q_list = [0.5, 2.0, 10.0]
        bs, bits = progressive_encode(codec, x, q_list)
        cache = {}
        for j, q in enumerate(q_list, start=1):
            r = progressive_decode(codec, bs, j, cache)
            ra = codec.decompress(
                codec.compress(x, quality=q, return_latents=True))
            np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                          np.asarray(ra["y_hat"]))

    def test_base_only_decode(self, setup):
        _, _, x, codec = setup
        bs, _ = progressive_encode(codec, x, [1.0, 10.0])
        r = progressive_decode(codec, bs, 0, {})
        ra = codec.decompress(codec.compress(x, quality=0))
        np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                      np.asarray(ra["y_hat"]))

    def test_container_roundtrip(self, setup):
        _, _, x, codec = setup
        bs, _ = progressive_encode(codec, x, [1.0, 10.0],
                                   layout="messages")
        blob = dump_bitstreams(bs)
        bs2 = load_bitstreams(blob)
        assert bs2["q_list"] == bs["q_list"]
        assert bs2["shape"] == bs["shape"]
        assert bs2["z"] == bs["z"]
        assert bs2["base"] == bs["base"]
        assert bs2["progressive"] == bs["progressive"]

    def test_container_roundtrip_stream(self, setup):
        _, _, x, codec = setup
        bs, _ = progressive_encode(codec, x, [1.0, 10.0])
        blob = dump_bitstreams(bs)
        bs2 = load_bitstreams(blob)
        assert bs2["layout"] == "stream"
        assert bs2["z"] == bs["z"]
        assert bs2["y"] == bs["y"]
        np.testing.assert_array_equal(bs2["prefix"], bs["prefix"])
        r = progressive_decode(codec, bs2, 2, {})
        r0 = progressive_decode(codec, bs, 2, {})
        np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                      np.asarray(r0["y_hat"]))

    def test_shell_bits_sum_to_full_quality(self, setup):
        _, _, x, codec = setup
        bs, bits = progressive_encode(codec, x, [0.5, 2.0, 10.0])
        bits_z, bits_base, bits_prog = bits
        assert all(b > 0 for b in bits_prog)

    def test_stream_layout_equals_messages_layout(self, setup):
        """The single-stream layout must reconstruct bitwise identically
        to the per-(shell,image) message layout at every level, while the
        transmitted y bytes shrink by the per-message flush overhead."""
        _, _, x, codec = setup
        q_list = [0.5, 2.0, 10.0]
        bs_s, bits_s = progressive_encode(codec, x, q_list)
        bs_m, bits_m = progressive_encode(codec, x, q_list,
                                          layout="messages")
        cs, cm = {}, {}
        for j in range(len(q_list) + 1):
            rs = progressive_decode(codec, bs_s, j, cs)
            rm = progressive_decode(codec, bs_m, j, cm)
            np.testing.assert_array_equal(np.asarray(rs["y_hat"]),
                                          np.asarray(rm["y_hat"]))
        # stream total <= messages total (flush amortized across shells)
        total_s = bits_s[1] + sum(bits_s[2])
        total_m = bits_m[1] + sum(bits_m[2])
        assert total_s <= total_m

    def test_encode_start_finish_interleaved(self, setup):
        """The pipelined seam (bench.py): dispatch batch k+1's device
        phase before finishing batch k's host phase — streams must be
        byte-identical to sequential encoding."""
        from epic_tpu.codec import (progressive_encode_finish,
                                    progressive_encode_start)

        _, _, x, codec = setup
        q_list = [0.5, 10.0]
        x2 = jnp.asarray(np.asarray(x)[:, ::-1].copy())
        st1 = progressive_encode_start(codec, x, q_list)
        st2 = progressive_encode_start(codec, x2, q_list)
        bs1, _ = progressive_encode_finish(codec, st1)
        bs2, _ = progressive_encode_finish(codec, st2)
        ref1, _ = progressive_encode(codec, x, q_list)
        ref2, _ = progressive_encode(codec, x2, q_list)
        assert bs1["y"] == ref1["y"] and bs1["z"] == ref1["z"]
        assert bs2["y"] == ref2["y"] and bs2["z"] == ref2["z"]

    def test_stream_prefix_truncation_decodes(self, setup):
        """Progressive transmission semantics: the last prefix[b, k] bytes
        of each y-stream must decode levels 0..k exactly (base = col 0)."""
        _, _, x, codec = setup
        q_list = [0.5, 2.0, 10.0]
        bs, _ = progressive_encode(codec, x, q_list)
        for q_ind in range(len(q_list) + 1):
            trunc = dict(bs)
            trunc["y"] = [
                blob[len(blob) - int(bs["prefix"][bi, q_ind]):]
                for bi, blob in enumerate(bs["y"])]
            r = progressive_decode(codec, trunc, q_ind, {})
            full = progressive_decode(codec, bs, q_ind, {})
            np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                          np.asarray(full["y_hat"]))


class TestDecodeAll:
    def test_matches_incremental_decode(self, setup):
        from epic_tpu.codec import progressive_decode_all

        _, _, x, codec = setup
        q_list = [0.5, 2.0, 10.0]
        bs, _ = progressive_encode(codec, x, q_list)
        allr = progressive_decode_all(codec, bs)
        assert allr["x_hat"].shape[0] == len(q_list) + 1
        cache = {}
        for j in range(len(q_list) + 1):
            inc = progressive_decode(codec, bs, j, cache)
            np.testing.assert_allclose(np.asarray(allr["x_hat"][j]),
                                       np.asarray(inc["x_hat"]),
                                       atol=1e-5)


class TestRDSweep:
    def test_rd_sweep_monotone(self, setup):
        from epic_tpu.training import rd_sweep

        _, _, x, codec = setup
        res = rd_sweep(codec, [np.asarray(x[0])], q_list=[1.0, 10.0])
        assert len(res["bpp"]) == 3
        assert res["bpp"] == sorted(res["bpp"])
        assert all(np.isfinite(res["psnr"]))


class TestIoChain:
    """The fused io-callback base chain (PICCodec._p_base_chain_io) vs the
    per-slice interleaved path: ONE executable shared by encode/decode/
    extract must produce bitwise-identical streams and latents to the
    fused-step interleave it replaces (base-chain fusion, VERDICT r4
    item 2). io mode is constructed EXPLICITLY — the production default
    is "scan" on every backend (the host-callback runtime hung/deadlocked
    under load on both axon-TPU and CPU; see PICCodec.__init__)."""

    @pytest.fixture()
    def io_codec(self, setup):
        model, v, x, _ = setup
        return model, v, x, PICCodec(model, v, io_chain=True)

    def test_streams_bitwise_equal_paths(self, io_codec):
        model, v, x, codec = io_codec
        codec_old = PICCodec(model, v, io_chain=False)
        for q in (0.0, 1.0):
            o_new = codec.compress(x, quality=q, return_latents=True)
            o_old = codec_old.compress(x, quality=q, return_latents=True)
            assert o_new["io_chain"] and not o_old["io_chain"]
            flat = lambda o: b"".join(  # noqa: E731
                s for sl in o["strings"][0] for s in sl)
            assert flat(o_new) == flat(o_old)
            key = "y_hat" if q > 0 else "y_hat_base"
            np.testing.assert_array_equal(np.asarray(o_new[key]),
                                          np.asarray(o_old[key]))

    def test_cross_path_decode(self, io_codec):
        """A stream encoded via the io chain decodes bit-exactly through
        BOTH decoder paths (the io_chain flag selects the encoder's path;
        cross-path decode covers io-incapable decode processes)."""
        model, v, x, codec = io_codec
        codec_old = PICCodec(model, v, io_chain=False)
        o = codec.compress(x, quality=1.0, return_latents=True)
        r_io = codec.decompress(o)
        o2 = dict(o, io_chain=False)
        r_old = codec_old.decompress(o2)
        np.testing.assert_array_equal(np.asarray(r_io["y_hat"]),
                                      np.asarray(o["y_hat"]))
        np.testing.assert_array_equal(np.asarray(r_old["y_hat"]),
                                      np.asarray(o["y_hat"]))

    def test_progressive_stream_equal_and_decodes(self, io_codec):
        from epic_tpu.codec import progressive_decode_all

        model, v, x, codec = io_codec
        codec_old = PICCodec(model, v, io_chain=False)
        q_list = [0.5, 2.0, 10.0]
        bs, bits = progressive_encode(codec, x, q_list)
        bs_old, bits_old = progressive_encode(codec_old, x, q_list)
        assert b"".join(bs["y"]) == b"".join(bs_old["y"])
        assert bits == bits_old
        r = progressive_decode_all(codec, bs)
        r_old = progressive_decode_all(codec_old, bs_old)
        np.testing.assert_array_equal(np.asarray(r["x_hat"]),
                                      np.asarray(r_old["x_hat"]))

    def test_buffered_roundtrip_io(self, io_codec):
        model, v, x, codec = io_codec
        o = codec.compress(x, quality=0.0, buffered=True,
                           return_latents=True)
        r = codec.decompress(o)
        np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                      np.asarray(o["y_hat_base"]))

    def test_extract_device_equals_codec_extract(self, setup):
        model, v, x, codec = setup
        a = codec.extract_checkpoint(x, 1.0)
        b = codec.extract_checkpoint_device(x, 1.0)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestScanChainMode:
    """chain_mode='scan' (the TPU default: the axon runtime can't compile
    io_callback custom calls): fused scan ENCODER + interleaved DECODER.
    The two executables must agree bitwise (verify_base_chain) and the
    streams must decode exactly."""

    @pytest.fixture(scope="class")
    def scan_codec(self, setup):
        model, v, x, _ = setup
        c = PICCodec(model, v)
        c.chain_mode = "scan"
        return model, v, x, c

    def test_verify_base_chain(self, scan_codec):
        model, v, x, codec = scan_codec
        assert codec.verify_base_chain(x)

    def test_scan_streams_equal_interleaved_and_decode(self, scan_codec):
        from epic_tpu.codec import progressive_decode_all

        model, v, x, codec = scan_codec
        codec_old = PICCodec(model, v, io_chain=False)
        o = codec.compress(x, quality=1.0, return_latents=True)
        assert not o["io_chain"]  # scan streams decode via interleave
        o_old = codec_old.compress(x, quality=1.0)
        flat = lambda oo: b"".join(  # noqa: E731
            s for sl in oo["strings"][0] for s in sl)
        assert flat(o) == flat(o_old)
        r = codec.decompress(o)
        np.testing.assert_array_equal(np.asarray(r["y_hat"]),
                                      np.asarray(o["y_hat"]))
        bs, bits = progressive_encode(codec, x, [0.5, 10.0])
        bs2, bits2 = progressive_encode(codec_old, x, [0.5, 10.0])
        assert b"".join(bs["y"]) == b"".join(bs2["y"])
        r1 = progressive_decode_all(codec, bs)
        r2 = progressive_decode_all(codec_old, bs2)
        np.testing.assert_array_equal(np.asarray(r1["x_hat"]),
                                      np.asarray(r2["x_hat"]))


class TestTransferWidening:
    """The tunnel-slimming paths: symbols cross D2H as int8 with
    int16/int32 widening flags, and H2D uploads pick the narrowest safe
    width. Out-of-range content must widen, not wrap."""

    def test_get_sym_width_selection(self, setup):
        # returns the NARROWEST width that holds the values (the C entropy
        # layer reads int8/16/32 directly; widening only on the flags)
        _, _, _, codec = setup
        for vals, want in (([3, -7, 127], np.int8),
                           ([200, -300, 5], np.int16),
                           ([40000, -2, 1], np.int32)):
            sym = jnp.asarray(np.array(vals, np.int32))
            out = codec._get_sym(
                sym.astype(jnp.int8), sym.astype(jnp.int16),
                sym, (jnp.abs(sym) > 127).any(),
                (jnp.abs(sym) > 32000).any())
            np.testing.assert_array_equal(out.astype(np.int32),
                                          np.array(vals, np.int32))
            assert out.dtype == want

    def test_h2d_sym_round_trips_all_widths(self, setup):
        # narrow upload + device widen: values exact, dtype always int32
        # so the shared enc/dec programs keep ONE dtype signature
        _, _, _, codec = setup
        for vals in ([1, -127, 127], [1, 300, -3000], [1, 40000, -5]):
            arr = codec._h2d_sym(np.array(vals, np.int32))
            assert arr.dtype == jnp.int32
            np.testing.assert_array_equal(np.asarray(arr),
                                          np.array(vals, np.int32))
