"""File codec CLI: standalone .epic container round-trips.

Unlike the reference demo (which decodes from in-memory state and shares
encoder-extracted REM checkpoint latents with the decoder,
reference demo.py:86-93), the .epic container embeds the check-level
streams, so the decoder rebuilds the checkpoint latents from transmitted
bits alone. The bitwise test here is the encoder-simulates-decoder
invariant applied to that path.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_path(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("codec") / "img.png"
    arr = (np.random.default_rng(1).random((70, 66, 3)) * 255).astype(
        np.uint8)  # odd size: exercises pad/unpad via stored orig_size
    Image.fromarray(arr).save(p)
    return str(p)


class TestContainerAux:
    def test_dict_scalar_roundtrip(self):
        from epic_tpu.codec import dump_bitstreams, load_bitstreams

        bs = {"q_list": [0.5], "shape": (2, 2), "layout": "messages",
              "z": [b"zz"], "base": [[b"b0"]], "progressive": [[b"p0"]],
              "ckpt_streams": [
                  {"strings": [[[b"y0"]], [b"z0"]], "shape": [2, 2],
                   "quality": 0.5, "buffered": False}],
              "meta": {"orig_size": [70, 66], "rems": True}}
        out = load_bitstreams(dump_bitstreams(bs))
        assert out["z"] == [b"zz"] and out["base"] == [[b"b0"]]
        st = out["ckpt_streams"][0]
        assert st["strings"] == [[[b"y0"]], [b"z0"]]
        assert st["quality"] == 0.5 and st["buffered"] is False
        assert out["meta"]["orig_size"] == [70, 66]

    def test_legacy_container_still_loads(self):
        # no aux keys -> byte layout identical to the r2 format
        from epic_tpu.codec import dump_bitstreams, load_bitstreams

        bs = {"q_list": [1.0], "shape": (1, 1), "layout": "messages",
              "z": [b"z"], "base": [[b"b"]], "progressive": [[b"p"]]}
        out = load_bitstreams(dump_bitstreams(bs))
        assert "ckpt_streams" not in out and "meta" not in out
        assert out["progressive"] == [[b"p"]]


class TestFileCodecCli:
    def test_rem_file_roundtrip_and_decoder_side_checkpoints(
            self, img_path, tmp_path):
        import jax.numpy as jnp

        from epic_tpu.cli.codec import _build_codec, _decode_checkpoints, main
        from epic_tpu.codec import load_bitstreams

        epic = str(tmp_path / "img.epic")
        recon = str(tmp_path / "recon.png")
        main(["compress", img_path, epic, "--tiny", "--model", "rem",
              "--q_levs", "0.5", "10.0"])
        assert os.path.getsize(epic) > 0
        main(["decompress", epic, recon, "--tiny", "--model", "rem"])
        from PIL import Image

        arr = np.asarray(Image.open(recon))
        assert arr.shape == (70, 66, 3)

        # decoder-side checkpoint latents == encoder-side extraction
        # (bitwise): rebuild the same tiny codec and compare
        class A:
            checkpoint = "none"
            tiny = True
            model = "rem"

        codec = _build_codec(A())
        with open(epic, "rb") as f:
            bs = load_bitstreams(f.read())
        assert bs["meta"]["rems"] and len(bs["ckpt_streams"]) == 2
        dec_cks = _decode_checkpoints(codec, bs["ckpt_streams"])

        from epic_tpu.data.datasets import _load_image
        from epic_tpu.utils.padding import pad_image

        x = jnp.asarray(_load_image(img_path))[None]
        xp, _ = pad_image(x)
        prev = None
        for cl, dec_ck in zip(codec.model.check_levels, dec_cks):
            prev = codec.extract_checkpoint(xp, float(cl),
                                            checkpoint_rep=prev)
            assert np.array_equal(np.asarray(prev), np.asarray(dec_ck))

    def test_info(self, img_path, tmp_path, capsys):
        from epic_tpu.cli.codec import main

        epic = str(tmp_path / "img.epic")
        main(["compress", img_path, epic, "--tiny", "--model", "pic",
              "--q_levs", "0.5", "10.0"])
        main(["info", epic])
        out = capsys.readouterr().out
        assert "levels=2" in out and "layout=stream" in out

    def test_cnn_single_stream_file(self, img_path, tmp_path):
        from epic_tpu.cli.codec import main

        epic = str(tmp_path / "img.epic")
        recon = str(tmp_path / "recon.png")
        main(["compress", img_path, epic, "--tiny", "--model", "cnn"])
        main(["decompress", epic, recon, "--tiny", "--model", "cnn"])
        from PIL import Image

        assert np.asarray(Image.open(recon)).shape == (70, 66, 3)
