"""File-level codec CLI: compress an image file into a standalone
``.epic`` container, decompress it back at any progressive level.

The reference has no self-contained file codec — its single-bitstream
demo decodes from in-memory state and shares encoder-extracted REM
checkpoint latents with the decoder (reference demo.py:86-93,
functions_decode.py:58-229). Here the container embeds the check-level
streams themselves (real transmitted bits, counted in the reported bpp),
and ``decompress`` rebuilds the checkpoint latents from those streams
alone — bitwise identical to the encoder's extraction because the
encoder simulates the decoder (CLAUDE.md invariant; tested in
tests/test_cli_codec.py).

Usage:
  python -m epic_tpu.cli.codec compress IMG.png OUT.epic --checkpoint CKPT
  python -m epic_tpu.cli.codec decompress OUT.epic RECON.png \
      --checkpoint CKPT [--level K]
  python -m epic_tpu.cli.codec info OUT.epic
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser("epic_tpu file codec")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="image file -> .epic container")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--checkpoint", default="none")
    c.add_argument("--model", default="rem",
                   choices=["pic", "rem", "cnn"])
    c.add_argument("--tiny", action="store_true", default=False,
                   help="small random-init model (pipeline test)")
    c.add_argument("--q_levs", type=float, nargs="+",
                   default=[0.01, 0.05, 0.1, 0.25, 0.5, 0.6, 0.7, 0.8,
                            0.9, 1, 2, 3, 4, 4.5, 10])
    c.add_argument("--no_rems", action="store_true", default=False,
                   help="skip REM refinement even if the model has banks")

    d = sub.add_parser("decompress", help=".epic container -> image file")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--checkpoint", default="none")
    d.add_argument("--model", default="rem",
                   choices=["pic", "rem", "cnn"])
    d.add_argument("--tiny", action="store_true", default=False)
    d.add_argument("--level", type=int, default=-1,
                   help="progressive level (0=base, default=max)")

    i = sub.add_parser("info", help="print container layout/sizes")
    i.add_argument("input")
    return p.parse_args(argv)


def _build_codec(args):
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_compile_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from ..codec import PICCodec
    from ..models import get_model
    from ..training import load_checkpoint

    if args.checkpoint != "none":
        model, params, _, _ = load_checkpoint(args.checkpoint)
    elif args.tiny:
        cfg = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                   param_net_widths=(24, 16))
        if args.model == "rem":
            cfg.update(check_levels=(0.5, 2.0), rem_dimension="middle")
        model = get_model(args.model, **cfg)
        params = model.init({"params": jax.random.key(0),
                             "noise": jax.random.key(1)},
                            jnp.zeros((1, 64, 64, 3)),
                            method="init_all")["params"]
    else:
        raise SystemExit("need --checkpoint or --tiny")
    return PICCodec(model, {"params": params})


def _decode_checkpoints(codec, ckpt_streams):
    """Rebuild REM checkpoint latents decoder-side from the embedded
    check-level streams (chained, like extract_checkpoint)."""
    y_checkpoints, prev = [], None
    for st in ckpt_streams:
        st = dict(st)
        st["shape"] = tuple(st["shape"])
        dec = codec.decompress(st, checkpoint_rep=prev)
        prev = dec["y_hat"]
        y_checkpoints.append(prev)
    return y_checkpoints


def cmd_compress(args):
    import numpy as np

    from ..codec import dump_bitstreams, progressive_encode
    from ..data.datasets import _load_image
    from ..utils.padding import pad_image

    codec = _build_codec(args)
    model = codec.model
    img = _load_image(args.input)
    import jax.numpy as jnp

    x = jnp.asarray(img)[None]
    h, w = int(x.shape[1]), int(x.shape[2])
    npix = h * w
    xp, _ = pad_image(x)

    t0 = time.time()
    if model.ns1 == model.ns0:
        # single-quality model (WACNN): one buffered stream, wrapped in
        # the container's aux slot
        out = codec.compress(xp, quality=0, buffered=True)
        bs = {"q_list": [], "shape": tuple(out["shape"]), "z": [],
              "base": [], "progressive": [], "layout": "messages",
              "ckpt_streams": [
                  {"strings": out["strings"],
                   "shape": list(out["shape"]),
                   "quality": 0.0,
                   "buffered": bool(out.get("buffered")),
                   "io_chain": bool(out.get("io_chain"))}],
              "meta": {"orig_size": [h, w], "single": True}}
    else:
        check_levels = (list(getattr(model, "check_levels", ()) or ())
                        if not args.no_rems else [])
        ckpt_streams, y_checkpoints, prev = [], [], None
        for cl in check_levels:
            out = codec.compress(xp, quality=float(cl),
                                 return_latents=True,
                                 checkpoint_rep=prev)
            ckpt_streams.append(
                {"strings": out["strings"], "shape": list(out["shape"]),
                 "quality": float(cl),
                 "buffered": bool(out.get("buffered")),
                 "io_chain": bool(out.get("io_chain"))})
            # quality <= 0 compresses the base layer only, which returns
            # 'y_hat_base' instead of 'y_hat' (same selection logic as
            # PICCodec.extract_checkpoint)
            prev = out["y_hat"] if float(cl) > 0 else out["y_hat_base"]
            y_checkpoints.append(prev)
        bs, bits = progressive_encode(
            codec, xp, args.q_levs, rems=bool(y_checkpoints),
            y_checkpoints=y_checkpoints or None)
        bs["ckpt_streams"] = ckpt_streams
        bs["meta"] = {"orig_size": [h, w],
                      "check_levels": [float(c) for c in check_levels],
                      "rems": bool(y_checkpoints),
                      "bits": [float(bits[0]), float(bits[1]),
                               [float(b) for b in bits[2]]]}
    blob = dump_bitstreams(bs)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"{args.input} [{h}x{w}] -> {args.output}: {len(blob)} bytes "
          f"({len(blob) * 8.0 / npix:.4f} bpp file, incl. container "
          f"header) in {time.time() - t0:.2f}s")
    return len(blob)


def cmd_decompress(args):
    import numpy as np

    from ..codec import load_bitstreams, progressive_decode
    from ..utils.padding import compute_padding, unpad_image

    codec = _build_codec(args)
    with open(args.input, "rb") as f:
        bs = load_bitstreams(f.read())
    meta = bs.get("meta") or {}
    h, w = meta.get("orig_size", (None, None))

    t0 = time.time()
    if meta.get("single"):
        st = dict(bs["ckpt_streams"][0])
        st["shape"] = tuple(st["shape"])
        out = codec.decompress(st)
        x_hat = out["x_hat"]
    else:
        rems = bool(meta.get("rems"))
        y_checkpoints = (_decode_checkpoints(codec, bs["ckpt_streams"])
                         if rems else None)
        nl = len(bs["q_list"])
        level = args.level if args.level >= 0 else nl
        if level > nl:
            raise SystemExit(f"level {level} > max {nl}")
        out = progressive_decode(codec, bs, level, cache={}, rems=rems,
                                 y_checkpoints=y_checkpoints)
        x_hat = out["x_hat"]
    if h is not None:
        _, unpad = compute_padding(int(h), int(w))
        x_hat = unpad_image(x_hat, unpad)
    arr = (np.clip(np.asarray(x_hat[0]), 0, 1) * 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(arr).save(args.output)
    print(f"{args.input} -> {args.output} "
          f"[{arr.shape[0]}x{arr.shape[1]}] in {time.time() - t0:.2f}s")
    return arr


def cmd_info(args):
    with open(args.input, "rb") as f:
        data = f.read()
    from ..codec import load_bitstreams

    bs = load_bitstreams(data)
    meta = bs.get("meta") or {}
    print(f"{args.input}: {len(data)} bytes, layout={bs['layout']}, "
          f"levels={len(bs['q_list'])}, z_shape={bs['shape']}, "
          f"meta={meta}")
    if bs.get("layout") == "stream" and "prefix" in bs:
        import numpy as np

        pfx = np.asarray(bs["prefix"])
        for b in range(pfx.shape[0]):
            print(f"  img {b}: per-level y-prefix bytes "
                  f"{pfx[b].tolist()}")
    return bs


def main(argv=None):
    args = parse_args(argv)
    if args.cmd == "compress":
        return cmd_compress(args)
    if args.cmd == "decompress":
        return cmd_decompress(args)
    return cmd_info(args)


if __name__ == "__main__":
    main(sys.argv[1:])
