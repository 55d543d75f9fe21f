"""Demo / validation CLI — the reference's demo.py equivalent.

Two modes (reference: src/demo.py:13-167):
- --fast_encdec: independent random-access encode/decode per quality level
  (compress_with_ac path).
- default: ONE progressive bitstream (encode once), then incremental
  decodes per requested level reusing cached hyperprior/entropy state;
  reports per-level bpp / PSNR / decode time.

Runs from a saved checkpoint (--checkpoint dir) or, with --tiny, from a
small randomly-initialized model (pipeline demonstration without trained
weights).
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    import os as _os

    import jax

    try:  # persistent XLA compile cache (first-run compiles are minutes)
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.jax_compile_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ..codec import (PICCodec, dump_bitstreams, progressive_decode,
                         progressive_encode)
    from ..data.datasets import _load_image
    from ..models import get_model
    from ..training import compress_with_ac, load_checkpoint
    from ..utils.metrics import compute_psnr
    from ..utils.padding import pad_image, unpad_image
    from ..utils.parser import parse_demo_args

    args = parse_demo_args(argv)
    if not os.path.isfile(args.path_image):
        raise SystemExit(f"image not found: {args.path_image}")

    if args.checkpoint != "none":
        model, params, cfg, _ = load_checkpoint(args.checkpoint)
    elif args.tiny:
        cfg = dict(n=16, m=32, division=(16, 32), dim_chunk=8,
                   param_net_widths=(24, 16))
        if args.model == "rem":
            cfg.update(check_levels=(0.5, 2.0), rem_dimension="middle")
        model = get_model(args.model, **cfg)
        x0 = jnp.zeros((1, 64, 64, 3))
        params = model.init({"params": jax.random.key(0),
                             "noise": jax.random.key(1)},
                            x0, method="init_all")["params"]
    else:
        raise SystemExit("need --checkpoint or --tiny")

    codec = PICCodec(model, {"params": params})
    img = _load_image(args.path_image)
    x = jnp.asarray(img)[None]
    xp, unpad = pad_image(x)
    npix = x.shape[1] * x.shape[2]

    check_levels = (list(model.check_levels)
                    if args.rems and hasattr(model, "check_levels") else None)

    if model.ns1 == model.ns0:
        # WACNN: no progressive stage — single-quality buffered coding
        # (reference cnn.py:244-345), one y-stream + one z-stream
        t0 = time.time()
        out = codec.compress(xp, quality=0, buffered=True)
        enc_s = time.time() - t0
        t0 = time.time()
        dec = codec.decompress(out)
        dec_s = time.time() - t0
        x_hat = unpad_image(dec["x_hat"], unpad)
        y_strings, z_strings = out["strings"]
        bits = (sum(len(s) for sl in y_strings for s in sl)
                + sum(len(s) for s in z_strings)) * 8.0
        psnr = compute_psnr(x, x_hat)
        print(f"wacnn: bpp={bits/npix:.4f} psnr={psnr:.2f} "
              f"enc={enc_s*1000:.0f}ms dec={dec_s*1000:.0f}ms")
        return [{"q_ind": 0, "bpp": bits / npix, "psnr": psnr,
                 "time": dec_s}]

    if args.fast_encdec:
        res = compress_with_ac(codec, [np.asarray(img)],
                               pr_list=args.q_levs,
                               check_levels=check_levels)
        for q, b, p, t in zip(res["pr_list"], res["bpp"], res["psnr"],
                              res["decode_time"]):
            print(f"q={q:<6} bpp={b:.4f} psnr={p:.2f} dec={t*1000:.0f}ms")
        return res

    # --- single progressive bitstream ---
    y_checkpoints = None
    if check_levels:
        # chained checkpoint-latent extraction (reference demo.py:86-93)
        y_checkpoints, prev = [], None
        for cl in check_levels:
            prev = codec.extract_checkpoint(xp, cl, checkpoint_rep=prev)
            y_checkpoints.append(prev)
    t0 = time.time()
    bs, bits = progressive_encode(codec, xp, args.q_levs,
                                  rems=bool(y_checkpoints),
                                  y_checkpoints=y_checkpoints)
    print(f"encoded in {time.time()-t0:.2f}s | z {bits[0]/npix:.4f} bpp, "
          f"base {bits[1]/npix:.4f} bpp, shells "
          f"{[round(b/npix, 4) for b in bits[2]]}")
    os.makedirs(args.save_path, exist_ok=True)
    blob = dump_bitstreams(bs)
    with open(os.path.join(args.save_path, "bits.epic"), "wb") as f:
        f.write(blob)
    print(f"container: {len(blob)} bytes -> "
          f"{os.path.join(args.save_path, 'bits.epic')}")

    levels = args.requested_levels or list(range(len(args.q_levs) + 1))
    cache = {}
    results = []
    cum_bits = bits[0] + bits[1]
    for q_ind in levels:
        out = progressive_decode(codec, bs, q_ind, cache,
                                 rems=bool(y_checkpoints),
                                 y_checkpoints=y_checkpoints)
        x_hat = unpad_image(out["x_hat"], unpad)
        psnr = compute_psnr(x, x_hat)
        if args.save_recon:
            from PIL import Image

            arr = (np.clip(np.asarray(x_hat[0]), 0, 1) * 255).astype(
                np.uint8)
            Image.fromarray(arr).save(
                os.path.join(args.save_path, f"recon_level{q_ind:02d}.png"))
        if q_ind > 0:
            cum_bits = bits[0] + bits[1] + sum(bits[2][:q_ind])
        label = "base" if q_ind == 0 else f"q={args.q_levs[q_ind-1]}"
        print(f"level {q_ind:>2} ({label:<8}) bpp={cum_bits/npix:.4f} "
              f"psnr={psnr:.2f} dec={out['decode_time']*1000:.0f}ms")
        results.append({"q_ind": q_ind, "bpp": cum_bits / npix,
                        "psnr": psnr, "time": out["decode_time"]})
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
