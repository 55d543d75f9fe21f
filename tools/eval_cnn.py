"""Evaluate a trained WACNN checkpoint through the REAL buffered codec.

The reference's cnn.py is the single-quality baseline its README trains
first (step 1) — one RD point, one buffered rANS stream per image
(cnn.py:244-345). This reports that point on held-out content: real
(string-length) bpp through PICCodec's buffered single-stream path,
PSNR/MS-SSIM of the decoded reconstruction, and the estimated-vs-real
bpp gap.

Usage: python tools/eval_cnn.py CKPT_DIR [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--which", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--regions", nargs="+", default=["val", "d0"])
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from epic_tpu.codec import PICCodec
    from epic_tpu.models.pic import VarianceMaskingPIC
    from epic_tpu.training import load_checkpoint
    from epic_tpu.utils.metrics import _ms_ssim_jit
    from eval_checkpoint import heldout_crops, region_crops

    which = args.which or ("best" if os.path.exists(
        os.path.join(args.ckpt, "best")) else "last")
    model, params, cfg, step = load_checkpoint(
        args.ckpt, which, config_overrides={"compute_dtype": "bfloat16"})
    assert cfg.get("model") == "cnn", f"not a WACNN checkpoint: {cfg}"
    params = jax.device_put(params, jax.devices()[0])
    codec = PICCodec(model, {"params": params})

    @jax.jit
    def est_bits(params, x):
        o = model.apply({"params": params}, x, 0.0, False,
                        method=VarianceMaskingPIC.forward_single_quality)
        return sum(-jnp.log2(l).sum()
                   for l in jax.tree.leaves(o["likelihoods"]))

    groups = {}
    for name in args.regions:
        crops = heldout_crops() if name == "val" else region_crops(name)
        x = jnp.asarray(np.stack(crops))
        npix = x.shape[0] * x.shape[1] * x.shape[2]
        out = codec.compress(x, quality=0, buffered=True)
        y_strings, z_strings = out["strings"]
        bits = (sum(len(s) for sl in y_strings for s in sl)
                + sum(len(s) for s in z_strings)) * 8.0
        dec = codec.decompress(out)
        x_hat = jnp.asarray(dec["x_hat"], jnp.float32)
        mse = float(jnp.mean((x_hat - x) ** 2))
        msssim = float(_ms_ssim_jit(x_hat, x))
        est = float(est_bits(params, x))
        real_bpp = bits / npix
        groups[name] = {
            "n_crops": len(crops),
            "bpp": round(real_bpp, 4),
            "est_bpp": round(est / npix, 4),
            "gap_pct": round(abs(bits - est) / max(est, 1e-9) * 100, 2),
            "psnr": round(-10 * np.log10(max(mse, 1e-12)), 2),
            "msssim_db": round(-10 * np.log10(max(1 - msssim, 1e-12)), 2),
            "streams_per_image": len(y_strings[0]) // x.shape[0]
            if y_strings and y_strings[0] else None,
        }
        print(f"# {name}: {groups[name]}", flush=True)

    res = {"checkpoint": f"{args.ckpt}/{which}@{step}",
           "model": {k: cfg.get(k) for k in ("model", "n", "m")},
           "buffered_single_stream": True,
           "groups": groups}
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
