"""A/B the tunnel bit-packing (EPIC_PACK) in ONE process.

Tunnel weather moves full-bench throughput by +-25% run to run, so
packing on/off cannot be judged from separate bench runs. This tool
alternates the two variants on the same process, same checkpoint, same
content, and reports per-variant medians of the encode host phase
(finish: packed vs dense fetch + rANS) and the full-ladder decode.

Usage: timeout 900 python tools/ab_pack.py [--trials 5] [--batch 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--ckpt", default="artifacts/ckpt_r5_flagship")
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

    from bench import photo_images, Q_LIST
    from epic_tpu.codec import (PICCodec, progressive_decode_all,
                                progressive_encode_finish,
                                progressive_encode_start)
    from epic_tpu.training import load_checkpoint

    model, params, cfg, step = load_checkpoint(
        args.ckpt, "last", config_overrides={"compute_dtype": "bfloat16"})
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    codec = PICCodec(model, {"params": params})
    rems = bool(getattr(model, "check_levels", ()) or ()) and \
        len(model.check_levels) >= 2
    x = jnp.asarray(np.stack(photo_images(args.batch)),
                    jnp.float32) / 255.0
    jax.block_until_ready(x)

    def sweep(timing=None):
        st = progressive_encode_start(codec, x, Q_LIST, rems=rems)
        t0 = time.time()
        bs, _ = progressive_encode_finish(codec, st, timing=timing)
        t_finish = time.time() - t0
        t0 = time.time()
        out = progressive_decode_all(codec, bs, rems=rems,
                                     y_checkpoints=st["auto_ckpts"])
        jax.block_until_ready(out["x_hat"])
        return t_finish, time.time() - t0

    res = {}
    for packed in (True, False):
        os.environ["EPIC_PACK"] = "1" if packed else "0"
        sweep()  # warm this variant's programs
        res["packed" if packed else "dense"] = {"finish": [], "decode": [],
                                                "fetch": []}
    for t in range(args.trials):
        for packed in (True, False):  # alternate to share weather
            os.environ["EPIC_PACK"] = "1" if packed else "0"
            timing = {}
            f, d = sweep(timing)
            r = res["packed" if packed else "dense"]
            r["finish"].append(round(f, 3))
            r["decode"].append(round(d, 3))
            r["fetch"].append(round(timing.get("fetch_s", 0.0), 3))
            print(f"# trial {t} {'packed' if packed else 'dense '} "
                  f"finish {f:.3f}s decode {d:.3f}s "
                  f"fetch {timing.get('fetch_s', 0.0):.3f}s",
                  file=sys.stderr, flush=True)

    def med(v):
        s = sorted(v)
        return s[len(s) // 2]

    out = {k: {kk: {"median": med(vv), "all": vv}
               for kk, vv in v.items()} for k, v in res.items()}
    out["verdict"] = {
        "finish_packed_vs_dense":
            round(out["packed"]["finish"]["median"]
                  / max(out["dense"]["finish"]["median"], 1e-9), 3),
        "decode_packed_vs_dense":
            round(out["packed"]["decode"]["median"]
                  / max(out["dense"]["decode"]["median"], 1e-9), 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
