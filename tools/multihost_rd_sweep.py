"""Multi-host progressive RD sweep over a sharded image list.

SURVEY §2.8's TPU-native consequence: RD evaluation over an image corpus
scales across HOSTS — jax.distributed over DCN, each process coding its
`local_shard` of the global image list with its OWN host rANS coder, the
per-image RD rows allgathered at the end. No reference counterpart (the
reference is single-process); this is the pod-scale evaluation path.

Run standalone (single process) or as one worker of an N-process cluster:

  # single process (the full list):
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/multihost_rd_sweep.py

  # 2-process cluster over localhost (each shards the same global list):
  ... --num_processes 2 --process_id {0,1} --coordinator localhost:PORT

Process 0 prints ONE JSON line with the merged per-image RD rows (global
image order, identical arithmetic regardless of process count — asserted
equal to the single-process run in tests/test_parallel.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q_LIST = [0.5, 2.0, 10.0]


def synth_image(i: int, size: int = 64):
    import numpy as np

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.stack([
        0.5 + 0.5 * np.sin(xx / (5 + 2 * i)) * np.cos(yy / 7),
        0.5 + 0.4 * np.cos(xx / 9 + yy / (11 + i)),
        (xx + yy) / (2 * size),
    ], -1)
    rng = np.random.default_rng(100 + i)
    return np.clip(img + rng.normal(0, 0.03, img.shape), 0, 1) \
        .astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--n_images", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jax_compile_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from epic_tpu.parallel import init_multihost, local_shard

    distributed = init_multihost(coordinator_address=args.coordinator,
                                 num_processes=args.num_processes
                                 if args.num_processes > 1 else None,
                                 process_id=args.process_id)
    if distributed:
        # establish the cross-process collective context NOW, while the
        # processes are still in lockstep: the first collective pays the
        # Gloo/ICI context init with a short key-exchange deadline, and
        # on a 1-core box the per-process codec compiles skew arrival at
        # a later first collective past it (observed DEADLINE_EXCEEDED)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("epic_rd_sweep_start")

    import numpy as np
    import jax.numpy as jnp

    from epic_tpu.codec import (PICCodec, progressive_decode_all,
                                progressive_encode)
    from epic_tpu.models import get_model

    # identical tiny model on every process (same seed -> same params)
    model = get_model("pic", n=16, m=32, division=(16, 32), dim_chunk=8,
                      param_net_widths=(24, 16))
    v = model.init({"params": jax.random.key(1),
                    "noise": jax.random.key(2)},
                   jnp.zeros((1, 64, 64, 3)), method="init_all")
    # per-process host rANS coder over the process's own image shard
    codec = PICCodec(model, v)

    ids = list(range(args.n_images))
    mine = local_shard(ids)
    rows = []
    for i in mine:
        x = jnp.asarray(synth_image(i))[None]
        bs, bits = progressive_encode(codec, x, Q_LIST)
        out = progressive_decode_all(codec, bs)
        x_hat = np.asarray(out["x_hat"])  # [1+Q, 1, H, W, 3]
        npix = x.shape[1] * x.shape[2]
        bpp = np.cumsum([bits[0] + bits[1]] + list(bits[2])) / npix
        mse = ((x_hat[:, 0] - np.asarray(x[0])) ** 2).mean(axis=(1, 2, 3))
        psnr = -10 * np.log10(np.maximum(mse, 1e-12))
        rows.append([float(i)] + [round(float(b), 6) for b in bpp]
                    + [round(float(p_), 4) for p_ in psnr])

    # fixed row width: [image_id, bpp x (1+Q), psnr x (1+Q)].
    # float32 on BOTH paths: process_allgather ships f32 (x64 disabled),
    # so the single-process path must quantize identically for the
    # equality assertion in tests/test_parallel.py to be exact.
    width = 1 + 2 * (len(Q_LIST) + 1)
    local_rows = np.asarray(rows, np.float32).reshape(-1, width)
    if distributed:
        from jax.experimental import multihost_utils

        merged = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(local_rows))).reshape(-1, width)
    else:
        merged = local_rows
    merged = merged[np.argsort(merged[:, 0])]  # global image order

    if jax.process_index() == 0:
        res = {
            "processes": jax.process_count(),
            "n_images": int(merged.shape[0]),
            "q_list": Q_LIST,
            "rows": [[round(float(x_), 6) for x_ in r] for r in merged],
            "mean_bpp_top": round(float(merged[:, len(Q_LIST) + 1].mean()),
                                  6),
            "mean_psnr_top": round(float(merged[:, -1].mean()), 4),
        }
        print("RDSWEEP " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
