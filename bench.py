"""Benchmark: full progressive RD sweep (encode once + decode all 16
levels) on Kodak-geometry images, one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's headline use case (demo.py default path): the
flagship VarianceMaskingPIC (N=192, M=640, 20 slices, dual
encoder/decoder/hyperprior) progressive-encodes a 768x512 image into a
base stream + 15 delta shells, then incrementally decodes every level
(reconstruction at each), device transforms on TPU + batched host rANS.

Baseline: the reference publishes no throughput numbers (BASELINE.json
"published": {}); its target line is ">=10x CPU-reference encode+decode
throughput on a full Kodak RD sweep". Measured on this box (2026-08-16,
CPU backend, same workload/code): 0.015 img/s. Using that as the
CPU-reference proxy, the 10x target is 0.15 img/s — the baseline below —
so vs_baseline >= 1.0 means the 10x target is met.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_S = 0.15  # 10x the measured CPU-backend sweep throughput
Q_LIST = [0.01, 0.05, 0.1, 0.25, 0.5, 0.6, 0.7, 0.8, 0.9, 1, 2, 3, 4,
          4.5, 10]
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "4"))
# sweep batch: amortizes per-program dispatch/tunnel latency across images
# (B=4 measured ~1.3x over B=1; B=8 exceeds v5e HBM). Falls back to 1 on
# any failure.
BATCH = int(os.environ.get("BENCH_BATCH", "4"))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def synth_images(n, rng):
    import numpy as np

    out = []
    yy, xx = np.mgrid[0:512, 0:768].astype(np.float32)
    for i in range(n):
        base = np.stack([
            0.5 + 0.5 * np.sin(xx / (31 + 7 * i)) * np.cos(yy / 29),
            0.5 + 0.4 * np.cos(xx / 23 + yy / (37 + 3 * i)),
            (xx + yy) / 1280.0,
        ], -1)
        out.append(np.clip(base + rng.normal(0, 0.05, base.shape),
                           0, 1).astype(np.float32))
    return out


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-run compiles (~5-10 min for
    the full model on TPU) are reused by every later process."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/.jax_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from epic_tpu.models import get_model
    from epic_tpu.codec import (PICCodec, progressive_decode_all,
                                progressive_encode)

    t_all = time.time()
    # bfloat16 transforms (entropy math stays f32) — measured 1.4x over
    # f32 on v5e; round-trips remain bit-exact
    model = get_model("pic", compute_dtype="bfloat16")
    t0 = time.time()
    # init params on the host CPU backend (cheap, avoids a giant device
    # compile), then transfer once
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 64, 64, 3), jnp.float32), method="init_all"))()
    variables = jax.device_put(variables, jax.devices()[0])
    jax.block_until_ready(variables)
    log(f"init {time.time()-t0:.1f}s on {jax.devices()[0].platform}")

    codec = PICCodec(model, {"params": variables["params"]})
    rng = np.random.default_rng(0)

    @jax.jit
    def per_level_psnr(x_hat, x):
        mse = jnp.mean((x_hat - x[None]) ** 2, axis=(2, 3, 4)).mean(axis=1)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    def run(batch: int):
        n_sweeps = max(N_IMAGES // batch, 1)
        images = [np.stack(synth_images(batch, rng))
                  for _ in range(n_sweeps + 1)]
        t0 = time.time()
        x = jnp.asarray(images[0])
        bs, _ = progressive_encode(codec, x, Q_LIST)
        out = progressive_decode_all(codec, bs)
        np.asarray(per_level_psnr(out["x_hat"], x))
        log(f"warmup/compile (batch={batch}) {time.time()-t0:.1f}s")

        t0 = time.time()
        total_bits, psnrs = 0.0, None
        for img in images[1:]:
            x = jnp.asarray(img)
            bs, bits = progressive_encode(codec, x, Q_LIST)
            out = progressive_decode_all(codec, bs)
            # the sweep's deliverable: per-level PSNR, computed on device
            psnrs = np.asarray(per_level_psnr(out["x_hat"], x))
            total_bits += bits[0] + bits[1] + sum(bits[2])
        elapsed = time.time() - t0
        return n_sweeps * batch / elapsed, total_bits, psnrs,             n_sweeps * batch, elapsed

    try:
        img_per_s, total_bits, psnrs, n_done, elapsed = run(BATCH)
    except Exception as e:  # OOM or tunnel failure -> single-image path
        log(f"batch={BATCH} failed ({type(e).__name__}); retrying batch=1")
        img_per_s, total_bits, psnrs, n_done, elapsed = run(1)
    log(f"{n_done} images x {len(Q_LIST)+1} levels in {elapsed:.1f}s; "
        f"top-quality bpp {total_bits/(n_done*512*768):.3f}; "
        f"psnr[0/8/16]={psnrs[0]:.2f}/{psnrs[8]:.2f}/"
        f"{psnrs[-1]:.2f}; total wall {time.time()-t_all:.0f}s")

    print(json.dumps({
        "metric": "kodak_progressive_rd_sweep_img_per_s_per_chip",
        "value": round(img_per_s, 4),
        "unit": "img/s (encode once + decode all 16 levels, 768x512)",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
