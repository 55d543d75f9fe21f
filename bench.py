"""Benchmark: Kodak-shaped encode+decode throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship VarianceMaskingPIC (N=192, M=640, 20 slices, dual
encoder/decoder/hyperprior) on 768x512 images (Kodak geometry, synthetic
content — no datasets ship in this environment), full real-codec
round-trip (device transforms + host rANS) across a multi-level quality
sweep, matching the reference's compress_with_ac measurement loop
(reference: src/training/step.py:259-358).

Baseline: the reference publishes no throughput numbers
(BASELINE.md/BASELINE.json: "published": {}); its target line is ">=10x
CPU-reference encode+decode throughput on a full Kodak RD sweep". We use
1.0 img/s-per-chip on the sweep as the nominal baseline value (i.e. 10x an
assumed ~0.1 img/s CPU-reference sweep), so vs_baseline >= 1.0 means the
10x target is met. Refine when a measured CPU-reference number exists.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_S = 1.0
QUALITY_SWEEP = [0, 0.5, 1, 2, 5, 10]
N_IMAGES = 4
WARMUP_IMAGES = 1


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from epic_tpu.models import get_model
    from epic_tpu.codec import PICCodec

    model = get_model("pic")
    rng = np.random.default_rng(0)

    x0 = jnp.zeros((1, 512, 768, 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.key(0)}, x0, method="init_all"))()
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr)

    codec = PICCodec(model, {"params": variables["params"]})

    def synth_image():
        yy, xx = np.mgrid[0:512, 0:768].astype(np.float32)
        base = np.stack([
            0.5 + 0.5 * np.sin(xx / 41) * np.cos(yy / 29),
            0.5 + 0.4 * np.cos(xx / 23 + yy / 37),
            (xx + yy) / 1280.0,
        ], -1)
        return np.clip(
            base + rng.normal(0, 0.05, base.shape), 0, 1
        ).astype(np.float32)

    images = [synth_image() for _ in range(N_IMAGES + WARMUP_IMAGES)]

    # warmup: compile every program in the sweep
    t0 = time.time()
    for q in QUALITY_SWEEP:
        out = codec.compress(jnp.asarray(images[0])[None], quality=q)
        codec.decompress(out)
    print(f"# warmup/compile {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    total_bits = 0
    for img in images[WARMUP_IMAGES:]:
        x = jnp.asarray(img)[None]
        for q in QUALITY_SWEEP:
            out = codec.compress(x, quality=q)
            dec = codec.decompress(out)
            np.asarray(dec["x_hat"])
            total_bits += sum(len(s) for sl in out["strings"][0]
                              for s in sl) * 8
    elapsed = time.time() - t0
    img_per_s = N_IMAGES / elapsed
    print(f"# {N_IMAGES} images x {len(QUALITY_SWEEP)} levels in "
          f"{elapsed:.1f}s; mean bpp "
          f"{total_bits/(N_IMAGES*len(QUALITY_SWEEP)*512*768):.3f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "kodak_sweep_encdec_img_per_s_per_chip",
        "value": round(img_per_s, 4),
        "unit": "img/s (full 6-level enc+dec RD sweep per image)",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
