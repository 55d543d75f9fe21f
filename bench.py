"""Benchmark: full progressive RD sweep (encode once + decode all 16
levels) on photographic Kodak-geometry images, one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload = the reference's headline use case (demo.py default path):
progressive-encode a 768x512 photograph into a base stream + 15 delta
shells, then decode every level (reconstruction at each), device
transforms on TPU + batched host rANS. Content is real photographic crops
out of the reference's teaser figure (the only photographs in this
environment) — NOT synthetic noise. When a trained checkpoint is present
(BENCH_CKPT env or artifacts/ckpt_r2, committed by the round-2 training
run) the sweep runs on trained weights, so bpp/PSNR are a real RD curve;
otherwise it falls back to the flagship architecture at init.

Extras in the JSON line: per-level decode seconds (incremental path — the
paper's headline claim, reference step.py:304-313 / demo.py:121,153),
per-level bpp + PSNR, and an encode/decode/host-rANS wall split.

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
N_IMAGES = int(os.environ.get("BENCH_IMAGES", "24"))  # >= 2x WORKERS
# sweeps so the concurrent pipeline measures steady-state overlap, not
# the fill/drain edges (1 sweep = no overlap at all)
# sweep batch: amortizes per-program dispatch/tunnel latency across images
# (B=4 measured ~1.3x over B=1; B=8 exceeds v5e HBM). Falls back to 1 on
# any failure.
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
# concurrent sweeps (codec.pipeline.SweepPipeline): the full-ladder decode
# is LATENCY-bound (ns0 interleaved host<->device round trips at ~30 ms
# each; device programs are only ~0.35 s/sweep — profile_r5), so
# overlapping independent sweeps' host phases on worker threads converts
# idle round-trip waits into throughput. Results are bitwise identical to
# serial (tests/test_pipeline.py). 2 workers: the tunnel-exposed HBM fits
# ~2 concurrent full-ladder decodes at B=4 (3 OOMs); max_in_flight
# (workers+1) still prefetches the next sweep's encode.
WORKERS = int(os.environ.get("BENCH_WORKERS", "2"))
TEASER = "/root/reference/imgs/teaser.png"
_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
# prefer the paper-config (N=192/M=640) checkpoint when committed — that
# is the workload BASELINE.md's 10x-CPU target was defined on
_CANDIDATES = [os.path.join(_ART, "ckpt_r5_flagship"),
               os.path.join(_ART, "ckpt_r4_flagship"),
               os.path.join(_ART, "ckpt_r3_flagship"),
               os.path.join(_ART, "ckpt_r2_flagship"),
               os.path.join(_ART, "ckpt_r2")]
DEFAULT_CKPT = next((c for c in _CANDIDATES
                     if os.path.exists(os.path.join(c, "config.json"))),
                    _CANDIDATES[-1])


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def photo_images(n):
    """768x512 photographic crops from the reference teaser figure
    (kodim21 lighthouse photo + sea-rock detail panels)."""
    import numpy as np
    from epic_tpu.data.device_bank import TEASER_REGIONS
    from PIL import Image

    im = np.asarray(Image.open(TEASER).convert("RGB"))
    y0, y1, x0, x1 = TEASER_REGIONS["main"]
    main = im[y0:y1, x0:x1]  # 984 x 1464
    h, w = main.shape[:2]
    crops = []
    for oy in (0, h - 512):
        for ox in (0, (w - 768) // 2, w - 768):
            crops.append(main[oy:oy + 512, ox:ox + 768])
    dy0, dy1, dx0, dx1 = TEASER_REGIONS["d0"]
    d0 = im[dy0:dy1, dx0:dx1]
    crops.append(np.asarray(
        Image.fromarray(d0).resize((768, 512), Image.LANCZOS)))
    # uint8 — uploaded as 1 byte/px and normalized ON DEVICE (the axon
    # tunnel moves ~MB/s; a float32 768x512 batch-4 upload alone is 19MB)
    out = [np.ascontiguousarray(c, np.uint8) for c in crops]
    return [out[i % len(out)] for i in range(n)]


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
        f = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1)
        out.append(np.round(f * 255.0).astype(np.uint8))
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


def _load_model_and_params():
    """Trained checkpoint when available, flagship at init otherwise."""
    import jax
    import jax.numpy as jnp
    from epic_tpu.models import get_model

    ckpt_dir = os.environ.get("BENCH_CKPT", DEFAULT_CKPT)
    if os.path.exists(os.path.join(ckpt_dir, "config.json")):
        from epic_tpu.training import load_checkpoint

        which = "best" if os.path.exists(
            os.path.join(ckpt_dir, "best")) else "last"
        model, params, config, step = load_checkpoint(
            ckpt_dir, which, config_overrides={"compute_dtype": "bfloat16"})
        params = jax.device_put(params, jax.devices()[0])
        jax.block_until_ready(params)
        log(f"loaded trained checkpoint {ckpt_dir}/{which} (step {step}, "
            f"{config.get('model')}, N={config.get('n')} M={config.get('m')})")
        return model, params, f"{os.path.basename(ckpt_dir)}/{which}@{step}"

    # bfloat16 transforms (entropy math stays f32) — measured 1.4x over
    # f32 on v5e; round-trips remain bit-exact
    try:  # rbg PRNG: init is RNG-compile-bound (see __graft_entry__)
        jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass
    model = get_model("pic", compute_dtype="bfloat16")
    # init params on the host CPU backend (cheap, avoids a giant device
    # compile), then transfer once
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 64, 64, 3), jnp.float32), method="init_all"))()
    params = jax.device_put(variables["params"], jax.devices()[0])
    jax.block_until_ready(params)
    log("no trained checkpoint found; flagship (N=192, M=640) at init")
    return model, params, None


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from epic_tpu.codec import (PICCodec, SweepPipeline, progressive_decode,
                                progressive_decode_all,
                                progressive_encode_finish,
                                progressive_encode_start)
    from epic_tpu.utils.metrics import _ms_ssim_jit

    t_all = time.time()
    t0 = time.time()
    model, params, ckpt_name = _load_model_and_params()
    log(f"init {time.time()-t0:.1f}s on {jax.devices()[0].platform}")

    codec = PICCodec(model, {"params": params})
    # REM path: when the checkpoint has trained Rate Enhancement Modules
    # (the paper's flagship), the sweep refines the per-slice coding
    # params from checkpoint latents — the r3 rems training stage must
    # show up in the benched RD curve. Checkpoint latents are extracted
    # device-only via the same forward program the rems stage trained on
    # (training/step.py:make_ckpt_extractor) and shared encoder/decoder,
    # the reference demo's convention (demo.py:86-93: side-info not
    # transmitted; cli/codec.py is the transmit-it variant).
    check_levels = list(getattr(model, "check_levels", ()) or ())
    use_rems = bool(check_levels) and model.ns1 > model.ns0
    rem_chain_noop = use_rems and len(check_levels) == 1
    # The chained single-bitstream ladder is a STRUCTURAL NO-OP for one
    # check level: the reference skips the j=0 refinement
    # (rem_pic.py:196-198), so _p_prog_params_rem_chain(1) delegates to
    # the plain chain BITWISE (tests/test_scan_chains.py) and extraction
    # would burn device time on latents the coding path ignores. With >= 2
    # levels the chain is ACTIVE: progressive_encode_start auto-extracts
    # the chained check-level latents FUSED into the encode (reusing its
    # front/hyper/base work — the same shared programs as
    # extract_checkpoint_device, bitwise equal to what eval_checkpoint.py
    # / cli/codec.py transmit).
    rems_arg = use_rems and not rem_chain_noop
    _ckpt_equality_checked = []

    def check_ckpt_equality(st):
        if not rems_arg or _ckpt_equality_checked:
            return
        import numpy as np
        prev = None
        for j, cl in enumerate(check_levels):
            auto = np.asarray(st["auto_ckpts"][j], np.float32)
            prev = codec.extract_checkpoint(st["x"], float(cl),
                                            checkpoint_rep=prev)
            np.testing.assert_array_equal(auto,
                                          np.asarray(prev, np.float32))
        _ckpt_equality_checked.append(True)
        log(f"ckpt-extract equality: fused auto path == codec path OK "
            f"({len(check_levels)} chained levels)")
    rng = np.random.default_rng(0)
    try:
        make_images = lambda n: photo_images(n)  # noqa: E731
        content = "photo"
        make_images(1)
    except Exception as e:
        log(f"teaser unavailable ({e}); synthetic fallback")
        make_images = lambda n: synth_images(n, rng)  # noqa: E731
        content = "synthetic"

    @jax.jit
    def to_f32(u8):
        # device-side normalization: identical IEEE f32 result to the
        # host's c.astype(np.float32)/255.0, at 1/4 the tunnel bytes
        return u8.astype(jnp.float32) / 255.0

    @jax.jit
    def per_level_psnr(x_hat, x):
        mse = jnp.mean((x_hat - x[None]) ** 2, axis=(2, 3, 4)).mean(axis=1)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    @jax.jit
    def per_level_msssim(x_hat, x):
        return jax.vmap(lambda xh: _ms_ssim_jit(xh, x))(x_hat)

    def encode_start(x):
        return progressive_encode_start(codec, x, Q_LIST, rems=rems_arg)

    def run(batch: int):
        n_sweeps = max(N_IMAGES // batch, 1)
        pool = make_images(batch * (n_sweeps + 1))
        images = [np.stack(pool[k * batch:(k + 1) * batch])
                  for k in range(n_sweeps + 1)]
        t0 = time.time()
        x = to_f32(jnp.asarray(images[0]))
        st = encode_start(x)
        bs, _ = progressive_encode_finish(codec, st)
        out = progressive_decode_all(codec, bs, rems=rems_arg,
                                     y_checkpoints=st["auto_ckpts"])
        np.asarray(per_level_psnr(out["x_hat"], x))
        np.asarray(per_level_msssim(out["x_hat"], x))
        check_ckpt_equality(st)
        if codec.chain_mode == "scan":
            # scan-mode guard: the fused scan encoder and the per-slice
            # interleaved decoder are different executables; assert they
            # agree bitwise on real content at the benched shape
            codec.verify_base_chain(x)
            log("scan-encoder == interleaved-decoder bitwise on real "
                "content OK")
        log(f"warmup/compile (batch={batch}, rems={use_rems}, "
            f"rem_chain={rems_arg}, chain={codec.chain_mode}) "
            f"{time.time()-t0:.1f}s")

        # pre-compile the tiny barrier program (used to close the timed
        # region) so its first compile doesn't land inside the timing
        jax.block_until_ready(to_f32(jnp.zeros((1, 1, 1, 3), np.uint8)))

        for c in (codec.y_coder, codec.z_coder):
            c.stats.update(encode_s=0.0, decode_s=0.0, encode_calls=0,
                           decode_calls=0, encode_syms=0, decode_syms=0)
        # Concurrent sweep pipeline (codec.pipeline.SweepPipeline): the
        # main thread dispatches every sweep's DEVICE programs in
        # submission order (encode_start is pure async dispatch); worker
        # threads run each sweep's host phases — rANS encode + the
        # interleaved full-ladder decode — concurrently, so the ~30 ms
        # host<->device round trips of independent sweeps overlap. The
        # timed region contains ONLY codec work: x_hat handles are
        # DROPPED as results yield (retaining 6 sweeps x 320 MB OOMs the
        # tunnel-exposed HBM; dispatching MS-SSIM inline queues ~1 s of
        # HIGHEST-precision conv work per sweep in front of the codec
        # programs — measured 2.1 img/s vs dropping). Quality metrics are
        # computed AFTER the timed region by re-decoding the first two
        # sweeps from their stored bitstreams (8 images = every unique
        # crop, see photo_images) — the decode is deterministic, so this
        # is the same x_hat the timed region produced.
        t0 = time.time()
        total_bits = 0.0
        bpp_sweeps, metric_src = [], []
        px = batch * 512 * 768
        bs = last_cks = None
        # max_in_flight=workers: the +1 encode-state prefetch OOMs the
        # tunnel-exposed HBM at B=4 (each in-flight sweep pins its encode
        # state + decode buffers)
        pipe = SweepPipeline(codec, Q_LIST, rems=rems_arg, workers=WORKERS,
                             max_in_flight=WORKERS)
        batches = (to_f32(jnp.asarray(images[1 + k]))
                   for k in range(n_sweeps))
        for k, res in enumerate(pipe.run(batches)):
            bits = res["bits"]
            bpp_sweeps.append(np.cumsum(
                [bits[0] + bits[1]] + list(bits[2])) / px)
            total_bits += bits[0] + bits[1] + sum(bits[2])
            bs, last_cks = res["bitstreams"], res["ckpts"]
            if k < 2:
                metric_src.append((res["bitstreams"], res["x"],
                                   res["ckpts"]))
            # x_hat handle dropped here: its buffer frees once the device
            # reaches it; retaining every sweep's 320 MB x_hat OOMs the
            # tunnel-exposed HBM at 6 sweeps
        # device barrier: a fresh no-op program dispatched after all
        # workers joined completes last (in-order execution), so every
        # dropped sweep's device work is covered by this sync
        jax.block_until_ready(to_f32(jnp.zeros((1, 1, 1, 3), np.uint8)))
        elapsed = time.time() - t0
        t_start = pipe.timing["encode_start_s"]
        t_finish = pipe.timing["encode_finish_s"]
        t_dec = pipe.timing["decode_s"]
        finish_phases = pipe.finish_phases
        # rANS stats captured NOW — the metric re-decode below would
        # otherwise inflate them
        rans_s = (codec.y_coder.stats["encode_s"]
                  + codec.y_coder.stats["decode_s"]
                  + codec.z_coder.stats["encode_s"]
                  + codec.z_coder.stats["decode_s"])
        rans_syms = (codec.y_coder.stats["encode_syms"]
                     + codec.y_coder.stats["decode_syms"]
                     + codec.z_coder.stats["encode_syms"]
                     + codec.z_coder.stats["decode_syms"])
        # quality metrics OUTSIDE the timed region: re-decode the first
        # two sweeps (8 images = all unique crops; decode is
        # deterministic, so this x_hat is bitwise what the timed region
        # produced and dropped)
        pend_metrics = []
        for m_bs, m_x, m_cks in metric_src:
            m_out = progressive_decode_all(codec, m_bs, rems=rems_arg,
                                           y_checkpoints=m_cks)
            pend_metrics.append((per_level_psnr(m_out["x_hat"], m_x),
                                 per_level_msssim(m_out["x_hat"], m_x)))
        psnrs = np.mean([np.asarray(p) for p, _ in pend_metrics], axis=0)
        msssim = np.mean([np.asarray(m) for _, m in pend_metrics], axis=0)
        bpp_levels = np.mean(bpp_sweeps, axis=0)
        split = {"encode_start_s": round(t_start, 3),
                 # host-phase walls SUMMED across concurrent workers —
                 # they overlap, so their sum exceeds `elapsed` by design
                 "encode_finish_s": round(t_finish, 3),
                 "decode_host_s": round(t_dec, 3),
                 "host_rans_s": round(rans_s, 3),
                 "host_rans_msyms": round(rans_syms / 1e6, 2),
                 "finish_phases": {k: round(v_, 3)
                                   for k, v_ in finish_phases.items()},
                 "pipelined": True,
                 "workers": pipe.workers}
        # Sequential (unpipelined) sweeps on the same content: their wall
        # vs the pipelined per-sweep wall is the direct evidence that the
        # host rANS/D2H phase is hidden behind device compute. Averaged
        # over 2 sweeps — a single measurement moved +-25% with tunnel
        # weather (VERDICT r4 weak #5).
        seq_times = []
        for _ in range(2):
            t1 = time.time()
            x0 = to_f32(jnp.asarray(images[0]))
            st_seq = encode_start(x0)
            bs_seq, _ = progressive_encode_finish(codec, st_seq)
            out = progressive_decode_all(codec, bs_seq, rems=rems_arg,
                                         y_checkpoints=st_seq["auto_ckpts"])
            jax.block_until_ready(out["x_hat"])
            seq_times.append(time.time() - t1)
        seq_sweep_s = sum(seq_times) / len(seq_times)
        split["sequential_img_per_s"] = round(batch / seq_sweep_s, 4)
        split["sequential_sweeps_s"] = [round(t, 3) for t in seq_times]
        split["overlap_speedup"] = round(
            (n_sweeps * batch / elapsed) / (batch / seq_sweep_s), 3)
        return (n_sweeps * batch / elapsed, total_bits, psnrs, msssim,
                bpp_levels, split, n_sweeps * batch, elapsed, bs, last_cks)

    try:
        (img_per_s, total_bits, psnrs, msssim, bpp_levels, split, n_done,
         elapsed, last_bs, last_cks) = run(BATCH)
    except Exception as e:  # OOM or tunnel failure -> single-image path
        log(f"batch={BATCH} failed ({type(e).__name__}); retrying batch=1")
        import gc

        gc.collect()  # drop the failed run's device buffers before retry
        (img_per_s, total_bits, psnrs, msssim, bpp_levels, split, n_done,
         elapsed, last_bs, last_cks) = run(1)

    # per-level decode time: the incremental/streaming path (what a client
    # actually experiences per refinement; reference demo.py:121,153).
    # Two passes over fresh caches: the first carries any residual
    # first-dispatch cost, the second is the steady-state number reported
    # as per_level_decode_s (VERDICT r3 weak #4 diagnosis).
    per_level_cold, per_level_s = [], []
    for out_list in (per_level_cold, per_level_s):
        cache = {}
        for lvl in range(len(Q_LIST) + 1):
            t1 = time.time()
            out = progressive_decode(codec, last_bs, lvl, cache,
                                     rems=use_rems, y_checkpoints=last_cks)
            jax.block_until_ready(out["x_hat"])
            out_list.append(round(time.time() - t1, 4))

    log(f"{n_done} images x {len(Q_LIST)+1} levels in {elapsed:.1f}s; "
        f"top-quality bpp {total_bits/(n_done*512*768):.3f}; "
        f"psnr[0/8/16]={psnrs[0]:.2f}/{psnrs[8]:.2f}/"
        f"{psnrs[-1]:.2f}; split {split}; total wall {time.time()-t_all:.0f}s")

    # Second content row (VERDICT r4 weak #4: all RD evidence from crops
    # of one figure): one synthetic-content sweep through the identical
    # compiled programs, so throughput/RD claims aren't single-sourced.
    content_rows = {}
    if content == "photo":
        try:
            xs = to_f32(jnp.asarray(np.stack(synth_images(BATCH, rng))))
            t1 = time.time()
            st_s = encode_start(xs)
            bs_s, bits_s = progressive_encode_finish(codec, st_s)
            out_s = progressive_decode_all(
                codec, bs_s, rems=rems_arg,
                y_checkpoints=st_s["auto_ckpts"])
            jax.block_until_ready(out_s["x_hat"])
            dt = time.time() - t1
            psnr_s = np.asarray(per_level_psnr(out_s["x_hat"], xs))
            px_s = xs.shape[0] * 512 * 768
            bpp_s = np.cumsum([bits_s[0] + bits_s[1]]
                              + list(bits_s[2])) / px_s
            content_rows["synthetic"] = {
                "img_per_s_unpipelined": round(xs.shape[0] / dt, 3),
                "bpp_top": round(float(bpp_s[-1]), 4),
                "bpp_base": round(float(bpp_s[0]), 4),
                "psnr_top": round(float(psnr_s[-1]), 2),
                "psnr_base": round(float(psnr_s[0]), 2),
            }
        except Exception as e:
            log(f"synthetic content row failed: {type(e).__name__}: {e}")

    # Device-occupancy evidence (VERDICT r2 item 2): the committed
    # per-program profile (tools/profile_sweep.py) measures device-program
    # seconds and achieved TFLOP/s for this workload; relate it to the
    # pipelined wall when it was taken at the same sweep batch.
    profile = {}
    for name in ("profile_r5.json", "profile_r4.json", "profile_r3.json",
                 "profile_r2.json"):
        path = os.path.join(_ART, name)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prof = json.load(f)
                prof_ckpt = prof.get("checkpoint")
                # profile cites "artifacts/<dir>@<step>", bench "<dir>/..."
                prof_dir = os.path.basename(
                    str(prof_ckpt).split("@")[0]) if prof_ckpt else None
                bench_dir = str(ckpt_name).split("/")[0] if ckpt_name \
                    else None
                if prof_dir and bench_dir and prof_dir != bench_dir:
                    # stale profile from a different checkpoint: do not
                    # cite it as occupancy evidence (VERDICT r3 weak #6)
                    continue
                profile = {"source": f"artifacts/{name}",
                           **({"checkpoint": prof_ckpt}
                              if prof_ckpt else {}),
                           "device_program_s_per_sweep":
                               prof.get("device_program_s"),
                           "achieved_tflops_max": max(
                               (v.get("achieved_tflops", 0.0)
                                for v in prof.get("flops", {}).values()),
                               default=None)}
                if (prof.get("batch") == BATCH and n_done >= BATCH
                        and prof.get("device_program_s")):
                    per_sweep_wall = elapsed / max(n_done // BATCH, 1)
                    profile["device_busy_frac_est"] = round(
                        min(prof["device_program_s"] / per_sweep_wall, 1.0),
                        3)
                break
            except Exception:
                pass

    print(json.dumps({
        "metric": "kodak_progressive_rd_sweep_img_per_s_per_chip",
        "value": round(img_per_s, 4),
        "unit": "img/s (encode once + decode all 16 levels, 768x512)",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
        "content": content,
        "checkpoint": ckpt_name,
        "rems": use_rems,
        **({"rem_chain": f"ACTIVE: {len(check_levels)} chained check "
                         f"levels {check_levels} (auto-extracted fused "
                         "into encode; equality-asserted vs codec "
                         "extract at warmup)"}
           if rems_arg else
           {"rem_chain": "noop-by-reference-semantics (single check "
                         "level; REM gains are per-quality — see "
                         "eval_heldout.json rem_per_quality)"}
           if rem_chain_noop else {}),
        **({"content_rows": content_rows} if content_rows else {}),
        "bpp_per_level": [round(float(b), 4) for b in bpp_levels],
        "psnr_per_level": [round(float(p), 2) for p in psnrs],
        "msssim_db_per_level": [
            round(-10.0 * float(np.log10(max(1.0 - float(m), 1e-12))), 2)
            for m in msssim],
        "per_level_decode_s": per_level_s,
        "per_level_decode_s_cold": per_level_cold,
        "split": split,
        **({"profile": profile} if profile else {}),
    }))


if __name__ == "__main__":
    main()
