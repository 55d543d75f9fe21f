"""Evaluate a trained checkpoint: held-out RD curve, estimated-vs-real bpp
gap, RD monotonicity — the round-2 credibility criteria (VERDICT.md task 1:
top-quality bpp < 2 and PSNR > 28 on held-out crops, est-vs-real bpp gap
< 5% under trained statistics, monotone RD across all levels).

Held-out content = crops from the teaser photo's validation strip (the
rightmost columns excluded from training by data/device_bank.py).

Usage: python tools/eval_checkpoint.py CKPT_DIR [--out results.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q_LIST = [0.01, 0.05, 0.1, 0.25, 0.5, 0.6, 0.7, 0.8, 0.9, 1, 2, 3, 4,
          4.5, 10]


def heldout_crops(patch=256):
    """256x256 crops strictly inside the validation strip (never seen in
    training) + the full-height val strip as one 256-wide image."""
    import numpy as np

    from epic_tpu.data.device_bank import build_crop_bank, \
        load_teaser_images

    images, has_val = load_teaser_images()
    cb = build_crop_bank(images, has_val, patch=patch)
    crops = []
    for k in range(cb.num_images):
        if cb.val_x0[k] < 0:
            continue
        h, w = cb.hw[k]
        x0 = int(cb.val_x0[k])
        if w - x0 < patch:
            continue
        for oy in range(0, int(h) - patch + 1, patch):
            crops.append(cb.bank[k, oy:oy + patch, x0:x0 + patch]
                         .astype(np.float32) / 255.0)
    return crops


def region_crops(region: str, patch=256):
    """256x256 crops tiling one whole teaser region (e.g. 'd0', the panel
    the r3 flagship run holds out of training entirely — an unseen
    PHOTOGRAPH, not a strip of the training photo; VERDICT r2 item 6)."""
    import numpy as np
    from PIL import Image

    from epic_tpu.data.device_bank import TEASER_PATH, TEASER_REGIONS

    im = np.asarray(Image.open(TEASER_PATH).convert("RGB"))
    y0, y1, x0, x1 = TEASER_REGIONS[region]
    reg = im[y0:y1, x0:x1]
    h, w = reg.shape[:2]
    crops = []
    for oy in range(0, h - patch + 1, patch):
        for ox in range(0, w - patch + 1, patch):
            crops.append(reg[oy:oy + patch, ox:ox + patch]
                         .astype(np.float32) / 255.0)
    if not crops:  # region smaller than the patch: upscale once
        crops.append(np.asarray(Image.fromarray(reg).resize(
            (patch, patch), Image.LANCZOS)).astype(np.float32) / 255.0)
    return crops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--which", default=None, help="best|last (auto)")
    p.add_argument("--out", default=None)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--regions", nargs="+", default=["val"],
                   help="crop groups: 'val' (training-photo val strip) "
                        "and/or teaser region names like 'd0' (held-out "
                        "photograph)")
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

    from epic_tpu.codec import PICCodec, progressive_encode, \
        progressive_decode_all
    from epic_tpu.models.pic import VarianceMaskingPIC
    from epic_tpu.training import load_checkpoint

    which = args.which or ("best" if os.path.exists(
        os.path.join(args.ckpt, "best")) else "last")
    model, params, cfg, step = load_checkpoint(
        args.ckpt, which, config_overrides={
            "compute_dtype": args.compute_dtype})
    print(f"# ckpt {args.ckpt}/{which} step {step} model {cfg.get('model')} "
          f"N={cfg.get('n')} M={cfg.get('m')}", flush=True)
    params = jax.device_put(params, jax.devices()[0])
    v = {"params": params}
    codec = PICCodec(model, v)

    # ---- entropy estimation program (shared across groups) ----
    @jax.jit
    def est_bits(params, x, q):
        o = model.apply({"params": params}, x, q, False,
                        method=VarianceMaskingPIC.forward_single_quality)
        lik = o["likelihoods"]
        return sum(-jnp.log2(l).sum() for l in
                   jax.tree.leaves(lik))

    def eval_group(crops, rems=False):
        x = jnp.asarray(np.stack(crops))
        npix = x.shape[0] * x.shape[1] * x.shape[2]

        # real codec: one progressive encode, all levels decoded. With
        # rems=True the chained REM checkpoints refine the coding params
        # (reference functions_encode.py:127-148) — the path the rems
        # training stage actually improves.
        ckpts = None
        if rems:
            ckpts, prev = [], None
            for cl in model.check_levels:
                prev = codec.extract_checkpoint(x, cl, checkpoint_rep=prev)
                ckpts.append(prev)
        bs, bits = progressive_encode(codec, x, Q_LIST, rems=rems,
                                      y_checkpoints=ckpts)
        out = progressive_decode_all(codec, bs, rems=rems,
                                     y_checkpoints=ckpts)
        x_hat = np.asarray(out["x_hat"])  # [1+Q, B, H, W, 3]
        real_bpp = np.cumsum([bits[0] + bits[1]] + list(bits[2])) / npix

        # Stream-constant overhead: every rANS message ends with an 8-byte
        # final-state flush (native/epic_rans.cpp:64-78). The single-stream
        # layout pays exactly TWO flushes per image (z + y) at every level
        # — the per-shell flush tax of the messages layout is gone (VERDICT
        # r2 item 3) — so the raw and flush-adjusted gaps nearly coincide.
        FLUSH_BYTES = 8
        if bs.get("layout") == "stream":
            n_msgs = len(bs["z"]) + len(bs["y"])
            flush_bits = np.full(len(real_bpp),
                                 n_msgs * FLUSH_BYTES * 8.0)
        else:
            n_base_msgs = (len(bs["z"])
                           + sum(len(sl) for sl in bs["base"]))
            msgs_per_shell = [sum(1 for s in sh if s)
                              for sh in bs["progressive"]]
            flush_bits = np.cumsum(
                [n_base_msgs * FLUSH_BYTES * 8.0]
                + [m * FLUSH_BYTES * 8.0 for m in msgs_per_shell])
        adj_bpp = real_bpp - flush_bits / npix
        mse = ((x_hat - np.asarray(x)[None]) ** 2).mean(axis=(1, 2, 3, 4))
        psnr = -10 * np.log10(np.maximum(mse, 1e-12))
        # MS-SSIM dB per level (reference reports it alongside PSNR in
        # compress_with_ac, training/step.py:323-324; 256 crops satisfy
        # the >=176px 5-scale constraint)
        from epic_tpu.utils.metrics import _ms_ssim_jit
        msssim = np.asarray(jax.vmap(
            lambda xh: _ms_ssim_jit(xh, x))(jnp.asarray(x_hat)))
        msssim_db = -10.0 * np.log10(np.maximum(1.0 - msssim, 1e-12))

        est_bpp = []
        for q in [0.0] + list(Q_LIST):
            est_bpp.append(
                float(est_bits(params, x, jnp.float32(q))) / npix)
        est_bpp = np.asarray(est_bpp)

        gap_pct = np.abs(real_bpp - est_bpp) / np.maximum(est_bpp,
                                                          1e-9) * 100
        gap_adj_pct = np.abs(adj_bpp - est_bpp) / np.maximum(est_bpp,
                                                             1e-9) * 100

        # 0.05 dB tolerance: at q=10 the mask admits the lowest-std
        # elements, whose rounding noise can exceed the predicted-mean
        # error — the exact saturation effect variance masking exists to
        # exploit; tiny top-level dips are measurement-level.
        mono_psnr = bool(np.all(np.diff(psnr) >= -0.05))
        mono_bpp = bool(np.all(np.diff(real_bpp) >= 0))
        return {
            # entropy estimation always runs the PLAIN forward; for REM
            # groups the gap fields compare chained-REM real bits against
            # that plain estimate (informative, not a parity criterion)
            **({"est_note": "est uses the plain (non-REM) forward"}
               if rems else {}),
            "n_crops": len(crops),
            "real_bpp": [round(float(b), 4) for b in real_bpp],
            "est_bpp": [round(float(b), 4) for b in est_bpp],
            "gap_pct": [round(float(g), 2) for g in gap_pct],
            "max_gap_pct": round(float(gap_pct.max()), 2),
            "flush_overhead_bpp": round(float(flush_bits[-1]) / npix, 4),
            "gap_excl_flush_pct": [round(float(g), 2)
                                   for g in gap_adj_pct],
            "max_gap_excl_flush_pct": round(float(gap_adj_pct.max()), 2),
            "psnr": [round(float(p_), 2) for p_ in psnr],
            "msssim_db": [round(float(m_), 2) for m_ in msssim_db],
            "monotone_psnr": mono_psnr,
            "monotone_bpp": mono_bpp,
            "criteria": {
                "top_bpp_lt_2": bool(real_bpp[-1] < 2.0),
                "psnr_gt_28": bool(psnr[-1] > 28.0),
                "gap_lt_5pct": bool(gap_adj_pct.max() < 5.0),
                "monotone": mono_psnr and mono_bpp,
            },
        }

    def photo768_crops():
        """768x512 photographic crops (3 training-photo crops + the
        held-out d0 panel) — the stream-layout est-vs-real gap evidence
        at full working resolution (VERDICT r3 item 8). Four crops, not
        all seven: decode-all folds 15 levels into the batch axis, and
        batch 7 at 768x512 overflows v5e HBM."""
        from bench import photo_images

        pool = photo_images(7)
        return [pool[i].astype(np.float32) / 255.0 for i in (0, 3, 5, 6)]

    def rem_per_quality(crops, qualities=(1.0, 2.0, 4.0, 10.0)):
        """Per-quality real-codec RD, plain vs REM-refined coding params
        (the reference's fast_encdec path, rem_pic.py:167-220): for
        q > check_levels[0] the bank refines (mu, scale) from the decoded
        checkpoint latent — THIS is the rate the rems training stage buys
        (the chained single-bitstream ladder is a structural no-op for a
        single check level, so the ladder groups cannot show it)."""
        x = jnp.asarray(np.stack(crops[:4]))
        npix = x.shape[0] * x.shape[1] * x.shape[2]

        def nbits(out):
            y_strings, z_strings = out["strings"]
            return (sum(len(s) for sl in y_strings for s in sl)
                    + sum(len(s) for s in z_strings)) * 8.0

        ck, cks = None, []
        for cl in model.check_levels:
            ck = codec.extract_checkpoint(x, float(cl), checkpoint_rep=ck)
            cks.append(ck)
        rows = []
        for q in qualities:
            if q <= model.check_levels[0]:
                continue
            o_plain = codec.compress(x, float(q))
            o_rem = codec.compress(x, float(q), checkpoint_rep=cks[-1])
            d_plain = codec.decompress(o_plain)
            d_rem = codec.decompress(o_rem, checkpoint_rep=cks[-1])
            mse_p = float(jnp.mean((jnp.asarray(
                d_plain["x_hat"], jnp.float32) - x) ** 2))
            mse_r = float(jnp.mean((jnp.asarray(
                d_rem["x_hat"], jnp.float32) - x) ** 2))
            bpp_p, bpp_r = nbits(o_plain) / npix, nbits(o_rem) / npix
            rows.append({
                "q": q,
                "bpp": round(bpp_p, 4), "bpp_rem": round(bpp_r, 4),
                "psnr": round(-10 * np.log10(max(mse_p, 1e-12)), 2),
                "psnr_rem": round(-10 * np.log10(max(mse_r, 1e-12)), 2),
                "rate_saving_pct": round((bpp_p - bpp_r) / bpp_p * 100, 2),
            })
        return rows

    def shell_table(crops, group):
        """Per-shell Delta diagnostic (VERDICT r4 weak #1: ~6% of the rate
        bought ~0.1% of the quality at the ladder top, cause unmeasured).
        For every quality shell j: the rate/quality increments from the
        decoded ladder plus WHAT the shell codes — element count, the
        fraction of its symbols that are nonzero, mean |symbol| and mean
        predicted sigma of its elements. A top shell whose symbols are
        ~all zero is rate spent coding near-zero-sigma elements (a mask
        policy artifact); nonzero symbols with flat PSNR mean decoder
        saturation (a training artifact)."""
        from epic_tpu.codec.progressive import progressive_encode_start

        x = jnp.asarray(np.stack(crops[:4]))
        st = progressive_encode_start(codec, x, Q_LIST)
        sym = codec._get_sym(st["p8"], st["p16"], st["p32"],
                             st["pflag8"], st["pflag16"])
        sid = np.asarray(jax.device_get(st["sid"]))
        scale = np.asarray(jax.device_get(st["scale_s"]), np.float32)
        g = group
        rows = []
        for j, q in enumerate(Q_LIST):
            m = sid == j
            cnt = int(m.sum())
            s_j = sym[m]
            d_bpp = g["real_bpp"][j + 1] - g["real_bpp"][j]
            d_psnr = g["psnr"][j + 1] - g["psnr"][j]
            rows.append({
                "q": q, "elems": cnt,
                "d_bpp": round(float(d_bpp), 5),
                "d_psnr": round(float(d_psnr), 3),
                "db_per_bpp": round(float(d_psnr / d_bpp), 2)
                if d_bpp > 1e-9 else None,
                "nonzero_frac": round(float((s_j != 0).mean()), 4)
                if cnt else 0.0,
                "mean_abs_sym": round(float(np.abs(s_j).mean()), 4)
                if cnt else 0.0,
                "mean_sigma": round(float(scale[m].mean()), 4)
                if cnt else 0.0,
            })
        never = int((sid >= len(Q_LIST)).sum())
        return {"per_shell": rows, "never_coded_elems": never,
                "total_elems": int(sid.size)}

    groups = {}
    is_rem = hasattr(model, "check_levels") and cfg.get("model") == "rem"
    for name in args.regions:
        crops = (heldout_crops() if name == "val"
                 else photo768_crops() if name == "photo768"
                 else region_crops(name))
        print(f"# group {name}: {len(crops)} 256x256 crops", flush=True)
        groups[name] = eval_group(crops)
        groups[name]["shells"] = shell_table(crops, groups[name])
        if is_rem:
            # ladder through the chained-REM coding path (identical to
            # plain for a single check level — kept as a parity check)
            groups[name + "_rem"] = eval_group(crops, rems=True)
            # per-quality REM rate savings — the rems stage's actual win
            groups[name]["rem_per_quality"] = rem_per_quality(crops)

    first = groups[args.regions[0]]
    res = {
        "checkpoint": f"{args.ckpt}/{which}@{step}",
        "model": {k: cfg.get(k) for k in
                  ("model", "n", "m", "division", "dim_chunk")},
        "levels": [0.0] + list(Q_LIST),
        "n_heldout_crops": first["n_crops"],
        **{k: v for k, v in first.items() if k != "n_crops"},
        "groups": groups,
    }
    if len(args.regions) > 1 and "d0" in groups:
        # train-content vs unseen-photograph delta (VERDICT r2 item 6)
        res["d0_vs_val_psnr_delta_top"] = round(
            groups["d0"]["psnr"][-1] - first["psnr"][-1], 2)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
