"""Stage-level profile of the progressive RD sweep on the real TPU.

Times every device program of the codec independently (block_until_ready),
plus D2H transfer cost and the host rANS share, and reports XLA
cost_analysis FLOPs for the heavy programs so achieved TFLOP/s vs the v5e
peak (~197 bf16) can be judged. This is the profiling deliverable VERDICT
task 6 asks for (the axon tunnel blocks tensorboard-based traces; this is
the equivalent evidence, per-program).

Usage: timeout 900 python tools/profile_sweep.py [--batch 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_DISPATCH_FLOOR = [0.0]  # measured dispatch+fetch latency, set in main()


def _force_done(outs):
    """Round-trip ONE element of the first output leaf to the host.

    `jax.block_until_ready` on the tunneled axon runtime can return
    before the program actually finishes (observed: a 10-TFLOP program
    "completing" in 0.6 ms → a bogus 16 PFLOP/s in profile_r5.json), so
    every timing forces a real D2H data dependency instead. Costs one
    extra launch + fetch (~30 ms), which is measured as
    _DISPATCH_FLOOR and subtracted.
    """
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(outs)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def timed(fn, *args, n=3):
    """Median wall time of fn(*args) with forced-completion sync, minus
    the measured dispatch+fetch floor."""
    outs = None
    ts = []
    for _ in range(n):
        t0 = time.time()
        outs = fn(*args)
        _force_done(outs)
        ts.append(time.time() - t0)
    ts.sort()
    # floor at 0.1 ms: a program faster than the floor resolution is
    # reported as "at the floor", never as 0 (div-by-zero in TFLOP/s)
    return max(ts[len(ts) // 2] - _DISPATCH_FLOOR[0], 1e-4), outs


def flops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--ckpt", default="artifacts/ckpt_r2")
    p.add_argument("--out", default=None)
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
                                progressive_encode)
    from epic_tpu.codec.progressive import (_p_shell_ids,
                                            progressive_encode_finish,
                                            progressive_encode_start)
    from epic_tpu.training import load_checkpoint

    model, params, cfg, step = load_checkpoint(
        args.ckpt, "last", config_overrides={"compute_dtype": "bfloat16"})
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)
    codec = PICCodec(model, {"params": params})
    v = codec.variables

    x = jnp.asarray(np.stack(photo_images(args.batch)))
    npix = args.batch * 512 * 768
    check_levels = list(getattr(model, "check_levels", ()) or ())
    rems_arg = len(check_levels) >= 2 and model.ns1 > model.ns0

    # warm up the whole pipeline (compiles everything), bench-shaped
    t0 = time.time()
    st_w = progressive_encode_start(codec, x, Q_LIST, rems=rems_arg)
    bs, bits = progressive_encode_finish(codec, st_w)
    out_all = progressive_decode_all(codec, bs, rems=rems_arg,
                                     y_checkpoints=st_w["auto_ckpts"])
    jax.block_until_ready(out_all["x_hat"])
    warm_s = time.time() - t0
    print(f"# warmup {warm_s:.1f}s", file=sys.stderr, flush=True)

    # measure the dispatch+fetch floor with a trivial program so per-
    # program timings report device compute, not tunnel latency
    trivial = jax.jit(lambda a: a + 1.0)
    _force_done(trivial(jnp.zeros((8,), jnp.float32)))  # compile
    floor_ts = []
    for _ in range(5):
        t0 = time.time()
        _force_done(trivial(jnp.zeros((8,), jnp.float32)))
        floor_ts.append(time.time() - t0)
    floor_ts.sort()
    _DISPATCH_FLOOR[0] = floor_ts[len(floor_ts) // 2]
    print(f"# dispatch+fetch floor {_DISPATCH_FLOOR[0]*1e3:.1f} ms "
          "(subtracted from every per-program timing)",
          file=sys.stderr, flush=True)

    prof = {}

    # ---- encode-side device programs ----
    t, (y, y_base, z_sym) = timed(codec._p_front(), v, x, codec._z_med_dev)
    prof["front_g_a_h_a"] = t
    t, (lm, ls) = timed(codec._p_zhat_hyper(False), v, z_sym,
                        codec._z_med_dev)
    prof["hyper_synthesis"] = t

    lm_b = lm[..., :model.division[0]]
    ls_b = ls[..., :model.division[0]]
    c = model.dim_chunk

    # the fused encoder chain the codec actually runs (mode-dependent:
    # 'scan' = one launch zero host round trips on TPU, 'io' = one launch
    # + ns0 callback round trips on CPU)
    t, chain_out = timed(codec._encode_base_chain, v, y_base, lm_b, ls_b)
    prof["base_chain_fused_%s" % codec.chain_mode] = t
    y_hat_slices = chain_out[0]
    syms = [(chain_out[4][i], chain_out[3][i]) for i in range(model.ns0)]

    # the per-slice interleave it replaced, for comparison
    tb_params = tb_sym = tb_finish = 0.0
    buf = codec._base_buf0(lm_b)
    for i in range(model.ns0):
        t, (mu, scale, idx, msup) = timed(
            codec._p_base_params(), v, lm_b, ls_b, buf, np.int32(i))
        tb_params += t
        y_i = y[..., i * c:(i + 1) * c]
        t, (s8, s16, s32, fl8, fl16) = timed(codec._p_base_sym(), y_i, mu)
        tb_sym += t
        t, (y_hat, buf) = timed(codec._p_base_finish(), v, s32, mu, msup,
                                buf, np.int32(i))
        tb_finish += t
    prof["OLD_base_params_x%d" % model.ns0] = tb_params
    prof["OLD_base_sym_x%d" % model.ns0] = tb_sym
    prof["OLD_base_finish_x%d" % model.ns0] = tb_finish

    t, (mu_s, scale_s, mask1, idx_full, msups) = timed(
        codec._p_prog_params(10.0), v, y_hat_slices, lm, ls)
    prof["prog_params_chain"] = t
    t, (p8, p16, p32, pfl8, pfl16) = timed(codec._p_prog_sym(), y, mu_s,
                                           mask1)
    prof["prog_sym"] = t
    if rems_arg:
        mus_b, scales_b = chain_out[1], chain_out[2]
        cks = st_w["auto_ckpts"]
        t, _ = timed(
            codec._p_prog_params_rem_chain(len(cks)), v, y_hat_slices,
            lm, ls, tuple(cks), mus_b, scales_b)
        prof["prog_params_rem_chain_x%d" % len(cks)] = t
        t, _ = timed(codec._p_prog_params(float(check_levels[0])),
                     v, y_hat_slices, lm, ls)
        prof["ckpt_extract_params_lvl0"] = t
        t, _ = timed(codec._p_prog_reconstruct(), v, p32, mu_s, msups,
                     y_hat_slices)
        prof["ckpt_extract_reconstruct_1lev"] = t
    t, sid = timed(_p_shell_ids(codec, tuple(Q_LIST)), scale_s)
    prof["shell_ids"] = t

    # ---- D2H transfer costs (tunnel-bound) ----
    t0 = time.time()
    _ = np.asarray(jax.device_get(jnp.stack([s for s, _ in syms])))
    prof["d2h_base_sym_int8"] = time.time() - t0
    t0 = time.time()
    _ = np.asarray(jax.device_get(p8))
    prof["d2h_prog_sym_int8"] = time.time() - t0
    t0 = time.time()
    _ = np.asarray(jax.device_get(idx_full))
    prof["d2h_prog_idx_int8"] = time.time() - t0
    t0 = time.time()
    _ = np.asarray(jax.device_get(sid))
    prof["d2h_shell_ids_int8"] = time.time() - t0

    # ---- decode-side reconstruct ----
    nq = len(Q_LIST)
    t, _ = timed(codec._p_prog_reconstruct_all(nq), v, p32,
                 jnp.asarray(np.asarray(jax.device_get(sid))), mu_s,
                 msups, y_hat_slices)
    prof["prog_reconstruct_all_%dlev" % nq] = t
    t, _ = timed(codec._p_synth_base(), v, y_hat_slices)
    prof["synth_base"] = t

    # ---- host rANS share over one full sweep ----
    codec.y_coder.stats.update(encode_s=0.0, decode_s=0.0)
    codec.z_coder.stats.update(encode_s=0.0, decode_s=0.0)
    t0 = time.time()
    st = progressive_encode_start(codec, x, Q_LIST, rems=rems_arg)
    bs, bits = progressive_encode_finish(codec, st)
    enc_wall = time.time() - t0
    t0 = time.time()
    out_all = progressive_decode_all(codec, bs, rems=rems_arg,
                                     y_checkpoints=st["auto_ckpts"])
    jax.block_until_ready(out_all["x_hat"])
    dec_wall = time.time() - t0
    rans_s = sum(codec.y_coder.stats[k] + codec.z_coder.stats[k]
                 for k in ("encode_s", "decode_s"))

    # ---- FLOPs of the heavy programs -> achieved TFLOP/s ----
    flops = {}
    f = flops_of(codec._p_front(), v, x, codec._z_med_dev)
    if f:
        flops["front_g_a_h_a"] = {
            "gflops": round(f / 1e9, 1),
            "achieved_tflops": round(f / prof["front_g_a_h_a"] / 1e12, 1)}
    f = flops_of(codec._p_prog_params(10.0), v, y_hat_slices, lm, ls)
    if f:
        flops["prog_params_chain"] = {
            "gflops": round(f / 1e9, 1),
            "achieved_tflops": round(
                f / prof["prog_params_chain"] / 1e12, 1)}
    f = flops_of(codec._p_prog_reconstruct_all(nq), v, p32,
                 jnp.asarray(np.asarray(jax.device_get(sid))), mu_s,
                 msups, y_hat_slices)
    if f:
        flops["prog_reconstruct_all"] = {
            "gflops": round(f / 1e9, 1),
            "achieved_tflops": round(
                f / prof["prog_reconstruct_all_%dlev" % nq] / 1e12, 1)}

    # OLD_* rows are the replaced interleave, kept for comparison only —
    # they are not part of the sweep the codec actually runs
    dev_total = sum(v_ for k, v_ in prof.items()
                    if not k.startswith(("d2h", "OLD_")))
    d2h_total = sum(v_ for k, v_ in prof.items() if k.startswith("d2h"))
    res = {
        "batch": args.batch,
        "checkpoint": f"{args.ckpt}@{step}",
        "dispatch_fetch_floor_ms": round(_DISPATCH_FLOOR[0] * 1e3, 1),
        "stage_seconds": {k: round(v_, 4) for k, v_ in
                          sorted(prof.items(), key=lambda kv: -kv[1])},
        "device_program_s": round(dev_total, 3),
        "d2h_transfer_s": round(d2h_total, 3),
        "host_rans_s": round(rans_s, 3),
        "sweep_encode_wall_s": round(enc_wall, 3),
        "sweep_decode_wall_s": round(dec_wall, 3),
        "img_per_s": round(args.batch / (enc_wall + dec_wall), 4),
        "flops": flops,
    }
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as fo:
            json.dump(res, fo, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
