"""Progressive single-bitstream codec.

Reference behavior: src/test/functions_encode.py / functions_decode.py —
encode once into a base stream plus incremental "delta shells" (the elements
newly admitted by the variance mask between consecutive quality levels);
decode any prefix of shells, caching the hyperprior and entropy-parameter
work across quality levels.

TPU-native structure: residual symbols, CDF indexes, and ALL shell masks for
the whole quality ladder come out of two jitted device programs and cross to
the host once; shell selection/accumulation is numpy on the host; the final
reconstruction (mean replacement + LRP + merge + g_s) is one device program
shared with the random-access codec (PICCodec._p_prog_reconstruct).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import prog_mask
from .pic_codec import PICCodec

DEFAULT_Q_LIST = [0.01, 0.05, 0.1, 0.25, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0,
                  2.0, 3.0, 4.0, 4.5, 10.0]


def _p_shell_masks(codec: PICCodec, q_list_key):
    """Jitted: stacked per-level delta-shell masks [Q,S,B,h,w,c] plus the
    unmasked indexes (reference: functions_encode.py:172-196)."""
    def make():
        q_list = list(q_list_key)

        def f(scale_s):
            masks = [prog_mask(scale_s, q) for q in q_list]
            deltas = [masks[0]]
            for j in range(1, len(masks)):
                deltas.append(masks[j] - masks[j - 1])
            return jnp.stack(deltas)
        return f
    return codec._prog(("shell_masks", q_list_key), make)


def _p_shell_ids(codec: PICCodec, q_list_key):
    """Jitted: per-element shell id [S,B,h,w,c] int8 — the index of the
    quality shell that first admits each element (len(q_list) if never
    admitted). Shells are disjoint and monotone, so this one compact map
    replaces the Q stacked delta masks — a Qx smaller device->host
    transfer over the tunnel."""
    def make():
        q_list = list(q_list_key)

        def f(scale_s):
            masks = jnp.stack([prog_mask(scale_s, q) for q in q_list])
            admitted = masks.sum(0)  # number of ladders including elem
            # first admitting shell = Q - admitted (masks are nested)
            sid = (len(q_list) - admitted).astype(jnp.int8)
            return sid
        return f
    return codec._prog(("shell_ids", q_list_key), make)


# ---- tunnel bit-packing (host half; device half: PICCodec._p_pack*) ----
# The tunnel moves ~5 MB/s; every dense int8 buffer crossing it is packed
# to its information width on the producing side and unpacked on the
# consuming side. All transforms are exact bit moves (tests/test_packing).


def _unpack4u(p: np.ndarray, c: int) -> np.ndarray:
    """Inverse of PICCodec._p_pack4u: uint8 [..., c//2] ->
    int8 [..., c] with values in [0, 15]."""
    u = p.view(np.uint8)
    out = np.empty(p.shape[:-1] + (c,), np.int8)
    out[..., 0::2] = (u & 15).astype(np.int8)
    out[..., 1::2] = (u >> 4).astype(np.int8)
    return out


def _unpack4s(p: np.ndarray, c: int) -> np.ndarray:
    """Inverse of PICCodec._p_pack4_sym: uint8 [..., c//2] ->
    int8 [..., c] with values in [-8, 7]."""
    u = p.view(np.uint8)
    out = np.empty(p.shape[:-1] + (c,), np.int8)
    out[..., 0::2] = (u & 15).astype(np.int8) - 8
    out[..., 1::2] = (u >> 4).astype(np.int8) - 8
    return out


def _unpack6(p: np.ndarray, c: int) -> np.ndarray:
    """Inverse of PICCodec._p_pack6: uint8 [..., 3c//4] ->
    int8 [..., c] with values in [0, 63]."""
    u = p.view(np.uint8).reshape(p.shape[:-1] + (c // 4, 3))
    o0, o1, o2 = u[..., 0], u[..., 1], u[..., 2]
    out = np.empty(p.shape[:-1] + (c // 4, 4), np.uint8)
    out[..., 0] = o0 & 63
    out[..., 1] = (o0 >> 6) | ((o1 & 15) << 2)
    out[..., 2] = (o1 >> 4) | ((o2 & 3) << 4)
    out[..., 3] = o2 >> 2
    return out.reshape(p.shape[:-1] + (c,)).view(np.int8)


def _pack4s_np(a: np.ndarray) -> np.ndarray:
    """Host-side signed-4-bit pack of the decoded-symbol canvas (values
    in [-8, 7]) for the H2D upload; device inverse:
    PICCodec._p_unpack4s_widen."""
    u = (a.astype(np.int16) + 8).astype(np.uint8)
    return u[..., 0::2] | (u[..., 1::2] << 4)


def _pack_widths(codec: PICCodec, nq: int):
    """(pack4_ok, pack6_ok) guards: shell ids need <= 16 distinct values
    and an even last axis; CDF indexes need a <= 64-entry scale table and
    a last axis divisible by 4. EPIC_PACK=0 disables packing (each packed
    buffer trades ~30 ms of extra program dispatch for its byte saving —
    a win only when the link is bandwidth-bound, as the axon tunnel is)."""
    import os

    if os.environ.get("EPIC_PACK", "1") == "0":
        return False, False
    c = codec.model.dim_chunk
    return (nq <= 15 and c % 2 == 0,
            len(codec._scale_table) <= 64 and c % 4 == 0)


def _shell_order(sid_np, nq: int):
    """Per-image stable sort of the flattened (slice,h,w,c) grid by shell
    id. Returns (order [B,N], starts [B,nq+1]): shell j of image b is the
    sorted segment [starts[b,j], starts[b,j+1]). Elements with
    sid >= nq (never admitted at any quality) sort past starts[b,nq] and
    are never coded. Encoder and decoder both run this on the SAME sid
    bytes (shared device program), so the permutation is identical."""
    import numpy as np

    b = sid_np.shape[1]
    key = sid_np.transpose(1, 0, 2, 3, 4).reshape(b, -1)
    order = np.argsort(key, axis=-1, kind="stable")
    key_sorted = np.take_along_axis(key, order, -1)
    starts = np.stack([
        np.searchsorted(key_sorted[bi], np.arange(nq + 1, dtype=key.dtype))
        for bi in range(b)])
    return order, starts


def _sort_flat(arr_np, order):
    """[S,B,h,w,c] -> per-image flat [B,N] in shell-sorted order."""
    import numpy as np

    b = arr_np.shape[1]
    return np.take_along_axis(
        arr_np.transpose(1, 0, 2, 3, 4).reshape(b, -1), order, -1)


def progressive_encode_start(codec: PICCodec, x,
                             q_list: Optional[Sequence[float]] = None,
                             rems: bool = False,
                             y_checkpoints=None,
                             force_io: Optional[bool] = None
                             ) -> Dict[str, Any]:
    """Device phase of the single-stream progressive encoder: dispatches
    every device program for this image batch and starts the async
    device->host copies, WITHOUT any host synchronization. Pair with
    progressive_encode_finish (host sort + rANS); between the two calls
    the chip is free to run the next batch's programs — the double-buffer
    seam that hides host entropy coding behind device compute
    (SURVEY §2.8 extended; VERDICT r2 item 2)."""
    q_list = list(q_list if q_list is not None else DEFAULT_Q_LIST)
    model = codec.model
    if model.ns1 > model.ns0 and not model.all_scalable:
        raise ValueError("progressive coding requires all_scalable=True")
    v = codec.variables
    x = jnp.asarray(x)
    c = model.dim_chunk

    y, y_base, z_sym_dev = codec._p_front()(v, x, codec._z_med_dev)
    lm, ls = codec._p_zhat_hyper(False)(v, z_sym_dev, codec._z_med_dev)
    lm_b = lm[..., :model.division[0]]
    ls_b = ls[..., :model.division[0]]

    # base chain: device-only on the encoder side (it knows all symbols),
    # via the SAME program the decoder runs — identical program instances
    # keep entropy params bitwise equal by construction. Default: the
    # fused io-callback chain (ONE launch, PICCodec._p_base_chain_io);
    # fallback: the per-slice fused-step interleave.
    ns0 = model.ns0
    chain = None
    if force_io is None or force_io:
        chain = codec._encode_base_chain(v, y_base, lm_b, ls_b)
    if chain is not None:
        (y_hat_slices, mus_b, scales_b, base_idx, base_s8, base_s16,
         base_flag8, base_flag16) = chain
        base_s32 = base_s16  # int16 overflow falls back via base_flag16
    else:
        buf = codec._base_buf0(lm_b)
        y_hat_slices = []
        mus_b, scales_b = [], []
        s8s, s16s, s32s, flags8, flags16, idxs = [], [], [], [], [], []
        mu, scale, idx, msup = codec._p_base_params()(
            v, lm_b, ls_b, buf, np.int32(0))
        for i in range(ns0):
            y_i = y[..., i * c:(i + 1) * c]
            s8, s16, s32, fl8, fl16 = codec._p_base_sym()(y_i, mu)
            mus_b.append(mu)
            scales_b.append(scale)
            idxs.append(idx)
            if i + 1 < ns0:
                y_hat, buf, mu, scale, idx, msup = codec._p_base_step()(
                    v, s32, mu, msup, buf, np.int32(i), lm_b, ls_b)
            else:
                y_hat, buf = codec._p_base_finish()(v, s32, mu, msup, buf,
                                                    np.int32(i))
            y_hat_slices.append(y_hat)
            s8s.append(s8)
            s16s.append(s16)
            s32s.append(s32)
            flags8.append(fl8)
            flags16.append(fl16)
        base_s8 = jnp.stack(s8s)
        base_s16 = jnp.stack(s16s)
        base_s32 = jnp.stack(s32s)
        base_idx = jnp.stack(idxs)
        base_flag8 = jnp.stack(flags8).any()
        base_flag16 = jnp.stack(flags16).any()

    from .pic_codec import _as_chain

    auto_ckpts = None
    if (rems and y_checkpoints is None
            and getattr(model, "check_levels", None)):
        # AUTO checkpoint extraction fused into the encode: the chained
        # check-level latents (reference demo.py:86-93) via the SAME
        # shared programs as extract_checkpoint_device, but reusing THIS
        # encode's front/hyper/base work instead of recomputing it per
        # level (2 extra full front+base chains per sweep at 2 levels).
        # Bitwise equal to extract_checkpoint[_device]: identical program
        # instances on identical inputs.
        y_checkpoints, prev = [], None
        for cl in model.check_levels:
            if prev is None:
                mu_c, _, mask_c, _, msups_c = codec._p_prog_params(
                    float(cl))(v, _as_chain(y_hat_slices), lm, ls)
            else:
                mu_c, _, mask_c, _, msups_c = codec._p_prog_params(
                    float(cl), True)(
                    v, _as_chain(y_hat_slices), lm, ls, prev,
                    _as_chain(mus_b), _as_chain(scales_b))
            _, _, s32_c, _, _ = codec._p_prog_sym()(y, mu_c, mask_c)
            _, prev = codec._p_prog_reconstruct()(
                v, s32_c, mu_c, msups_c, _as_chain(y_hat_slices))
            y_checkpoints.append(prev)
        auto_ckpts = y_checkpoints

    if rems and y_checkpoints:
        mu_s, scale_s, idx_full, msups = codec._p_prog_params_rem_chain(
            len(y_checkpoints))(v, _as_chain(y_hat_slices), lm, ls,
                                tuple(jnp.asarray(ck)
                                      for ck in y_checkpoints),
                                _as_chain(mus_b), _as_chain(scales_b))
        mask1 = jnp.ones_like(scale_s)
    else:
        mu_s, scale_s, mask1, idx_full, msups = codec._p_prog_params(10.0)(
            v, _as_chain(y_hat_slices), lm, ls)
    p8, p16, p32, pflag8, pflag16 = codec._p_prog_sym()(y, mu_s, mask1)
    sid = _p_shell_ids(codec, tuple(q_list))(scale_s)

    # bit-pack the D2H buffers to their information width (the tunnel
    # moves ~5 MB/s; the dense int8 sweep fetch is ~10 MB at B=4): shell
    # ids 4-bit, CDF indexes 6-bit, progressive symbols signed 4-bit with
    # an overflow flag falling back to the int8/16/32 widening fetch
    pack4, pack6 = _pack_widths(codec, len(q_list))
    sid_p = codec._p_pack4u()(sid) if pack4 else sid
    p4, pflag4 = (codec._p_pack4_sym()(p8) if pack4
                  else (p8, jnp.asarray(True)))
    idx_p = codec._p_pack6()(idx_full) if pack6 else idx_full
    base_idx_p = codec._p_pack6()(base_idx) if pack6 else base_idx

    # async-copy the packed buffers (the widths actually fetched in
    # practice); the widening fallbacks transfer only on their flags
    for a in (z_sym_dev, base_s8, base_idx_p, base_flag8, base_flag16,
              p4, pflag4, pflag8, pflag16, idx_p, sid_p):
        a.copy_to_host_async()
    return {
        "q_list": q_list,
        "z_sym": z_sym_dev,
        "base_s8": base_s8, "base_s16": base_s16, "base_s32": base_s32,
        "base_idx": base_idx,
        # packed fetch buffers (finish prefers these; the dense device
        # handles above/below stay for direct consumers and fallbacks)
        "pack4": pack4, "pack6": pack6,
        "p4": p4, "pflag4": pflag4,
        "sid_p": sid_p, "idx_p": idx_p, "base_idx_p": base_idx_p,
        "base_flag8": base_flag8, "base_flag16": base_flag16,
        # decoder routing: io-mode only (scan-mode streams decode via the
        # interleaved programs); "fused" records whether a fused encoder
        # chain ran (its int16 overflow flag is then meaningful)
        "io_chain": chain is not None and codec.chain_mode == "io",
        "fused": chain is not None,
        "x": x, "rems": rems, "ckpts": y_checkpoints,
        "auto_ckpts": auto_ckpts,
        "p8": p8, "p16": p16, "p32": p32,
        "pflag8": pflag8, "pflag16": pflag16,
        "idx_full": idx_full, "sid": sid,
        # device handles for callers reusing the encoder's work
        "y": y, "lm": lm, "ls": ls,
        "base_slices": _as_chain(y_hat_slices),
        "mu_s": mu_s, "scale_s": scale_s, "msups": msups,
    }


def progressive_encode_finish(codec: PICCodec,
                              st: Dict[str, Any],
                              timing: Optional[Dict[str, float]] = None
                              ) -> tuple[Dict[str, Any], list]:
    """Host phase: shell sort + one segmented rANS stream per image (plus
    the z streams). Consumes the state from progressive_encode_start.
    `timing` (optional dict) accumulates per-phase seconds
    (fetch/sort/pack/rans) for pipeline diagnosis."""
    q_list = st["q_list"]
    nq = len(q_list)

    def tick(key, t0):
        if timing is not None:
            timing[key] = timing.get(key, 0.0) + (time.time() - t0)
        return time.time()

    t = time.time()
    if st.get("fused") and bool(jax.device_get(st["base_flag16"])):
        # base symbols exceed int16 (untrained model / pathological
        # input): the io chain's payload width can't carry them — redo
        # this batch through the interleaved path (int32-capable)
        st2 = progressive_encode_start(codec, st["x"], q_list,
                                       st.get("rems", False),
                                       st.get("ckpts"), force_io=False)
        return progressive_encode_finish(codec, st2, timing)
    z_sym = np.asarray(jax.device_get(st["z_sym"]))
    c = codec.model.dim_chunk
    pack4, pack6 = st.get("pack4"), st.get("pack6")
    base_sym = codec._get_sym(st["base_s8"], st["base_s16"],
                              st["base_s32"], st["base_flag8"],
                              st["base_flag16"])
    if pack6:  # 6-bit packed CDF buckets (64-entry scale table)
        base_idx = _unpack6(np.asarray(jax.device_get(st["base_idx_p"])), c)
        idx_np = _unpack6(np.asarray(jax.device_get(st["idx_p"])), c)
    else:
        base_idx = np.asarray(jax.device_get(st["base_idx"]))
        idx_np = np.asarray(jax.device_get(st["idx_full"]))
    if pack4 and not bool(jax.device_get(st["pflag4"])):
        # progressive symbols fit signed 4-bit (the trained-model common
        # case); overflow falls back to the int8/16/32 widening fetch
        sym_np = _unpack4s(np.asarray(jax.device_get(st["p4"])), c)
    else:
        sym_np = codec._get_sym(st["p8"], st["p16"], st["p32"],
                                st["pflag8"], st["pflag16"])
    sid_np = (_unpack4u(np.asarray(jax.device_get(st["sid_p"])), c)
              if pack4 else np.asarray(jax.device_get(st["sid"])))
    t = tick("fetch_s", t)

    z_strings = codec._encode_z(z_sym)
    z_shape = z_sym.shape[1:3]
    t = tick("z_rans_s", t)

    b = sym_np.shape[1]

    # per-image flat [B, S*h*w*c] views at the NARROW device dtypes; the
    # stable shell bucketing + gather + segmented encode all run inside
    # ONE C call (epic_rans_encode_shell_batch) — the former numpy
    # argsort/take/concat pack measured ~1.9s/sweep on this 1-core host
    def flat(a):
        return np.ascontiguousarray(
            a.transpose(1, 0, 2, 3, 4).reshape(b, -1))

    blobs, prefix = codec.y_coder.encode_shell_batch(
        flat(base_sym), flat(base_idx).view(np.uint8),
        flat(sym_np), flat(idx_np).view(np.uint8), flat(sid_np), nq)
    tick("y_rans_s", t)
    bitstreams = {
        "layout": "stream",
        "q_list": q_list,
        "shape": tuple(int(s) for s in z_shape),
        "z": z_strings,
        "y": blobs,
        "prefix": prefix,
        "io_chain": bool(st.get("io_chain")),
    }
    bits_z = sum(len(s) for s in z_strings) * 8.0
    bits_base = float(prefix[:, 0].sum()) * 8.0
    bits_prog = [float((prefix[:, j + 1] - prefix[:, j]).sum()) * 8.0
                 for j in range(nq)]
    return bitstreams, [bits_z, bits_base, bits_prog]


def progressive_encode(codec: PICCodec, x,
                       q_list: Optional[Sequence[float]] = None,
                       rems: bool = False,
                       y_checkpoints=None,
                       layout: str = "stream") -> tuple[Dict[str, Any], list]:
    """Encode x into a progressive bitstream. Returns
    (bitstreams, [bits_z, bits_base, [per-shell bits]]) like the reference
    encode (functions_encode.py:15-64).

    layout="stream" (default): ONE y rANS message per image — base slices
    followed by the shell-sorted progressive symbols — with exact
    per-level decode-prefix byte counts from the segmented encoder
    (entropy/coder.py:encode_seg_batch). Two flushes per image total
    (z + y) instead of the reference's one per (shell, image)
    (functions_encode.py:172-196), so the transmitted bpp carries no
    per-shell flush overhead while staying progressively truncatable:
    the last ``prefix[b][k]`` bytes of image b's y-stream decode levels
    0..k (the rANS decoder reads from the buffer end).

    layout="messages": the reference-shaped per-(shell, image) messages.
    """
    q_list = list(q_list if q_list is not None else DEFAULT_Q_LIST)
    if layout not in ("stream", "messages"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "stream":
        return progressive_encode_finish(
            codec, progressive_encode_start(codec, x, q_list, rems,
                                            y_checkpoints))
    if codec.model.ns1 > codec.model.ns0 and not codec.model.all_scalable:
        # shell encoding quantizes every residual ONCE against
        # quality-independent params; with all_scalable=False the params
        # change per quality, so no single symbol grid exists (the
        # reference's single-bitstream demo likewise assumes the paper's
        # all_scalable configuration, functions_encode.py:68-196). Use
        # PICCodec.compress/decompress per quality instead.
        raise ValueError(
            "progressive (single-bitstream) coding requires "
            "all_scalable=True; use PICCodec.compress per quality for "
            "all_scalable=False models")
    v = codec.variables

    out_base = codec.compress(x, quality=0, return_latents=True)
    y_strings, z_strings = out_base["strings"]

    # reuse the device-side context compress already computed (front +
    # full hyper + decoded base slices) — no recomputation
    dev = out_base["_device"]
    y, lm, ls = dev["y"], dev["lm"], dev["ls"]
    base_slices = dev["base_slices"]
    c = codec.model.dim_chunk

    # quality-independent entropy params; q=10 -> all-ones mask, unmasked
    # indexes (functions_encode.py:153-158 quantizes everything once)
    if rems and y_checkpoints:
        mu_b = dev["mus_b"]
        std_b = dev["scales_b"]
        mu_s, scale_s, idx_full, msups = codec._p_prog_params_rem_chain(
            len(y_checkpoints))(v, base_slices, lm, ls,
                                tuple(jnp.asarray(ck)
                                      for ck in y_checkpoints),
                                mu_b, std_b)
        mask1 = jnp.ones_like(scale_s)
    else:
        mu_s, scale_s, mask1, idx_full, msups = codec._p_prog_params(10.0)(
            v, base_slices, lm, ls)
    s8, s16, s32, fl8, fl16 = codec._p_prog_sym()(y, mu_s, mask1)

    sid = _p_shell_ids(codec, tuple(q_list))(scale_s)

    sym_np = codec._get_sym(s8, s16, s32, fl8, fl16)   # [S,B,h,w,c]
    idx_np = np.asarray(jax.device_get(idx_full)).astype(np.int32)
    sid_np = np.asarray(jax.device_get(sid))           # int8, Qx smaller

    b = sym_np.shape[1]
    nq = len(q_list)
    # shell compaction: encode ONLY in-shell symbols. Both sides derive
    # the same stable sort-by-shell-id permutation from sid (computed by
    # the shared device program), so segment boundaries agree bitwise and
    # nothing extra is transmitted. vs the dense alternative (full grid
    # zero-masked per shell): ~10x fewer host rANS symbols and no
    # [Q,S,B,h,w,c] marshaling (profiled dominant encode cost).
    order, starts = _shell_order(sid_np, nq)
    sym_sorted = _sort_flat(sym_np, order)
    idx_sorted = _sort_flat(idx_np, order)
    bits_z = sum(len(s) for s in z_strings) * 8.0

    shells: List[List[bytes]] = [[b""] * b for _ in range(nq)]
    seg_syms, seg_idx, seg_len, pos = [], [], [], []
    for j in range(nq):
        for bi in range(b):
            s0, s1 = int(starts[bi, j]), int(starts[bi, j + 1])
            if s1 > s0:
                seg_syms.append(sym_sorted[bi, s0:s1])
                seg_idx.append(idx_sorted[bi, s0:s1])
                seg_len.append(s1 - s0)
                pos.append((j, bi))
    if seg_len:
        blobs = codec.y_coder.encode_batch(
            np.ascontiguousarray(np.concatenate(seg_syms)),
            np.ascontiguousarray(np.concatenate(seg_idx)), seg_len)
        for (j, bi), blob in zip(pos, blobs):
            shells[j][bi] = blob
    bits_prog = [sum(len(bl) for bl in shell) * 8.0 for shell in shells]

    bitstreams = {
        "layout": "messages",
        "q_list": q_list,
        "shape": out_base["shape"],
        "z": z_strings,
        "base": y_strings,
        "progressive": shells,
        "io_chain": bool(out_base.get("io_chain")),
    }
    bits_base = sum(len(s) for sl in y_strings for s in sl) * 8.0
    return bitstreams, [bits_z, bits_base, bits_prog]


def progressive_decode(codec: PICCodec, bitstreams: Dict[str, Any],
                       q_ind: int = 0,
                       cache: Optional[Dict[str, Any]] = None,
                       rems: bool = False,
                       y_checkpoints=None) -> Dict[str, Any]:
    """Decode the first q_ind shells (0 = base only). `cache` carries
    z/base/entropy-parameter state across calls (reference: functions_
    decode.py:58-229 with its z_data/entropy_data caching)."""
    v = codec.variables
    q_list = bitstreams["q_list"]
    assert q_ind <= len(q_list)
    cache = cache if cache is not None else {}
    stream = bitstreams.get("layout", "messages") == "stream"
    t0 = time.time()

    if "hyper" not in cache:
        z_sym = codec._decode_z(bitstreams["z"], bitstreams["shape"],
                                codec.model.n)
        z_sym_dev = jnp.asarray(z_sym)
        lm, ls = codec._p_zhat_hyper(False)(v, z_sym_dev, codec._z_med_dev)
        cache["hyper"] = (lm, ls)
    lm, ls = cache["hyper"]

    if "base" not in cache:
        if stream:
            # stateful per-image decoders over the single y-streams: base
            # slices come first, shells continue from the same rANS state
            cache["streams"] = [codec.y_coder.stream_decoder(s)
                                for s in bitstreams["y"]]
        lm_b = lm[..., :codec.model.division[0]]
        ls_b = ls[..., :codec.model.division[0]]
        ns0 = codec.model.ns0
        if bitstreams.get("io_chain"):
            # the encoder ran the fused io-callback chain: run the SAME
            # program with the host rANS behind the callbacks. The stream
            # decoders are consumed asynchronously as the program
            # executes; every later use of them (shell decode) is behind
            # a host fetch that syncs past the chain.
            (y_hat_s, mu_b_s, std_b_s, _, _, _, _, _) = \
                codec._base_chain_call(
                    v, lm_b, lm_b, ls_b,
                    strings=None if stream else bitstreams["base"],
                    streams=cache.get("streams"))
            cache["base"] = y_hat_s
            cache["base_params"] = (mu_b_s, std_b_s)
        else:
            y_hat_slices: List[jnp.ndarray] = []
            mu_b, std_b = [], []
            buf = codec._base_buf0(lm_b)
            mu, scale, idx, msup = codec._p_base_params()(
                v, lm_b, ls_b, buf, np.int32(0))
            for i in range(ns0):
                idx_np = np.asarray(jax.device_get(idx)).astype(np.int32)
                if stream:
                    nb = idx_np.shape[0]
                    per = idx_np[0].size
                    sym = codec.y_coder.decode_streams(
                        cache["streams"], idx_np, [per] * nb).reshape(
                            idx_np.shape)
                else:
                    sym = codec._decode_slice(bitstreams["base"][i], idx_np)
                mu_b.append(mu)
                std_b.append(scale)
                if i + 1 < ns0:
                    # fused finish(i) + params(i+1): one dispatch per slice
                    y_hat, buf, mu, scale, idx, msup = codec._p_base_step()(
                        v, codec._h2d_sym(sym), mu, msup, buf, np.int32(i),
                        lm_b, ls_b)
                    idx.copy_to_host_async()
                else:
                    y_hat, buf = codec._p_base_finish()(
                        v, codec._h2d_sym(sym), mu, msup, buf, np.int32(i))
                y_hat_slices.append(y_hat)
            cache["base"] = tuple(y_hat_slices)
            cache["base_params"] = (tuple(mu_b), tuple(std_b))
    base_slices = cache["base"]

    if q_ind == 0:
        x_hat, y_hat_b = codec._p_synth_base()(v, base_slices)
        return {"x_hat": x_hat, "y_hat": y_hat_b, "cache": cache,
                "decode_time": time.time() - t0}

    if "entropy" not in cache:
        if rems and y_checkpoints:
            mu_b, std_b = cache["base_params"]
            mu_s, scale_s, idx_full, msups = (
                codec._p_prog_params_rem_chain(len(y_checkpoints))(
                    v, base_slices, lm, ls,
                    tuple(jnp.asarray(ck) for ck in y_checkpoints),
                    mu_b, std_b))
        else:
            mu_s, scale_s, mask1, idx_full, msups = codec._p_prog_params(
                10.0)(v, base_slices, lm, ls)
        sid = _p_shell_ids(codec, tuple(q_list))(scale_s)
        # packed fetch (same bit widths as the encoder side): 6-bit CDF
        # buckets, 4-bit shell ids; the dense sid stays on device for
        # _p_prog_reconstruct_all (no H2D re-upload)
        pack4, pack6 = _pack_widths(codec, len(q_list))
        idx_fetch = codec._p_pack6()(idx_full) if pack6 else idx_full
        sid_fetch = codec._p_pack4u()(sid) if pack4 else sid
        idx_fetch.copy_to_host_async()
        sid_fetch.copy_to_host_async()
        c = codec.model.dim_chunk
        cache["entropy"] = (
            mu_s, msups,
            _unpack6(np.asarray(jax.device_get(idx_fetch)), c) if pack6
            else np.asarray(jax.device_get(idx_fetch)),
            _unpack4u(np.asarray(jax.device_get(sid_fetch)), c) if pack4
            else np.asarray(jax.device_get(sid_fetch)),
        )
        cache["sid_dev"] = sid
        cache["canvas"] = None
        cache["decoded_upto"] = 0
    mu_s, msups, idx_np, sid_np = cache["entropy"]

    nq = len(q_list)
    b = idx_np.shape[1]

    def _flat(a):
        return np.ascontiguousarray(
            a.transpose(1, 0, 2, 3, 4).reshape(b, -1))

    j0 = cache["decoded_upto"]
    if q_ind > j0:
        if stream:
            # continue every image's stateful decoder through shells
            # [j0, q_ind) in ONE threaded C call that writes each symbol
            # at its ORIGINAL flat position (epic_rans_stream_decode_
            # shell_batch): the stable counting walk replaces the former
            # host argsort + gather + scatter (measured numpy bottleneck
            # on this 1-core host). Out-of-int16 escape symbols come back
            # on an overflow list and are patched after widening.
            if cache.get("flat") is None:
                cache["flat"] = (_flat(idx_np).view(np.uint8),
                                 _flat(sid_np))
                cache["canvas_flat"] = np.zeros(
                    cache["flat"][0].shape, np.int16)
                cache["ovf"] = []
            idx_flat, sid_flat = cache["flat"]
            flat = cache["canvas_flat"]
            n_ovf = codec.y_coder.decode_shell_streams(
                cache["streams"], idx_flat, sid_flat, j0, q_ind, nq, flat)
            if n_ovf:
                cache["ovf"].append(codec.y_coder._last_overflow)
        else:
            if cache.get("pack") is None:
                # shell-sorted segment boundaries from the shared
                # sid-derived permutation (identical to the encoder's)
                order, starts = _shell_order(sid_np, nq)
                cache["pack"] = (order, starts,
                                 _sort_flat(idx_np.astype(np.int32),
                                            order))
                cache["canvas_flat"] = np.zeros(order.shape, np.int8)
                cache["ovf"] = []
            order, starts, idx_sorted = cache["pack"]
            flat = cache["canvas_flat"]

            def _widen_if_needed(sym):
                nonlocal flat
                m = np.abs(sym).max() if sym.size else 0
                if m > 127 and flat.dtype == np.int8:
                    flat = cache["canvas_flat"] = flat.astype(
                        np.int16 if m <= 32000 else np.int32)
                if m > 32000 and flat.dtype == np.int16:
                    flat = cache["canvas_flat"] = flat.astype(np.int32)
                return sym

            datas, seg_idx, seg_len, pos = [], [], [], []
            for j in range(j0, q_ind):
                for bi in range(b):
                    s0, s1 = int(starts[bi, j]), int(starts[bi, j + 1])
                    if s1 > s0:
                        datas.append(bitstreams["progressive"][j][bi])
                        seg_idx.append(idx_sorted[bi, s0:s1])
                        seg_len.append(s1 - s0)
                        pos.append((bi, s0, s1))
            if seg_len:
                sym = _widen_if_needed(codec.y_coder.decode_batch(
                    datas, np.ascontiguousarray(np.concatenate(seg_idx)),
                    seg_len))
                # scatter only the NEW segments into the unsorted flat grid
                # (undecoded elements stay 0 -> reconstruct to the
                # predicted mean, as before)
                off = 0
                for (bi, s0, s1), ln in zip(pos, seg_len):
                    flat[bi, order[bi, s0:s1]] = sym[off:off + ln]
                    off += ln
            flat = cache["canvas_flat"]
        if cache["ovf"]:
            out = flat.astype(np.int32)
            for pos_o, val_o in cache["ovf"]:
                out.reshape(-1)[pos_o] = val_o
        elif flat.dtype == np.int16 and (
                not flat.size or np.abs(flat, dtype=np.int32).max() <= 127):
            # narrow for the H2D upload (the tunnel runs at ~MB/s; int8
            # quarters the decoder's biggest transfer vs int32)
            out = flat.astype(np.int8)
        else:
            out = flat
        s, _, h, w, c = idx_np.shape
        cache["canvas"] = out.reshape(b, s, h, w, c).transpose(
            1, 0, 2, 3, 4)
        cache["decoded_upto"] = q_ind
    canvas = cache["canvas"]

    canvas_dev = _canvas_to_device(codec, cache, canvas)
    x_hat, y_prog = codec._p_prog_reconstruct()(
        v, canvas_dev, mu_s, msups, base_slices)
    return {"x_hat": x_hat, "y_hat": y_prog, "cache": cache,
            "decode_time": time.time() - t0}


def _canvas_to_device(codec: PICCodec, cache: Dict[str, Any],
                      canvas: np.ndarray) -> jnp.ndarray:
    """Upload the decoded-symbol canvas at its information width: signed
    4-bit packed when every symbol fits [-8, 7] (the trained-model common
    case — halves the decoder's biggest H2D transfer vs int8), else the
    narrow int dtype + device widening. The int32 device canvas is cached
    so a following decode-all at the same level reuses it."""
    import os

    key = cache.get("decoded_upto")
    cached = cache.get("canvas_dev")
    if cached is not None and cached[0] == key:
        return cached[1]
    if (os.environ.get("EPIC_PACK", "1") != "0"
            and canvas.dtype == np.int8 and canvas.shape[-1] % 2 == 0
            and (canvas.size == 0
                 or (canvas.max(initial=0) <= 7
                     and canvas.min(initial=0) >= -8))):
        dev = codec._p_unpack4s_widen()(jnp.asarray(_pack4s_np(canvas)))
    elif canvas.dtype != np.int32:
        dev = codec._p_widen()(jnp.asarray(canvas))
    else:
        dev = jnp.asarray(canvas)
    cache["canvas_dev"] = (key, dev)
    return dev


def progressive_decode_all(codec: PICCodec, bitstreams: Dict[str, Any],
                           rems: bool = False,
                           y_checkpoints=None) -> Dict[str, Any]:
    """Decode the WHOLE quality ladder at once: one batched host rANS call
    for every shell, one device program reconstructing all levels (levels
    folded into the batch axis). Returns x_hat [1+Q, B, H, W, 3] (base
    first) — the fast path for full RD sweeps; use progressive_decode for
    incremental/streaming decoding."""
    v = codec.variables
    q_list = bitstreams["q_list"]
    nq = len(q_list)
    t0 = time.time()

    # reuse the incremental machinery for hyper + base + entropy caches and
    # to fill the full canvas in one batched call
    cache: Dict[str, Any] = {}
    full = progressive_decode(codec, bitstreams, nq, cache,
                              rems=rems, y_checkpoints=y_checkpoints)
    base_slices = cache["base"]
    mu_s, msups, idx_np, sid_np = cache["entropy"]
    x_base, _ = codec._p_synth_base()(v, base_slices)

    sym_s = _canvas_to_device(codec, cache, cache["canvas"])
    # sid stays a device handle from the entropy stage (no 2 MB re-upload)
    sid_dev = cache.get("sid_dev")
    if sid_dev is None:
        sid_dev = jnp.asarray(sid_np)
    x_prog, y_prog = codec._p_prog_reconstruct_all(nq)(
        v, sym_s, sid_dev, mu_s, msups, base_slices)
    x_hat = jnp.concatenate([x_base[None], x_prog], axis=0)
    return {"x_hat": x_hat, "y_prog_top": full["y_hat"],
            "decode_time": time.time() - t0}
