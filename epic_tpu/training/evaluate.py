"""Real-codec evaluation: actual rANS encode/decode over a file list.

Reference behavior: src/training/step.py:259-358 (compress_with_ac) — per
image x per quality: compress, decompress, unpad, PSNR + MS-SSIM(dB),
decode wall-time; bpp counted from real string lengths.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..codec.pic_codec import PICCodec
from ..utils.metrics import compute_msssim, compute_psnr, msssim_db
from ..utils.padding import pad_image, unpad_image


def _stream_bits(out: Dict[str, Any]) -> float:
    y_strings, z_strings = out["strings"]
    y_bits = sum(len(s) for sl in y_strings for s in sl) * 8.0
    z_bits = sum(len(s) for s in z_strings) * 8.0
    return y_bits + z_bits


def rd_sweep(codec: PICCodec, images: Sequence[np.ndarray],
             q_list: Sequence[float] = (0.01, 0.05, 0.1, 0.25, 0.5, 0.6,
                                        0.7, 0.8, 0.9, 1, 2, 3, 4, 4.5, 10),
             check_levels: Optional[Sequence[float]] = None
             ) -> Dict[str, Any]:
    """Full progressive RD curve per image in ONE encode: transforms and
    entropy parameters are computed once and every quality level is a delta
    shell (the reference's demo path, demo.py:126-153). Returns per-level
    cumulative bpp / PSNR / incremental decode time, averaged over images.

    This is the throughput-defining sweep (BASELINE.md: 'full Kodak RD
    sweep'): versus per-level random-access coding it saves ~|q_list|x the
    transform work; all levels reconstruct in one device program
    (progressive_decode_all).
    """
    from ..codec.progressive import progressive_decode_all, \
        progressive_encode

    nl = len(q_list) + 1  # + base level
    bpp = np.zeros(nl)
    psnr = np.zeros(nl)
    mssim = np.zeros(nl)
    dec_time_all = 0.0
    count = 0
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        xp, unpad = pad_image(x)
        npix = x.shape[0] * x.shape[1] * x.shape[2]

        y_checkpoints = None
        if check_levels:
            y_checkpoints, prev = [], None
            for cl in check_levels:
                prev = codec.extract_checkpoint(xp, cl, checkpoint_rep=prev)
                y_checkpoints.append(prev)

        bs, bits = progressive_encode(codec, xp, q_list,
                                      rems=bool(y_checkpoints),
                                      y_checkpoints=y_checkpoints)
        out = progressive_decode_all(codec, bs, rems=bool(y_checkpoints),
                                     y_checkpoints=y_checkpoints)
        cum = bits[0] + bits[1]
        for j in range(nl):
            if j > 0:
                cum = bits[0] + bits[1] + sum(bits[2][:j])
            x_hat = unpad_image(out["x_hat"][j], unpad)
            bpp[j] += cum / npix
            psnr[j] += compute_psnr(x, x_hat)
            if x.shape[1] >= 176 and x.shape[2] >= 176:
                # reference reports MS-SSIM dB per level (step.py:323-324)
                mssim[j] += msssim_db(compute_msssim(x, x_hat))
        dec_time_all += out["decode_time"]
        count += 1
    count = max(count, 1)
    return {
        "q_list": [0] + list(q_list),
        "bpp": (bpp / count).tolist(),
        "psnr": (psnr / count).tolist(),
        "ms_ssim_db": (mssim / count).tolist(),
        # whole-ladder decode wall per image (the all-levels fast path
        # decodes every level in one batched program, so there is no
        # honest per-level split here; bench.py's incremental path
        # measures true per-level latency)
        "decode_all_time": dec_time_all / count,
    }


def compress_with_ac(codec: PICCodec, images: Sequence[np.ndarray],
                     pr_list: Sequence[float] = (0, 0.5, 1, 2, 5, 10),
                     check_levels: Optional[Sequence[float]] = None,
                     compute_ms_ssim: bool = True) -> Dict[str, Any]:
    """images: NHWC float arrays in [0,1] (unpadded). Returns per-level
    averaged bpp / psnr / ms-ssim(dB) / decode time."""
    nl = len(pr_list)
    bpp = np.zeros(nl)
    psnr = np.zeros(nl)
    mssim = np.zeros(nl)
    dec_time = np.zeros(nl)
    count = 0
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        xp, unpad = pad_image(x)
        npix = x.shape[0] * x.shape[1] * x.shape[2]

        checkpoints = None
        if check_levels:
            checkpoints = []
            prev = None
            for cl in check_levels:
                prev = codec.extract_checkpoint(xp, cl, checkpoint_rep=prev)
                checkpoints.append(prev)

        for k, q in enumerate(pr_list):
            ck = None
            if checkpoints is not None and q > check_levels[0]:
                # the checkpoint bracketing this quality from below
                ck_idx = 0
                for j, cl in enumerate(check_levels):
                    if q > cl:
                        ck_idx = j
                ck = checkpoints[ck_idx]
            out = codec.compress(xp, quality=q, checkpoint_rep=ck)
            t0 = time.time()
            dec = codec.decompress(out, checkpoint_rep=ck)
            np.asarray(dec["x_hat"])  # force materialization
            dec_time[k] += time.time() - t0
            x_hat = unpad_image(dec["x_hat"], unpad)
            bpp[k] += _stream_bits(out) / npix
            psnr[k] += compute_psnr(x, x_hat)
            if compute_ms_ssim and x.shape[1] >= 176 and x.shape[2] >= 176:
                mssim[k] += msssim_db(compute_msssim(x, x_hat))
        count += 1
    count = max(count, 1)
    return {
        "pr_list": list(pr_list),
        "bpp": (bpp / count).tolist(),
        "psnr": (psnr / count).tolist(),
        "ms_ssim_db": (mssim / count).tolist(),
        "decode_time": (dec_time / count).tolist(),
    }
