"""Host-orchestrated real codec for VarianceMaskingPIC.

Reference behavior: pic.py compress (671-833) / decompress (838-967), but
with the TPU-native device<->host choreography from SURVEY.md §2.4/§3E:

* The encoder SIMULATES the decoder: every entropy-parameter computation is
  a jitted program shared verbatim between compress and decompress, so the
  decoder-side variance masks and CDF indexes are bitwise identical to the
  encoder's (the mask is never transmitted).
* Symbols/indexes cross to the host as packed int32 numpy buffers — one
  transfer per stage, batched across slices x batch items — and the C++
  rANS coder runs all messages on parallel host threads. The reference
  instead marshals Python lists per slice per image
  (entropy_models.py:231-239).
* Only the 10 base slices are inherently interleaved (decoded content feeds
  the next slice's parameters). The progressive stage is quality-independent
  given the base latent (all_scalable), so its parameters are computed in
  ONE device program, decoded in ONE batched host call, and reconstructed in
  ONE device program.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from ..entropy.bottleneck import EntropyBottleneck, build_bottleneck_cdf_tables
from ..entropy.coder import RansCoder
from ..entropy.gaussian import GaussianConditional, build_indexes
from ..models.pic import VarianceMaskingPIC
from ..ops import variance_mask


def _as_chain(slices):
    """Normalize a per-slice collection for jitted-program arguments:
    stacked [S,...] device arrays (the fused io chain's outputs) pass
    through unchanged; python lists become tuples. Inside jit both index
    identically per slice, so downstream program code is shared."""
    return slices if isinstance(slices, jnp.ndarray) else tuple(slices)


class PICCodec:
    """Binds (model, variables) to entropy-coding state + jitted programs."""

    def __init__(self, model: VarianceMaskingPIC, variables,
                 nthreads: int | None = None,
                 io_chain: Optional[bool] = None):
        self.model = model
        self.variables = variables
        self.gaussian = GaussianConditional().update()
        self.y_coder = self.gaussian.coder(nthreads)
        self._scale_table = jnp.asarray(self.gaussian.scale_table)
        self.update()
        self._jit_cache: Dict[Any, Any] = {}
        # Base-chain program family:
        #   "io"          — ONE shared scan program both directions, host
        #                   rANS behind ordered io_callbacks (bitwise-safe
        #                   by construction). Default where host callbacks
        #                   work (CPU / standard runtimes).
        #   "scan"        — fused scan ENCODER (one launch, zero host
        #                   round trips) + per-slice interleaved DECODER.
        #                   Default on TPU: the axon-tunneled runtime
        #                   hangs compiling io_callback custom calls
        #                   (tools/probe_io_callback.py); equality of the
        #                   two executables is the scan==unrolled property
        #                   (tests/test_scan_chains.py) and is asserted on
        #                   real content via verify_base_chain (bench
        #                   warmup).
        #   "interleaved" — the per-slice fused-step programs everywhere
        #                   (r4 behavior; also the int16-overflow
        #                   fallback).
        if io_chain is not None:
            chain_mode = "io" if io_chain else "interleaved"
        else:
            chain_mode = os.environ.get("EPIC_CHAIN_MODE", "").lower()
            if chain_mode not in ("io", "scan", "interleaved"):
                # "scan" on EVERY backend: the io mode is correct and
                # bitwise-tested, but the host-callback runtime is not
                # robust in this environment — the axon TPU hangs at
                # compile, and the CPU backend deadlocked (futex, all
                # threads) mid-eval at flagship scale after completing
                # smaller batches. No production path depends on host
                # callbacks; "io" remains available explicitly.
                chain_mode = "scan"
        self.chain_mode = chain_mode
        # per-call host state for the io_callback base chain: dispatch is
        # async, so callbacks for call N can fire after call N+1 was
        # dispatched — a global mode flag would race; a call id threaded
        # through the program as a runtime operand keys the right state
        self._io_calls: Dict[int, Dict[str, Any]] = {}
        self._io_next = 1
        self._io_lock = threading.Lock()
        self._jit_lock = threading.Lock()

    def update(self, force: bool = False):
        """(Re)build entropy tables from the current variables
        (reference: pic.py:230-237 + base.py:41-60)."""
        eb = EntropyBottleneck(self.model.n)
        zvars = {"params": self.variables["params"]["entropy_bottleneck"]}
        self.z_tables, self.z_medians = build_bottleneck_cdf_tables(eb, zvars)
        self.z_coder = RansCoder(self.z_tables.quantized_cdf,
                                 self.z_tables.cdf_length,
                                 self.z_tables.offset)
        self._z_med_dev = jnp.asarray(self.z_medians)

    # ------------------------------------------------------------------
    # jitted programs (all shared between compress and decompress)
    # ------------------------------------------------------------------

    def _prog(self, key, make):
        # double-checked under a lock: concurrent sweep threads
        # (codec.pipeline) may request the same program on a cold cache
        if key not in self._jit_cache:
            with self._jit_lock:
                if key not in self._jit_cache:
                    self._jit_cache[key] = jax.jit(make())
        return self._jit_cache[key]

    def _p_front(self):
        def make():
            def f(v, x, z_med):
                y = self.model.apply(v, x,
                                     method=VarianceMaskingPIC.latent)
                z = self.model.apply(v, y,
                                     method=VarianceMaskingPIC.hyper_analysis)
                z_sym = jnp.round(z - z_med).astype(jnp.int32)
                # base channel block, pre-sliced for the fused base chain
                # (a host-side y[..., :d0] would be its own tiny launch)
                return y, y[..., :self.model.division[0]], z_sym
            return f
        return self._prog("front", make)

    def _p_zhat_hyper(self, base_only: bool):
        def make():
            method = (VarianceMaskingPIC.hyper_synthesis_base if base_only
                      else VarianceMaskingPIC.hyper_synthesis)

            def f(v, z_sym, z_med):
                z_hat = z_sym.astype(jnp.float32) + z_med
                lm, ls = self.model.apply(v, z_hat, method=method)
                return lm, ls
            return f
        return self._prog(("hyper", base_only), make)

    def _p_base_params(self):
        """ONE program for every base slice: the slice index is a traced
        scalar and the support is a fixed-size device buffer (slot j =
        decoded slice j), so the codec's interleaved base chain compiles
        once instead of ns0 times — the scan treatment (_base_chain_scan)
        applied to the codec (VERDICT r2 item 4)."""
        def make():
            def f(v, lm, ls, buf, i):
                mu, scale, msup = self.model.apply(
                    v, lm, ls, buf, i,
                    method=VarianceMaskingPIC.base_slice_params_dyn)
                # 64 scale buckets -> int8: device->host transfers over the
                # axon tunnel run at ~MB/s, so every byte counts
                idx = build_indexes(scale, self._scale_table,
                                    self.model.scale_bound).astype(jnp.int8)
                return mu, scale, idx, msup
            return f
        return self._prog("base_params_dyn", make)

    def _base_buf0(self, lm_b) -> jnp.ndarray:
        n = max(self.model._n_slots_base, 1)
        b, h, w = lm_b.shape[0], lm_b.shape[1], lm_b.shape[2]
        return jnp.zeros((n, b, h, w, self.model.dim_chunk), jnp.float32)

    def _p_base_sym(self):
        def make():
            def f(y_i, mu):
                sym = jnp.round(y_i - mu)
                # int8 + widening flags: the tunnel D2H runs at ~MB/s, so
                # symbols cross as 1 byte when they fit (they almost
                # always do for a trained codec); flag8 widens the fetch
                # to int16, flag16 to int32 (pathological only)
                flag8 = (jnp.abs(sym) > 127).any()
                flag16 = (jnp.abs(sym) > 32000).any()
                return (sym.astype(jnp.int8), sym.astype(jnp.int16),
                        sym.astype(jnp.int32), flag8, flag16)
            return f
        return self._prog("base_sym", make)

    def _p_base_step(self):
        """Decoder base-chain step: finish slice i (dequant + LRP +
        support-buffer update) AND produce slice i+1's entropy params +
        CDF indexes in ONE dispatch. The interleaved decode chain is
        latency-bound on the tunnel (dispatch + blocking idx fetch per
        slice); fusing halves the program round trips — the level-0
        incremental-decode outlier of BENCH_r03 (VERDICT r3 weak #4)."""
        def make():
            def f(v, sym, mu, msup, buf, i, lm_b, ls_b):
                y_hat = sym.astype(jnp.float32) + mu
                y_hat, buf = self.model.apply(
                    v, y_hat, msup, buf, i,
                    method=VarianceMaskingPIC.finish_base_slice_dyn)
                mu2, scale2, msup2 = self.model.apply(
                    v, lm_b, ls_b, buf, i + 1,
                    method=VarianceMaskingPIC.base_slice_params_dyn)
                idx2 = build_indexes(scale2, self._scale_table,
                                     self.model.scale_bound).astype(jnp.int8)
                return y_hat, buf, mu2, scale2, idx2, msup2
            return f
        return self._prog("base_step_dyn", make)

    def _p_base_finish(self):
        def make():
            def f(v, sym, mu, msup, buf, i):
                y_hat = sym.astype(jnp.float32) + mu
                return self.model.apply(
                    v, y_hat, msup, buf, i,
                    method=VarianceMaskingPIC.finish_base_slice_dyn)
            return f
        return self._prog("base_finish_dyn", make)

    def _p_base_chain_io(self):
        """The WHOLE interleaved base chain as ONE device program: a
        lax.scan over slices whose per-slice host entropy coding is an
        ordered `jax.experimental.io_callback`.

        Shared VERBATIM by compress / progressive encode (call id 0 ==
        'simulate': the callback returns the encoder's own symbols
        unchanged), decompress / progressive decode (a registered call id:
        the callback rANS-decodes slice i from the registered strings or
        stream decoders), and extract_checkpoint_device (id 0). One
        executable on every side keeps the entropy parameters bitwise
        identical by construction — the invariant the per-slice program
        structure existed to protect — while replacing ~3*ns0 tiny
        launches (~30 ms each through the tunnel, artifacts/
        profile_r4.json) with a single one.

        Inputs: y_base [B,h,w,ns0*c] (the decoder passes lm_b — same
        shape/dtype; its values only feed the encoder-side symbols, which
        'dec' callbacks ignore). Returns stacked
        (y_hat_s, mu_s, scale_s, idx_s int8, sym8, sym16, flag8, ovf):
        flag8/ovf report the encoder-side symbol range (int8 fetch width /
        int16 overflow -> fall back to the interleaved path); both are
        garbage when y_base is a dummy.
        Reference behavior: pic.py:862-903 (per-slice interleave).
        """
        def make():
            model = self.model
            ns0, c = model.ns0, model.dim_chunk

            def f(v, cid, y_base, lm_b, ls_b):
                n = max(model._n_slots_base, 1)
                b, h, w = lm_b.shape[0], lm_b.shape[1], lm_b.shape[2]
                buf0 = jnp.zeros((n, b, h, w, c), jnp.float32)
                y_s = jnp.moveaxis(
                    y_base.reshape(b, h, w, ns0, c), 3, 0)

                def body(buf, xs):
                    i, y_i = xs
                    mu, scale, msup = model.apply(
                        v, lm_b, ls_b, buf, i,
                        method=VarianceMaskingPIC.base_slice_params_dyn)
                    idx = build_indexes(scale, self._scale_table,
                                        model.scale_bound).astype(jnp.int8)
                    sym_enc = jnp.round(y_i - mu)
                    ovf = (jnp.abs(sym_enc) > 32000).any()
                    flag8 = (jnp.abs(sym_enc) > 127).any()
                    sym = io_callback(
                        self._base_io_cb,
                        jax.ShapeDtypeStruct(y_i.shape, jnp.int16),
                        cid, i, idx, sym_enc.astype(jnp.int16),
                        ordered=True)
                    y_hat = sym.astype(jnp.float32) + mu
                    y_hat, buf = model.apply(
                        v, y_hat, msup, buf, i,
                        method=VarianceMaskingPIC.finish_base_slice_dyn)
                    return buf, (y_hat, mu, scale, idx, sym, flag8, ovf)

                idx_i = jnp.arange(ns0, dtype=jnp.int32)
                _, (y_hat_s, mu_s, scale_s, idx_s, sym_s, f8, ovf) = \
                    jax.lax.scan(body, buf0, (idx_i, y_s))
                return (y_hat_s, mu_s, scale_s, idx_s,
                        sym_s.astype(jnp.int8), sym_s,
                        f8.any(), ovf.any())
            return f
        return self._prog("base_chain_io", make)

    def _p_base_chain_scan(self):
        """ENCODER-ONLY fused base chain: the io chain's exact scan body
        with the callback replaced by the encoder's own symbols — one
        launch, ZERO host round trips (the encoder knows every symbol).

        Used when host callbacks are unavailable (the axon-tunneled TPU
        runtime hangs COMPILING any program containing an io_callback
        custom call — measured, tools/probe_io_callback.py): the decoder
        then runs the per-slice interleaved programs, and the encoder's
        scan must match them BITWISE. That equality is the scan==unrolled
        property already relied on by the model chains
        (tests/test_scan_chains.py); verify_base_chain() asserts it at
        runtime on real content (bench warmup) as a guard.
        Outputs match _p_base_chain_io."""
        def make():
            model = self.model
            ns0, c = model.ns0, model.dim_chunk

            def f(v, y_base, lm_b, ls_b):
                n = max(model._n_slots_base, 1)
                b, h, w = lm_b.shape[0], lm_b.shape[1], lm_b.shape[2]
                buf0 = jnp.zeros((n, b, h, w, c), jnp.float32)
                y_s = jnp.moveaxis(
                    y_base.reshape(b, h, w, ns0, c), 3, 0)

                def body(buf, xs):
                    i, y_i = xs
                    mu, scale, msup = model.apply(
                        v, lm_b, ls_b, buf, i,
                        method=VarianceMaskingPIC.base_slice_params_dyn)
                    idx = build_indexes(scale, self._scale_table,
                                        model.scale_bound).astype(jnp.int8)
                    sym_enc = jnp.round(y_i - mu)
                    ovf = (jnp.abs(sym_enc) > 32000).any()
                    flag8 = (jnp.abs(sym_enc) > 127).any()
                    sym = sym_enc.astype(jnp.int16)
                    y_hat = sym.astype(jnp.float32) + mu
                    y_hat, buf = model.apply(
                        v, y_hat, msup, buf, i,
                        method=VarianceMaskingPIC.finish_base_slice_dyn)
                    return buf, (y_hat, mu, scale, idx, sym, flag8, ovf)

                idx_i = jnp.arange(ns0, dtype=jnp.int32)
                _, (y_hat_s, mu_s, scale_s, idx_s, sym_s, f8, ovf) = \
                    jax.lax.scan(body, buf0, (idx_i, y_s))
                return (y_hat_s, mu_s, scale_s, idx_s,
                        sym_s.astype(jnp.int8), sym_s,
                        f8.any(), ovf.any())
            return f
        return self._prog("base_chain_scan", make)

    def verify_base_chain(self, x) -> bool:
        """Assert the scan-encoder chain matches the interleaved programs
        BITWISE on real content (params, CDF indexes, symbols, finished
        slices) — the guard for chain_mode='scan', where the encoder's
        scan and the decoder's interleave are different executables.
        Raises on mismatch; returns True."""
        v = self.variables
        x = jnp.asarray(x)
        y, y_base, z_sym = self._p_front()(v, x, self._z_med_dev)
        lm, ls = self._p_zhat_hyper(False)(v, z_sym, self._z_med_dev)
        lm_b = lm[..., :self.model.division[0]]
        ls_b = ls[..., :self.model.division[0]]
        (y_hat_s, mu_s, scale_s, idx_s, s8, s16, f8, ovf) = \
            self._p_base_chain_scan()(v, y_base, lm_b, ls_b)
        ns0, c = self.model.ns0, self.model.dim_chunk
        buf = self._base_buf0(lm_b)
        mu, scale, idx, msup = self._p_base_params()(
            v, lm_b, ls_b, buf, np.int32(0))
        for i in range(ns0):
            y_i = y[..., i * c:(i + 1) * c]
            _, _, s32_i, _, _ = self._p_base_sym()(y_i, mu)
            np.testing.assert_array_equal(
                np.asarray(mu_s[i], np.float32), np.asarray(mu, np.float32),
                err_msg=f"mu slice {i}")
            np.testing.assert_array_equal(
                np.asarray(idx_s[i]), np.asarray(idx),
                err_msg=f"idx slice {i}")
            np.testing.assert_array_equal(
                np.asarray(s16[i], np.int32), np.asarray(s32_i, np.int32),
                err_msg=f"sym slice {i}")
            if i + 1 < ns0:
                y_hat, buf, mu, scale, idx, msup = self._p_base_step()(
                    v, s32_i, mu, msup, buf, np.int32(i), lm_b, ls_b)
            else:
                y_hat, buf = self._p_base_finish()(v, s32_i, mu, msup, buf,
                                                   np.int32(i))
            np.testing.assert_array_equal(
                np.asarray(y_hat_s[i], np.float32),
                np.asarray(y_hat, np.float32),
                err_msg=f"y_hat slice {i}")
        return True

    def _base_io_cb(self, cid, i, idx, sym16) -> np.ndarray:
        """Host side of _p_base_chain_io. cid 0 = simulate (encoder /
        device-extract): return the encoder's symbols unchanged. Any other
        cid keys a registered decode state: rANS-decode slice i with the
        callback-provided CDF indexes, from either per-slice strings or
        the stateful single-stream decoders."""
        cid = int(cid)
        if cid == 0:
            return np.asarray(sym16)
        st = self._io_calls[cid]
        idx_np = np.asarray(idx).astype(np.int32)
        if st.get("streams") is not None:
            nb = idx_np.shape[0]
            per = idx_np[0].size
            sym = self.y_coder.decode_streams(
                st["streams"], idx_np, [per] * nb).reshape(idx_np.shape)
        else:
            sym = self._decode_slice(st["strings"][int(i)], idx_np)
        st["n_left"] -= 1
        if st["n_left"] <= 0:
            del self._io_calls[cid]
        return sym.astype(np.int16)

    def _base_chain_call(self, v, y_base, lm_b, ls_b,
                         strings=None, streams=None):
        """Dispatch the fused base chain. Without strings/streams: simulate
        mode (id 0). With them: register a decode state under a fresh call
        id (freed by the final slice's callback)."""
        if strings is None and streams is None:
            cid = 0
        else:
            with self._io_lock:
                cid = self._io_next
                self._io_next += 1
            self._io_calls[cid] = {"strings": strings, "streams": streams,
                                   "n_left": self.model.ns0}
        return self._p_base_chain_io()(v, np.int32(cid), y_base, lm_b, ls_b)

    @property
    def io_chain(self) -> bool:
        """True when the shared io-callback chain codes streams (the
        decoder-routing bitstream flag mirrors this)."""
        return self.chain_mode == "io"

    def _encode_base_chain(self, v, y_base, lm_b, ls_b):
        """Fused encoder-side base chain per chain_mode, or None when the
        per-slice interleave should run. Output layout matches
        _p_base_chain_io."""
        if self.chain_mode == "io":
            return self._base_chain_call(v, y_base, lm_b, ls_b)
        if self.chain_mode == "scan":
            return self._p_base_chain_scan()(v, y_base, lm_b, ls_b)
        return None

    def _p_stack_chan(self):
        """[S,B,h,w,c] stacked slices -> [B,h,w,S*c] channel concat (the
        host-level jnp.concatenate over a slice list, as one program)."""
        def make():
            def f(a):
                s, b, h, w, c = a.shape
                return jnp.moveaxis(a, 0, 3).reshape(b, h, w, s * c)
            return f
        return self._prog("stack_chan", make)

    def _p_synth_base(self):
        def make():
            def f(v, slices):
                y = jnp.concatenate(list(slices), axis=-1)
                x = self.model.apply(
                    v, y, method=VarianceMaskingPIC.synthesize_base)
                return jnp.clip(x, 0.0, 1.0), y
            return f
        return self._prog("synth_base", make)

    def _p_prog_params(self, quality_key, with_ckpt: bool = False):
        """Progressive entropy params + masked indexes at one quality.
        quality_key: float (static). Returns everything decode needs before
        touching the bitstream. With a checkpoint latent (REM models), the
        per-slice (mu, scale) used for masking/coding are REM-refined while
        the support chain stays unrefined (rem_pic.py:560-581)."""
        def make():
            q = quality_key

            def f(v, y_hat_base_slices, lm, ls, ckpt=None,
                  mu_b=None, std_b=None):
                # the model's scan chain (support: UNREFINED mu_total /
                # scale, all_scalable semantics) — one lax.scan body
                # instead of ns1-ns0 unrolled slices, same bitwise outputs
                # (tests/test_scan_chains.py); cuts the codec's largest
                # compile unit ~10x (VERDICT r2 cold-start item)
                mu_s, _, scale_s, msups = self.model.apply(
                    v, y_hat_base_slices, lm, ls,
                    method=type(self.model)._prog_param_chain)
                if with_ckpt:
                    # one stacked bank call refines every slice (valid
                    # because the support above is unrefined,
                    # rem_pic.py:560-581); masking/coding use the refined
                    # params
                    mu_s, scale_s = self.model.apply(
                        v, q, mu_s, scale_s, ckpt,
                        jnp.stack(list(mu_b)), jnp.stack(list(std_b)),
                        method=type(self.model)._refine_prog_params_all)
                mask = jnp.stack([
                    variance_mask(s, q, self.model.mask_policy)
                    for s in scale_s])
                idx = build_indexes(scale_s * mask, self._scale_table,
                                    self.model.scale_bound).astype(jnp.int8)
                return mu_s, scale_s, mask, idx, tuple(msups)
            return f
        return self._prog(("prog_params", quality_key, with_ckpt), make)

    def _p_prog_params_rem_chain(self, n_checkpoints: int):
        """Progressive params with CHAINED REM refinement for the
        single-bitstream codec: every checkpoint bank refines (mu, scale)
        in sequence (reference: functions_encode.py:127-148 /
        functions_decode.py:135-151). Unmasked indexes (q=10 ladder coding).
        Note: in this path the reference chains the support off the
        REFINED params on both sides (consistent enc/dec), which we match.
        """
        def make():
            def f(v, y_hat_base_slices, lm, ls, ckpts, mu_b, std_b):
                model = self.model
                if getattr(model, "scan_chains", False):
                    # one scan body (+ n_checkpoints-1 bank applies)
                    # instead of (ns1-ns0) x n_checkpoints unrolled module
                    # applies — bitwise equal (tests/test_scan_chains.py)
                    mu_s, scale_s, msups = model.apply(
                        v, y_hat_base_slices, lm, ls, ckpts, mu_b, std_b,
                        method=type(model)._rem_chain_params)
                    idx = build_indexes(scale_s, self._scale_table,
                                        model.scale_bound).astype(jnp.int8)
                    return mu_s, scale_s, idx, tuple(msups)
                check_levels = list(model.check_levels)
                mus, muts, scales, msups = [], [], [], []
                lm_e = lm[..., model.division[0]:]
                ls_e = ls[..., model.division[0]:]
                for i in range(model.ns1 - model.ns0):
                    mu, mut, scale, msup = model.apply(
                        v, lm_e, ls_e, y_hat_base_slices[i], muts, scales, i,
                        method=VarianceMaskingPIC.prog_slice_params)
                    for j in range(n_checkpoints):
                        q_j = check_levels[j]
                        mu, scale = model.apply(
                            v, i, q_j, mu, scale, ckpts[j], mu_b[i],
                            std_b[i],
                            method=type(model)._refine_prog_params)
                    muts.append(mut)
                    scales.append(scale)
                    mus.append(mu)
                    msups.append(msup)
                mu_s = jnp.stack(mus)
                scale_s = jnp.stack(scales)
                idx = build_indexes(scale_s, self._scale_table,
                                    self.model.scale_bound).astype(jnp.int8)
                return mu_s, scale_s, idx, tuple(msups)
            return f
        return self._prog(("prog_params_rem_chain", n_checkpoints), make)

    def _p_prog_sym(self):
        def make():
            def f(y, mu_s, mask):
                # residual slices [S,B,h,w,c]
                ns0, c = self.model.ns0, self.model.dim_chunk
                r = []
                for i in range(self.model.ns1 - self.model.ns0):
                    r_i = y[..., (ns0 + i) * c:(ns0 + i + 1) * c]
                    if self.model.delta_encode:
                        r_i = r_i - y[..., i * c:(i + 1) * c]
                    r.append(r_i)
                r = jnp.stack(r)
                sym = jnp.round((r - mu_s) * mask)
                flag8 = (jnp.abs(sym) > 127).any()
                flag16 = (jnp.abs(sym) > 32000).any()
                return (sym.astype(jnp.int8), sym.astype(jnp.int16),
                        sym.astype(jnp.int32), flag8, flag16)
            return f
        return self._prog("prog_sym", make)

    def _get_sym(self, sym8, sym16, sym32, flag8, flag16) -> np.ndarray:
        """Fetch symbols over the slow tunnel at the narrowest width that
        holds them (int8 in practice; int16/int32 on the widening flags).
        Returns the NARROW dtype — the C entropy layer reads int8/16/32
        directly, and the batched encoders convert when needed."""
        f8, f16 = jax.device_get((flag8, flag16))
        if bool(f16):
            return np.asarray(jax.device_get(sym32), np.int32)
        if bool(f8):
            return np.asarray(jax.device_get(sym16))
        return np.asarray(jax.device_get(sym8))

    def _p_widen(self):
        """Exact int->int32 widening as its own tiny device program, so
        narrow H2D uploads NEVER change the dtype signature of the shared
        enc/dec programs (a different input dtype would compile a
        different program instance, and different XLA fusion could drift
        entropy parameters by ulps — silent bitstream desync)."""
        def make():
            def f(s):
                return s.astype(jnp.int32)
            return f
        return self._prog("widen_i32", make)

    # ---- tunnel bit-packing: the measured link moves ~5 MB/s and the
    # sweep's D2H is five dense int8 buffers (~10 MB at B=4), so every
    # buffer is packed on device to its information width and unpacked on
    # the host (numpy, epic_tpu/codec/progressive.py): shell ids are
    # 4-bit (<=16 levels), CDF indexes 6-bit (64-entry scale table),
    # progressive symbols 4-bit with an overflow flag. Pure bit moves —
    # bitwise-lossless round trips (tests/test_packing.py). ----

    def _p_pack4u(self):
        """uint4 pack along the last axis: int8 values in [0, 15],
        [..., c] -> uint8 [..., c//2] (lo nibble = even index)."""
        def make():
            def f(a):
                u = a.astype(jnp.uint8)
                return u[..., 0::2] | (u[..., 1::2] << 4)
            return f
        return self._prog("pack4u", make)

    def _p_pack4_sym(self):
        """Signed 4-bit symbol pack: values biased +8 into [0, 15]; the
        flag reports any value outside [-8, 7] (host then falls back to
        the int8/int16/int32 widening fetch)."""
        def make():
            def f(a):
                flag = ((a > 7) | (a < -8)).any()
                u = (a.astype(jnp.int16) + 8).astype(jnp.uint8)
                return u[..., 0::2] | (u[..., 1::2] << 4), flag
            return f
        return self._prog("pack4sym", make)

    def _p_pack6(self):
        """6-bit pack: int8 values in [0, 63], [..., c] (c % 4 == 0) ->
        uint8 [..., 3c//4] (4 values into 3 bytes, little-endian bits)."""
        def make():
            def f(a):
                u = a.astype(jnp.uint8).reshape(
                    a.shape[:-1] + (a.shape[-1] // 4, 4))
                a0, b0, c0, d0 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
                o = jnp.stack([a0 | ((b0 & 3) << 6),
                               (b0 >> 2) | ((c0 & 15) << 4),
                               (c0 >> 4) | (d0 << 2)], axis=-1)
                return o.reshape(a.shape[:-1] + (3 * a.shape[-1] // 4,))
            return f
        return self._prog("pack6", make)

    def _p_unpack4s_widen(self):
        """Device-side inverse of the host's signed-4-bit canvas pack
        (progressive._pack4s_np): uint8 [..., c//2] -> int32 [..., c],
        fused with the int32 widening of _p_widen."""
        def make():
            def f(p):
                lo = (p & 15).astype(jnp.int32) - 8
                hi = (p >> 4).astype(jnp.int32) - 8
                return jnp.stack([lo, hi], axis=-1).reshape(
                    p.shape[:-1] + (2 * p.shape[-1],))
            return f
        return self._prog("unpack4s_widen", make)

    def _h2d_sym(self, sym: np.ndarray) -> jnp.ndarray:
        """Upload decoded symbols at the narrowest safe width (the tunnel
        H2D is as slow as D2H; int8 cuts the decoder's biggest upload 4x),
        then widen to int32 ON DEVICE so downstream programs see exactly
        the encoder-side dtypes (see _p_widen)."""
        m = np.abs(sym).max(initial=0)
        if m <= 127:
            return self._p_widen()(jnp.asarray(sym.astype(np.int8)))
        if m <= 32000:
            return self._p_widen()(jnp.asarray(sym.astype(np.int16)))
        return jnp.asarray(sym)

    def _p_prog_reconstruct_all(self, n_levels: int):
        """Reconstruct ALL quality levels of a progressive stream in one
        device program: level l's latent keeps the decoded symbols whose
        shell id < l (0 = base only). Levels fold into the batch axis for
        the LRP heads and g_s — one conv pass for the whole RD ladder."""
        def make():
            L = n_levels  # prog levels 1..Q (base-only uses g_s[0])

            def f(v, sym_s, sid, mu_s, msups, y_hat_base_slices):
                lvl = jnp.arange(1, L + 1, dtype=jnp.int32)
                keep = (sid[None].astype(jnp.int32)
                        < lvl.reshape(-1, 1, 1, 1, 1, 1))  # [L,S,B,h,w,c]
                sym_l = sym_s[None] * keep
                b = sym_s.shape[1]
                slices = []
                for i in range(self.model.ns1 - self.model.ns0):
                    y_hat = sym_l[:, i].astype(jnp.float32) + mu_s[i][None]
                    flat = y_hat.reshape((L * b,) + y_hat.shape[2:])
                    msup_rep = jnp.broadcast_to(
                        msups[i][None], (L,) + msups[i].shape
                    ).reshape((L * b,) + msups[i].shape[1:])
                    base_rep = jnp.broadcast_to(
                        y_hat_base_slices[i][None],
                        (L,) + y_hat_base_slices[i].shape
                    ).reshape((L * b,) + y_hat_base_slices[i].shape[1:])
                    flat = self.model.apply(
                        v, flat, msup_rep, base_rep, i,
                        method=VarianceMaskingPIC.finish_prog_slice)
                    slices.append(flat)
                y_prog = jnp.concatenate(slices, axis=-1)
                x = self.model.apply(
                    v, y_prog, method=VarianceMaskingPIC.synthesize_prog)
                x = jnp.clip(x, 0.0, 1.0)
                return (x.reshape((L, b) + x.shape[1:]),
                        y_prog.reshape((L, b) + y_prog.shape[1:]))
            return f
        return self._prog(("prog_reconstruct_all", n_levels), make)

    # ---- all_scalable=False: per-slice interleaved progressive programs
    # (reference: pic.py:769-831 compress / 905-967 decompress — the
    # support is the DECODED progressive slices of this quality, so the
    # decoder must alternate device params <-> host entropy decode per
    # slice, exactly like the base chain) ----

    def _p_ns_prog_params(self, i: int, quality_key, with_ckpt: bool = False):
        """Entropy params + mask + CDF indexes for progressive slice i at
        one quality, supported on the decoded prog slices so far. Shared
        bitwise between compress and decompress (mask identity)."""
        def make():
            q = quality_key

            def f(v, lm, ls, y_hat_base_i, prog_slices, ckpt=None,
                  mu_b_i=None, scale_b_i=None):
                lm_e = lm[..., self.model.division[0]:]
                ls_e = ls[..., self.model.division[0]:]
                mu, _, scale, msup = self.model.apply(
                    v, lm_e, ls_e, y_hat_base_i, list(prog_slices),
                    list(prog_slices), i,
                    method=VarianceMaskingPIC.prog_slice_params)
                if with_ckpt:
                    mu, scale = self.model.apply(
                        v, i, q, mu, scale, ckpt, mu_b_i, scale_b_i,
                        method=type(self.model)._refine_prog_params)
                mask = variance_mask(scale, q, self.model.mask_policy)
                idx = build_indexes(scale * mask, self._scale_table,
                                    self.model.scale_bound).astype(jnp.int8)
                return mu, scale, mask, idx, msup
            return f
        return self._prog(("ns_prog_params", i, quality_key, with_ckpt),
                          make)

    def _p_ns_prog_sym(self, i: int):
        def make():
            ns0, c = self.model.ns0, self.model.dim_chunk

            def f(y, mu, mask):
                r_i = y[..., (ns0 + i) * c:(ns0 + i + 1) * c]
                if self.model.delta_encode:
                    r_i = r_i - y[..., i * c:(i + 1) * c]
                sym = jnp.round((r_i - mu) * mask)
                flag8 = (jnp.abs(sym) > 127).any()
                flag16 = (jnp.abs(sym) > 32000).any()
                return (sym.astype(jnp.int8), sym.astype(jnp.int16),
                        sym.astype(jnp.int32), flag8, flag16)
            return f
        return self._prog(("ns_prog_sym", i), make)

    def _p_ns_prog_finish(self, i: int):
        def make():
            def f(v, sym, mu, msup, y_hat_base_i):
                y_hat = sym.astype(jnp.float32) + mu
                return self.model.apply(
                    v, y_hat, msup, y_hat_base_i, i,
                    method=VarianceMaskingPIC.finish_prog_slice)
            return f
        return self._prog(("ns_prog_finish", i), make)

    def _p_synth_prog(self):
        def make():
            def f(v, slices):
                y = jnp.concatenate(list(slices), axis=-1)
                x = self.model.apply(
                    v, y, method=VarianceMaskingPIC.synthesize_prog)
                return jnp.clip(x, 0.0, 1.0), y
            return f
        return self._prog("synth_prog", make)

    def _p_prog_reconstruct(self):
        def make():
            def f(v, sym_s, mu_s, msups, y_hat_base_slices):
                slices = []
                for i in range(self.model.ns1 - self.model.ns0):
                    y_hat = sym_s[i].astype(jnp.float32) + mu_s[i]
                    y_hat = self.model.apply(
                        v, y_hat, msups[i], y_hat_base_slices[i], i,
                        method=VarianceMaskingPIC.finish_prog_slice)
                    slices.append(y_hat)
                y_prog = jnp.concatenate(slices, axis=-1)
                x = self.model.apply(
                    v, y_prog, method=VarianceMaskingPIC.synthesize_prog)
                return jnp.clip(x, 0.0, 1.0), y_prog
            return f
        return self._prog("prog_reconstruct", make)

    # ------------------------------------------------------------------
    # z coding
    # ------------------------------------------------------------------

    def _z_indexes(self, shape) -> np.ndarray:
        b, h, w, c = shape
        return np.ascontiguousarray(np.broadcast_to(
            np.arange(c, dtype=np.int32), (b, h, w, c)))

    def _encode_z(self, z_sym: np.ndarray) -> List[bytes]:
        b = z_sym.shape[0]
        idx = self._z_indexes(z_sym.shape)
        per = z_sym[0].size
        return self.z_coder.encode_batch(z_sym.reshape(-1), idx.reshape(-1),
                                         [per] * b)

    def _decode_z(self, strings: Sequence[bytes], spatial, n) -> np.ndarray:
        b = len(strings)
        h, w = spatial
        idx = self._z_indexes((b, h, w, n))
        per = h * w * n
        sym = self.z_coder.decode_batch(strings, idx.reshape(-1), [per] * b)
        return sym.reshape(b, h, w, n)

    # ------------------------------------------------------------------
    # y coding helpers (slice batches)
    # ------------------------------------------------------------------

    def _encode_slice(self, sym: np.ndarray, idx: np.ndarray) -> List[bytes]:
        """One slice, B messages (one per batch item) — matches the
        reference's per-image strings (entropy_models.py:231-239)."""
        b = sym.shape[0]
        per = sym[0].size
        return self.y_coder.encode_batch(sym.reshape(-1), idx.reshape(-1),
                                         [per] * b)

    def _decode_slice(self, strings: Sequence[bytes],
                      idx: np.ndarray) -> np.ndarray:
        b = idx.shape[0]
        per = idx[0].size
        sym = self.y_coder.decode_batch(strings, idx.reshape(-1), [per] * b)
        return sym.reshape(idx.shape)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def compress(self, x, quality: float = 0.0,
                 return_latents: bool = False,
                 checkpoint_rep=None,
                 buffered: bool = False,
                 raw_base: bool = False) -> Dict[str, Any]:
        """x: [B,H,W,3] float in [0,1], H,W % 64 == 0. Returns the
        bitstream dict (strings layout mirrors reference pic.py:756,833).

        buffered=True emits ONE y-stream per image covering all slices
        (reference WACNN's BufferedRansEncoder, cnn.py:244-281) instead of
        per-slice messages; decompress detects the layout from the dict.

        raw_base=True (quality 0 only) skips the base entropy encode and
        returns the packed base symbols/indexes instead (``_base_sym_np``,
        ``_base_idx_np`` as [S0,B,h,w,c] int32) — used by the single-stream
        progressive encoder, which coalesces base + shells into one rANS
        message per image.
        """
        v = self.variables
        x = jnp.asarray(x)
        y, y_base, z_sym_dev = self._p_front()(v, x, self._z_med_dev)
        z_sym = np.asarray(jax.device_get(z_sym_dev))
        z_strings = self._encode_z(z_sym)
        z_shape = z_sym.shape[1:3]

        lm, ls = self._p_zhat_hyper(False)(v, z_sym_dev, self._z_med_dev)
        lm_b = lm[..., :self.model.division[0]]
        ls_b = ls[..., :self.model.division[0]]

        # --- base chain: encoder simulates decoder ---
        y_strings: List[List[bytes]] = []
        c = self.model.dim_chunk
        ns0 = self.model.ns0
        chain = self._encode_base_chain(v, y_base, lm_b, ls_b)
        use_io = chain is not None
        if use_io:
            (y_hat_s, mu_s_b, scale_s_b, idx_s, s8, s16, fl8, ovf) = chain
            if bool(jax.device_get(ovf)):
                use_io = False  # symbols exceed int16 (untrained model /
                # pathological input): redo via the interleaved path
        if use_io:
            y_hat_slices: Any = y_hat_s
            mus_b: Any = mu_s_b
            scales_b: Any = scale_s_b
            sym_np = np.asarray(jax.device_get(
                s16 if bool(jax.device_get(fl8)) else s8))
            idx_np = np.asarray(jax.device_get(idx_s)).astype(np.int32)
        else:
            y_hat_slices = []
            mus_b, scales_b = [], []
            s8s, s16s, s32s, flags8, flags16, idx_host = \
                [], [], [], [], [], []
            buf = self._base_buf0(lm_b)
            # the SAME fused step program the decoder runs (finish(i) +
            # params(i+1) in one dispatch) — identical program instances on
            # both sides keep the entropy params bitwise equal by
            # construction
            mu, scale, idx, msup = self._p_base_params()(
                v, lm_b, ls_b, buf, np.int32(0))
            for i in range(ns0):
                y_i = y[..., i * c:(i + 1) * c]
                s8, s16, s32, fl8, fl16 = self._p_base_sym()(y_i, mu)
                mus_b.append(mu)
                scales_b.append(scale)
                idx_host.append(idx)
                if i + 1 < ns0:
                    y_hat, buf, mu, scale, idx, msup = self._p_base_step()(
                        v, s32, mu, msup, buf, np.int32(i), lm_b, ls_b)
                else:
                    y_hat, buf = self._p_base_finish()(v, s32, mu, msup,
                                                       buf, np.int32(i))
                y_hat_slices.append(y_hat)
                s8s.append(s8)
                s16s.append(s16)
                s32s.append(s32)
                flags8.append(fl8)
                flags16.append(fl16)
            # one compact transfer for all slices' symbols+indexes
            # (int8/int8; tunnel D2H is the bottleneck), int16/int32
            # fallback on overflow
            sym_np = self._get_sym(jnp.stack(s8s), jnp.stack(s16s),
                                   jnp.stack(s32s), jnp.stack(flags8).any(),
                                   jnp.stack(flags16).any())
            idx_np = np.asarray(jax.device_get(jnp.stack(idx_host))).astype(
                np.int32)
        if raw_base and quality <= 0:
            pass  # caller entropy-codes the base itself (single-stream)
        elif buffered and quality <= 0:
            # one stream per image over all slices: concat along the slice
            # axis per batch item, single batched encode
            b = sym_np.shape[1]
            sym_b = sym_np.transpose(1, 0, 2, 3, 4).reshape(b, -1)
            idx_b = idx_np.transpose(1, 0, 2, 3, 4).reshape(b, -1)
            y_strings = [self.y_coder.encode_batch(
                sym_b.ravel(), idx_b.ravel(), [sym_b.shape[1]] * b)]
        else:
            for i in range(self.model.ns0):
                y_strings.append(self._encode_slice(sym_np[i], idx_np[i]))

        out: Dict[str, Any] = {
            "strings": [y_strings, z_strings],
            "shape": tuple(int(s) for s in z_shape),
            "quality": float(quality),
            "buffered": bool(buffered and quality <= 0),
            # decoder routing: True only for io-mode streams (scan-mode
            # encodes decode through the interleaved programs, which the
            # scan matches bitwise — verify_base_chain)
            "io_chain": bool(use_io and self.chain_mode == "io"),
        }
        if quality <= 0:
            if raw_base:
                out["_base_sym_np"] = sym_np
                out["_base_idx_np"] = idx_np
            if return_latents:
                if use_io:
                    out["mean_base"] = self._p_stack_chan()(mus_b)
                    out["scale_base"] = self._p_stack_chan()(scales_b)
                    out["y_hat_base"] = self._p_stack_chan()(y_hat_slices)
                else:
                    out["mean_base"] = jnp.concatenate(mus_b, axis=-1)
                    out["scale_base"] = jnp.concatenate(scales_b, axis=-1)
                    out["y_hat_base"] = jnp.concatenate(y_hat_slices,
                                                        axis=-1)
                # device handles so downstream stages (progressive encode)
                # can reuse the front/hyper work instead of recomputing it;
                # never serialized (strip before dump_bitstreams)
                out["_device"] = {"y": y, "lm": lm, "ls": ls,
                                  "base_slices": _as_chain(y_hat_slices),
                                  "mus_b": _as_chain(mus_b),
                                  "scales_b": _as_chain(scales_b)}
            return out

        if not self.model.all_scalable:
            return self._compress_non_scalable(
                out, y, y_hat_slices, lm, ls, mus_b, scales_b,
                float(quality), checkpoint_rep, return_latents)

        # --- progressive stage: one params program + one host encode ---
        if checkpoint_rep is not None:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality), True)(
                v, _as_chain(y_hat_slices), lm, ls,
                jnp.asarray(checkpoint_rep),
                _as_chain(mus_b), _as_chain(scales_b))
        else:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality))(v, _as_chain(y_hat_slices), lm, ls)
        s8, s16, s32, fl8, fl16 = self._p_prog_sym()(y, mu_s, mask)
        sym_np = self._get_sym(s8, s16, s32, fl8, fl16)
        idx_np = np.asarray(jax.device_get(idx)).astype(np.int32)
        for i in range(self.model.ns1 - self.model.ns0):
            y_strings.append(self._encode_slice(sym_np[i], idx_np[i]))

        if return_latents:
            x_hat, y_prog = self._p_prog_reconstruct()(
                v, s32, mu_s, msups, _as_chain(y_hat_slices))
            out["y_hat"] = y_prog
        return out

    def _compress_non_scalable(self, out, y, y_hat_slices, lm, ls,
                               mus_b, scales_b, quality: float,
                               checkpoint_rep, return_latents: bool):
        """Progressive encode with quality-dependent support
        (all_scalable=False, reference pic.py:769-831): slice i's entropy
        params condition on the reconstructed slices 0..i-1 at THIS
        quality, so the chain interleaves params and reconstruction. The
        encoder knows all symbols, so everything stays on device until one
        batched symbol fetch at the end."""
        v = self.variables
        with_ckpt = checkpoint_rep is not None
        ckpt = jnp.asarray(checkpoint_rep) if with_ckpt else None
        prog_slices: List[jnp.ndarray] = []
        s8s, s16s, s32s, flags8, flags16, idxs = [], [], [], [], [], []
        for i in range(self.model.ns1 - self.model.ns0):
            if with_ckpt:
                mu, scale, mask, idx, msup = self._p_ns_prog_params(
                    i, quality, True)(v, lm, ls, y_hat_slices[i],
                                      tuple(prog_slices), ckpt,
                                      mus_b[i], scales_b[i])
            else:
                mu, scale, mask, idx, msup = self._p_ns_prog_params(
                    i, quality)(v, lm, ls, y_hat_slices[i],
                                tuple(prog_slices))
            s8, s16, s32, fl8, fl16 = self._p_ns_prog_sym(i)(y, mu, mask)
            y_hat = self._p_ns_prog_finish(i)(v, s32, mu, msup,
                                              y_hat_slices[i])
            prog_slices.append(y_hat)
            s8s.append(s8)
            s16s.append(s16)
            s32s.append(s32)
            flags8.append(fl8)
            flags16.append(fl16)
            idxs.append(idx)
        sym_np = self._get_sym(jnp.stack(s8s), jnp.stack(s16s),
                               jnp.stack(s32s), jnp.stack(flags8).any(),
                               jnp.stack(flags16).any())
        idx_np = np.asarray(jax.device_get(jnp.stack(idxs))).astype(np.int32)
        for i in range(self.model.ns1 - self.model.ns0):
            out["strings"][0].append(self._encode_slice(sym_np[i],
                                                        idx_np[i]))
        if return_latents:
            _, y_prog = self._p_synth_prog()(v, tuple(prog_slices))
            out["y_hat"] = y_prog
        return out

    def _decompress_non_scalable(self, y_strings, y_hat_slices, lm, ls,
                                 mus_b, scales_b, quality: float,
                                 checkpoint_rep) -> Dict[str, Any]:
        """Mirror of _compress_non_scalable (reference pic.py:905-967):
        device params -> host entropy decode -> device reconstruct, one
        round-trip per progressive slice (the data dependency is real —
        slice i+1's params need slice i's decoded content)."""
        v = self.variables
        with_ckpt = checkpoint_rep is not None
        ckpt = jnp.asarray(checkpoint_rep) if with_ckpt else None
        ns0 = self.model.ns0
        prog_slices: List[jnp.ndarray] = []
        for i in range(self.model.ns1 - ns0):
            if with_ckpt:
                mu, scale, mask, idx, msup = self._p_ns_prog_params(
                    i, quality, True)(v, lm, ls, y_hat_slices[i],
                                      tuple(prog_slices), ckpt,
                                      mus_b[i], scales_b[i])
            else:
                mu, scale, mask, idx, msup = self._p_ns_prog_params(
                    i, quality)(v, lm, ls, y_hat_slices[i],
                                tuple(prog_slices))
            idx_np = np.asarray(jax.device_get(idx)).astype(np.int32)
            sym = self._decode_slice(y_strings[ns0 + i], idx_np)
            y_hat = self._p_ns_prog_finish(i)(v, self._h2d_sym(sym), mu,
                                              msup, y_hat_slices[i])
            prog_slices.append(y_hat)
        x_hat, y_prog = self._p_synth_prog()(v, tuple(prog_slices))
        return {"x_hat": x_hat, "y_hat": y_prog}

    def extract_checkpoint(self, x, quality: float,
                           checkpoint_rep=None):
        """Decoded latent at a checkpoint quality, for REM conditioning
        (reference ExtractChekpointRepr, rem_pic.py:121-132). Chained
        checkpoints pass the previous one as checkpoint_rep."""
        out = self.compress(x, quality=quality, return_latents=True,
                            checkpoint_rep=checkpoint_rep)
        return out["y_hat"] if quality > 0 else out["y_hat_base"]

    def extract_checkpoint_device(self, x, quality: float,
                                  checkpoint_rep=None):
        """Bitwise `extract_checkpoint`, but DEVICE-ONLY: the same shared
        codec programs (fused base step, prog params, prog sym, prog
        reconstruct) without any host entropy coding — valid because the
        rANS round trip is lossless, so compress(return_latents)['y_hat']
        is fully determined by the device-computed symbols. The pipelined
        bench dispatches this async; a decoder reproduces the identical
        latent by decoding the check-level streams through the same
        programs."""
        v = self.variables
        x = jnp.asarray(x)
        y, y_base, z_sym_dev = self._p_front()(v, x, self._z_med_dev)
        lm, ls = self._p_zhat_hyper(False)(v, z_sym_dev, self._z_med_dev)
        lm_b = lm[..., :self.model.division[0]]
        ls_b = ls[..., :self.model.division[0]]
        ns0, c = self.model.ns0, self.model.dim_chunk
        chain = self._encode_base_chain(v, y_base, lm_b, ls_b)
        if chain is not None:
            (y_hat_slices, mus_b, scales_b, _, _, _, _, _) = chain
        else:
            buf = self._base_buf0(lm_b)
            y_hat_slices, mus_b, scales_b = [], [], []
            mu, scale, idx, msup = self._p_base_params()(
                v, lm_b, ls_b, buf, np.int32(0))
            for i in range(ns0):
                y_i = y[..., i * c:(i + 1) * c]
                _, _, s32, _, _ = self._p_base_sym()(y_i, mu)
                mus_b.append(mu)
                scales_b.append(scale)
                if i + 1 < ns0:
                    y_hat, buf, mu, scale, idx, msup = self._p_base_step()(
                        v, s32, mu, msup, buf, np.int32(i), lm_b, ls_b)
                else:
                    y_hat, buf = self._p_base_finish()(v, s32, mu, msup,
                                                       buf, np.int32(i))
                y_hat_slices.append(y_hat)
        if quality <= 0:
            if chain is not None:
                return self._p_stack_chan()(y_hat_slices)
            return jnp.concatenate(y_hat_slices, axis=-1)
        if checkpoint_rep is not None:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality), True)(
                v, _as_chain(y_hat_slices), lm, ls,
                jnp.asarray(checkpoint_rep),
                _as_chain(mus_b), _as_chain(scales_b))
        else:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality))(v, _as_chain(y_hat_slices), lm, ls)
        _, _, s32, _, _ = self._p_prog_sym()(y, mu_s, mask)
        _, y_prog = self._p_prog_reconstruct()(
            v, s32, mu_s, msups, _as_chain(y_hat_slices))
        return y_prog

    def decompress(self, bitstream: Dict[str, Any],
                   quality: Optional[float] = None,
                   checkpoint_rep=None) -> Dict[str, Any]:
        """Mirror of compress (reference: pic.py:838-967)."""
        v = self.variables
        quality = bitstream["quality"] if quality is None else quality
        y_strings, z_strings = bitstream["strings"]
        z_shape = bitstream["shape"]

        z_sym = self._decode_z(z_strings, z_shape, self.model.n)
        z_sym_dev = jnp.asarray(z_sym)
        if quality <= 0:
            # base-only decode needs only the base hyper branch
            # (reference: pic.py:848-850)
            lm_b, ls_b = self._p_zhat_hyper(True)(v, z_sym_dev,
                                                  self._z_med_dev)
        else:
            lm, ls = self._p_zhat_hyper(False)(v, z_sym_dev,
                                               self._z_med_dev)
            lm_b = lm[..., :self.model.division[0]]
            ls_b = ls[..., :self.model.division[0]]

        buffered = bool(bitstream.get("buffered"))
        streams = None
        if buffered:
            streams = [self.y_coder.stream_decoder(s)
                       for s in y_strings[0]]

        ns0 = self.model.ns0
        if bitstream.get("io_chain"):
            # the encoder ran the fused io-callback chain — run the SAME
            # program with the host rANS behind the callbacks (lm_b stands
            # in for the unknown y: its values only feed the ignored
            # encoder-side symbols)
            (y_hat_slices, mus_b, scales_b, _, _, _, _, _) = \
                self._base_chain_call(
                    v, lm_b, lm_b, ls_b,
                    strings=None if buffered else y_strings,
                    streams=streams)
        else:
            y_hat_slices = []
            mus_b, scales_b = [], []
            buf = self._base_buf0(lm_b)
            mu, scale, idx, msup = self._p_base_params()(
                v, lm_b, ls_b, buf, np.int32(0))
            for i in range(ns0):
                idx_np = np.asarray(jax.device_get(idx)).astype(np.int32)
                if buffered:
                    nb = idx_np.shape[0]
                    per = idx_np[0].size
                    sym = self.y_coder.decode_streams(
                        streams, idx_np, [per] * nb).reshape(idx_np.shape)
                else:
                    sym = self._decode_slice(y_strings[i], idx_np)
                mus_b.append(mu)
                scales_b.append(scale)
                if i + 1 < ns0:
                    # fused finish(i) + params(i+1): one dispatch per slice
                    y_hat, buf, mu, scale, idx, msup = self._p_base_step()(
                        v, self._h2d_sym(sym), mu, msup, buf, np.int32(i),
                        lm_b, ls_b)
                    idx.copy_to_host_async()
                else:
                    y_hat, buf = self._p_base_finish()(
                        v, self._h2d_sym(sym), mu, msup, buf, np.int32(i))
                y_hat_slices.append(y_hat)
        if streams:
            if bitstream.get("io_chain") and quality <= 0:
                # callbacks consume the streams asynchronously: sync on a
                # chain output before closing them (q > 0 paths sync when
                # they fetch the progressive indexes)
                jax.block_until_ready(scales_b)
            if quality <= 0 or not bitstream.get("io_chain"):
                for s in streams:
                    s.close()

        if quality <= 0:
            x_hat, y_hat_b = self._p_synth_base()(v,
                                                  _as_chain(y_hat_slices))
            return {"x_hat": x_hat, "y_hat": y_hat_b}

        if not self.model.all_scalable:
            return self._decompress_non_scalable(
                y_strings, y_hat_slices, lm, ls, mus_b, scales_b,
                float(quality), checkpoint_rep)

        if checkpoint_rep is not None:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality), True)(
                v, _as_chain(y_hat_slices), lm, ls,
                jnp.asarray(checkpoint_rep),
                _as_chain(mus_b), _as_chain(scales_b))
        else:
            mu_s, scale_s, mask, idx, msups = self._p_prog_params(
                float(quality))(v, _as_chain(y_hat_slices), lm, ls)
        idx_np = np.asarray(jax.device_get(idx)).astype(np.int32)
        if streams and bitstream.get("io_chain"):
            for s in streams:  # idx fetch above synced past the base chain
                s.close()
        sym_list = [
            self._decode_slice(y_strings[ns0 + i], idx_np[i])
            for i in range(self.model.ns1 - ns0)
        ]
        sym_s = self._h2d_sym(np.stack(sym_list))
        x_hat, y_prog = self._p_prog_reconstruct()(
            v, sym_s, mu_s, msups, _as_chain(y_hat_slices))
        return {"x_hat": x_hat, "y_hat": y_prog}
