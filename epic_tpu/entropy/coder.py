"""numpy-first host rANS coder interface.

Semantics match the reference's entropy-coder surface
(``encode_with_indexes`` / ``decode_with_indexes``; reference:
entropy_models.py:48-52, 206-294) but the API takes packed numpy arrays and
whole batches, not per-item Python lists: symbols/indexes arrive as int32
arrays straight out of a single ``jax.device_get``, and batched calls fan out
across host threads in C++.
"""

from __future__ import annotations

import ctypes
import threading
import time
from typing import Sequence

import numpy as np

from ..native import load_library

_DEFAULT_PRECISION = 16


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ascontig(a, dtype) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=dtype)


def pmf_to_quantized_cdf(pmf, precision: int = _DEFAULT_PRECISION) -> np.ndarray:
    """Quantize one float pmf (1-D) to an integer CDF of length len(pmf)+1."""
    lib = load_library()
    pmf = _ascontig(pmf, np.float32)
    out = np.zeros(pmf.shape[0] + 1, dtype=np.uint32)
    rc = lib.epic_pmf_to_quantized_cdf(
        _f32p(pmf), np.int32(pmf.shape[0]), np.int32(precision), _u32p(out)
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out.astype(np.int32)


def pmf_to_quantized_cdf_batch(
    pmf: np.ndarray,
    pmf_lengths: np.ndarray,
    precision: int = _DEFAULT_PRECISION,
    nthreads: int = 8,
) -> np.ndarray:
    """Quantize a padded [M, Lmax] pmf matrix; row i uses pmf_lengths[i] entries.

    Returns an int32 [M, Lmax + 2] CDF matrix laid out like the reference's
    ``_quantized_cdf`` buffers (row i has pmf_lengths[i] + 1 CDF entries
    covering pmf_lengths[i] symbols incl. the tail slot; zero padded).
    Reference row construction: entropy_models.py:175-183.
    """
    lib = load_library()
    pmf = _ascontig(pmf, np.float32)
    m, lmax = pmf.shape
    pmf_lengths = _ascontig(pmf_lengths, np.int32)
    out = np.zeros((m, lmax + 2), dtype=np.uint32)
    rc = lib.epic_pmf_to_quantized_cdf_batch(
        _f32p(pmf), np.int64(lmax), _i32p(pmf_lengths), np.int32(m),
        np.int32(precision), _u32p(out), np.int64(out.shape[1]),
        np.int32(nthreads),
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf_batch failed with code {rc}")
    return out.astype(np.int32)


class RansCoder:
    """Stateless encoder/decoder over a fixed set of CDF tables.

    ``cdfs`` is an int32 [num_tables, Lmax] matrix of quantized CDFs,
    ``cdf_lengths`` the per-row entry counts, ``offsets`` the per-row symbol
    offsets — the exact table triple the reference stores as registered
    buffers (entropy_models.py:98-101).
    """

    def __init__(self, cdfs, cdf_lengths, offsets,
                 precision: int = _DEFAULT_PRECISION,
                 nthreads: int | None = None):
        self.cdfs = _ascontig(cdfs, np.uint32)
        self.cdf_lengths = _ascontig(cdf_lengths, np.int32)
        self.offsets = _ascontig(offsets, np.int32)
        if self.cdfs.ndim != 2:
            raise ValueError("cdfs must be 2-D [num_tables, max_len]")
        self.precision = int(precision)
        if nthreads is None:
            # cap at the real core count: extra threads only add context
            # switches (this box is 1-core; 16 threads measured ~7x slower
            # in-process than the single-thread path)
            import os as _os

            nthreads = min(16, _os.cpu_count() or 1)
        self.nthreads = int(nthreads)
        self._lib = load_library()
        # host-rANS wall-time accounting (batched calls), for the bench's
        # encode/decode/host time split — reset with stats.update(...).
        # Guarded by _stats_lock: one coder serves concurrent sweep threads
        # (codec.pipeline), and += on a dict entry is not atomic.
        self.stats = {"encode_s": 0.0, "decode_s": 0.0,
                      "encode_calls": 0, "decode_calls": 0,
                      "encode_syms": 0, "decode_syms": 0}
        self._stats_lock = threading.Lock()
        # decode_shell_streams overflow stash: per-thread, so concurrent
        # decodes never see each other's outlier list
        self._tls = threading.local()

    def _stat_add(self, **kv) -> None:
        with self._stats_lock:
            for k, v in kv.items():
                self.stats[k] += v

    @property
    def _last_overflow(self):
        return getattr(self._tls, "overflow", None)

    @_last_overflow.setter
    def _last_overflow(self, value):
        self._tls.overflow = value

    # -- single message ---------------------------------------------------

    def encode_with_indexes(self, symbols, indexes) -> bytes:
        symbols = _ascontig(symbols, np.int32).ravel()
        indexes = _ascontig(indexes, np.int32).ravel()
        if symbols.shape != indexes.shape:
            raise ValueError("symbols and indexes must have the same size")
        cap = max(64, symbols.size * 8 + 64)
        out = np.empty(cap, dtype=np.uint8)
        n = self._lib.epic_rans_encode(
            _i32p(symbols), _i32p(indexes), np.int64(symbols.size),
            _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _u8p(out), np.int64(cap),
        )
        if n < 0:
            raise RuntimeError("rANS encode output exceeded capacity")
        return out[:n].tobytes()

    def decode_with_indexes(self, data: bytes, indexes) -> np.ndarray:
        indexes = _ascontig(indexes, np.int32).ravel()
        buf = np.frombuffer(data, dtype=np.uint8)
        buf = _ascontig(buf, np.uint8)
        out = np.empty(indexes.size, dtype=np.int32)
        rc = self._lib.epic_rans_decode(
            _u8p(buf), np.int64(buf.size), _i32p(indexes),
            np.int64(indexes.size), _u32p(self.cdfs),
            np.int64(self.cdfs.shape[1]), _i32p(self.cdf_lengths),
            _i32p(self.offsets), np.int32(self.precision), _i32p(out),
        )
        if rc != 0:
            raise RuntimeError(f"rANS decode failed with code {rc}")
        return out

    # -- buffered / streaming (reference BufferedRansEncoder /
    #    RansDecoder.decode_stream, cnn.py:244-281, 303-345) --------------

    def buffered_encoder(self) -> "BufferedEncoder":
        return BufferedEncoder(self)

    def stream_decoder(self, data: bytes) -> "StreamDecoder":
        return StreamDecoder(self, data)

    # -- batched ----------------------------------------------------------

    def encode_batch(self, symbols, indexes,
                     msg_lengths: Sequence[int]) -> list[bytes]:
        """Encode M messages packed back-to-back in ``symbols``/``indexes``.

        msg_lengths[i] gives message i's symbol count. Runs all messages in
        parallel on host threads; one C call total.
        """
        t_start = time.perf_counter()
        symbols = _ascontig(symbols, np.int32).ravel()
        indexes = _ascontig(indexes, np.int32).ravel()
        lengths = _ascontig(msg_lengths, np.int64).ravel()
        m = lengths.size
        offs = np.zeros(m, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offs[1:])
        if offs[-1] + lengths[-1] != symbols.size:
            raise ValueError("msg_lengths do not cover the symbols buffer")
        cap = int(max(64, int(lengths.max()) * 8 + 64))
        out = np.empty(m * cap, dtype=np.uint8)
        out_lengths = np.empty(m, dtype=np.int64)
        rc = self._lib.epic_rans_encode_batch(
            _i32p(symbols), _i32p(indexes), _i64p(offs), _i64p(lengths),
            np.int32(m), _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _u8p(out), np.int64(cap),
            _i64p(out_lengths), np.int32(self.nthreads),
        )
        if rc != 0:
            raise RuntimeError("batched rANS encode failed")
        res = [
            out[i * cap:i * cap + int(out_lengths[i])].tobytes()
            for i in range(m)
        ]
        self._stat_add(encode_s=time.perf_counter() - t_start,
                       encode_calls=1, encode_syms=int(symbols.size))
        return res

    def encode_seg_batch(self, symbols, indexes, msg_lengths: Sequence[int],
                         seg_ends) -> tuple[list[bytes], np.ndarray]:
        """Encode M single-stream messages, each with the same number of
        cumulative segment boundaries, returning per-boundary decode-prefix
        byte counts.

        seg_ends: int64 [M, nseg], ascending per row, seg_ends[i, -1] ==
        msg_lengths[i]. Returns (blobs, prefix_bytes [M, nseg]): a decoder
        needs prefix_bytes[i, k] bytes of message i (counted from its
        transmission front — see container.py stream reversal) to decode
        symbols [0, seg_ends[i, k]). This is the one-stream-per-image path
        (reference BufferedRansEncoder, cnn.py:244-281) extended with exact
        progressive-prefix accounting."""
        t_start = time.perf_counter()
        symbols = _ascontig(symbols, np.int32).ravel()
        indexes = _ascontig(indexes, np.int32).ravel()
        lengths = _ascontig(msg_lengths, np.int64).ravel()
        seg_ends = _ascontig(seg_ends, np.int64)
        m = lengths.size
        if seg_ends.ndim != 2 or seg_ends.shape[0] != m:
            raise ValueError("seg_ends must be [M, nseg]")
        nseg = seg_ends.shape[1]
        offs = np.zeros(m, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offs[1:])
        if offs[-1] + lengths[-1] != symbols.size:
            raise ValueError("msg_lengths do not cover the symbols buffer")
        cap = int(max(64, int(lengths.max()) * 8 + 64))
        out = np.empty(m * cap, dtype=np.uint8)
        out_lengths = np.empty(m, dtype=np.int64)
        prefix = np.empty((m, nseg), dtype=np.int64)
        rc = self._lib.epic_rans_encode_seg_batch(
            _i32p(symbols), _i32p(indexes), _i64p(offs), _i64p(lengths),
            np.int32(m), _i64p(seg_ends), np.int32(nseg),
            _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _u8p(out), np.int64(cap),
            _i64p(out_lengths), _i64p(prefix), np.int32(self.nthreads),
        )
        if rc != 0:
            raise RuntimeError("segmented rANS encode failed")
        res = [
            out[i * cap:i * cap + int(out_lengths[i])].tobytes()
            for i in range(m)
        ]
        self._stat_add(encode_s=time.perf_counter() - t_start,
                       encode_calls=1, encode_syms=int(symbols.size))
        return res, prefix

    def encode_shell_batch(self, base_sym, base_idx, prog_sym, prog_idx,
                           sid, nq: int) -> tuple[list[bytes], np.ndarray]:
        """Shell-bucketed single-stream encode straight from UNSORTED flat
        device arrays: per image, [base grid order] ++ [progressive
        symbols stably bucketed by shell id] with exact per-boundary
        prefix bytes. The stable counting walk runs in C — byte-identical
        to argsort(stable)+gather+encode_seg_batch, without the host-side
        numpy pack (measured ~1.9s/sweep on the 1-core TPU-VM host).

        base_sym [M, nb] int8/16/32, base_idx [M, nb] uint8-valued,
        prog_sym [M, np] int8/16/32, prog_idx [M, np], sid [M, np] int8
        (values 0..nq; nq = never coded). Returns (blobs, prefix [M, nq+1]).
        """
        t_start = time.perf_counter()

        def _sym(a):
            a = np.ascontiguousarray(a)
            if a.dtype not in (np.int8, np.int16, np.int32):
                a = a.astype(np.int32)
            return a

        base_sym = _sym(base_sym)
        prog_sym = _sym(prog_sym)
        base_idx = _ascontig(base_idx, np.uint8)
        prog_idx = _ascontig(prog_idx, np.uint8)
        sid = _ascontig(sid, np.int8)
        m, nb = base_sym.shape
        np_ = prog_sym.shape[1]
        if prog_idx.shape != (m, np_) or sid.shape != (m, np_) or \
                base_idx.shape != (m, nb):
            raise ValueError("shell encode: inconsistent shapes")
        cap = int(max(64, (nb + np_) * 8 + 64))
        out = np.empty(m * cap, dtype=np.uint8)
        out_lengths = np.empty(m, dtype=np.int64)
        prefix = np.empty((m, nq + 1), dtype=np.int64)
        rc = self._lib.epic_rans_encode_shell_batch(
            ctypes.c_void_p(base_sym.ctypes.data),
            np.int32(base_sym.dtype.itemsize), _u8p(base_idx),
            np.int64(nb),
            ctypes.c_void_p(prog_sym.ctypes.data),
            np.int32(prog_sym.dtype.itemsize), _u8p(prog_idx),
            sid.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            np.int64(np_), np.int32(nq), np.int32(m),
            _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _u8p(out), np.int64(cap),
            _i64p(out_lengths), _i64p(prefix), np.int32(self.nthreads),
        )
        if rc != 0:
            raise RuntimeError(f"shell rANS encode failed ({rc})")
        res = [out[i * cap:i * cap + int(out_lengths[i])].tobytes()
               for i in range(m)]
        self._stat_add(encode_s=time.perf_counter() - t_start,
                       encode_calls=1,
                       encode_syms=int(nb * m)
                       + int((np.asarray(sid) < nq).sum()))
        return res, prefix

    def decode_shell_streams(self, streams: Sequence["StreamDecoder"],
                             idx_flat, sid, j0: int, j1: int, nq: int,
                             canvas: np.ndarray) -> int:
        """Advance every stream through shells [j0, j1), writing decoded
        symbols at their ORIGINAL flat positions into ``canvas`` (int16
        [M, np], mutated in place) — the decoder-side mirror of
        encode_shell_batch (no order array, no host scatter). Returns the
        count of out-of-int16 outliers patched into the canvas (the canvas
        is widened to int32 by the CALLER in that case — see usage)."""
        t_start = time.perf_counter()
        idx_flat = _ascontig(idx_flat, np.uint8)
        sid = _ascontig(sid, np.int8)
        m, np_ = sid.shape
        if len(streams) != m or canvas.shape != (m, np_) or \
                canvas.dtype != np.int16 or not canvas.flags.c_contiguous:
            raise ValueError("shell decode: bad canvas/streams")
        handles = (ctypes.c_void_p * m)(
            *[ctypes.c_void_p(s._handle) for s in streams])
        cap = 65536
        ovf_pos = np.empty(cap, dtype=np.int64)
        ovf_val = np.empty(cap, dtype=np.int32)
        rc = self._lib.epic_rans_stream_decode_shell_batch(
            handles, np.int32(m), _u8p(idx_flat),
            sid.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            np.int64(np_), np.int32(j0), np.int32(j1), np.int32(nq),
            _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision),
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            _i64p(ovf_pos), _i32p(ovf_val), np.int32(cap),
            np.int32(self.nthreads),
        )
        if rc < 0:
            raise RuntimeError(f"shell stream decode failed ({rc})")
        n_decoded = int(((np.asarray(sid) >= j0)
                         & (np.asarray(sid) < j1)).sum())
        self._stat_add(decode_s=time.perf_counter() - t_start,
                       decode_calls=1, decode_syms=n_decoded)
        if rc > 0:
            self._last_overflow = (ovf_pos[:rc].copy(), ovf_val[:rc].copy())
        return rc

    def decode_streams(self, streams: Sequence["StreamDecoder"], indexes,
                       msg_lengths: Sequence[int]) -> np.ndarray:
        """Advance M independent StreamDecoders by one chunk each (chunk i
        covers msg_lengths[i] symbols of the packed ``indexes``), parallel
        across host threads — one C call per slice for a whole image batch
        instead of one per (image, slice)."""
        t_start = time.perf_counter()
        indexes = _ascontig(indexes, np.int32).ravel()
        lengths = _ascontig(msg_lengths, np.int64).ravel()
        m = lengths.size
        if len(streams) != m:
            raise ValueError("need one stream per message")
        offs = np.zeros(m, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offs[1:])
        if offs[-1] + lengths[-1] != indexes.size:
            raise ValueError("msg_lengths do not cover the indexes buffer")
        handles = (ctypes.c_void_p * m)(
            *[ctypes.c_void_p(s._handle) for s in streams])
        out = np.empty(indexes.size, dtype=np.int32)
        rc = self._lib.epic_rans_stream_decode_batch(
            handles, np.int32(m), _i32p(indexes), _i64p(offs),
            _i64p(lengths), _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _i32p(out), np.int32(self.nthreads),
        )
        if rc != 0:
            raise RuntimeError(f"batched stream decode failed ({rc})")
        self._stat_add(decode_s=time.perf_counter() - t_start,
                       decode_calls=1, decode_syms=int(out.size))
        return out

    def decode_batch(self, datas: Sequence[bytes], indexes,
                     msg_lengths: Sequence[int]) -> np.ndarray:
        """Decode M messages; returns one packed int32 symbol buffer."""
        t_start = time.perf_counter()
        indexes = _ascontig(indexes, np.int32).ravel()
        lengths = _ascontig(msg_lengths, np.int64).ravel()
        m = lengths.size
        if len(datas) != m:
            raise ValueError("need one bytestring per message")
        offs = np.zeros(m, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offs[1:])
        data_lengths = np.array([len(d) for d in datas], dtype=np.int64)
        data_offsets = np.zeros(m, dtype=np.int64)
        np.cumsum(data_lengths[:-1], out=data_offsets[1:])
        blob = np.frombuffer(b"".join(datas), dtype=np.uint8)
        blob = _ascontig(blob, np.uint8)
        out = np.empty(int(lengths.sum()), dtype=np.int32)
        rc = self._lib.epic_rans_decode_batch(
            _u8p(blob), _i64p(data_offsets), _i64p(data_lengths),
            _i32p(indexes), _i64p(offs), _i64p(lengths), np.int32(m),
            _u32p(self.cdfs), np.int64(self.cdfs.shape[1]),
            _i32p(self.cdf_lengths), _i32p(self.offsets),
            np.int32(self.precision), _i32p(out), np.int32(self.nthreads),
        )
        if rc != 0:
            raise RuntimeError(f"batched rANS decode failed with code {rc}")
        self._stat_add(decode_s=time.perf_counter() - t_start,
                       decode_calls=1, decode_syms=int(out.size))
        return out


class BufferedEncoder:
    """Accumulate (symbols, indexes) chunks, emit ONE stream on flush()
    (reference BufferedRansEncoder semantics, cnn.py:244-281)."""

    def __init__(self, coder: RansCoder):
        self._coder = coder
        self._symbols: list[np.ndarray] = []
        self._indexes: list[np.ndarray] = []

    def encode_with_indexes(self, symbols, indexes) -> None:
        self._symbols.append(_ascontig(symbols, np.int32).ravel())
        self._indexes.append(_ascontig(indexes, np.int32).ravel())

    def flush(self) -> bytes:
        sym = np.concatenate(self._symbols) if self._symbols else \
            np.zeros(0, np.int32)
        idx = np.concatenate(self._indexes) if self._indexes else \
            np.zeros(0, np.int32)
        return self._coder.encode_with_indexes(sym, idx)


class StreamDecoder:
    """Stateful chunked decoding of one stream: decode chunk k, compute
    chunk k+1's indexes from it, continue (reference
    RansDecoder.decode_stream, cnn.py:303-345)."""

    def __init__(self, coder: RansCoder, data: bytes):
        import ctypes as _ct

        self._coder = coder
        self._lib = coder._lib
        buf = _ascontig(np.frombuffer(data, dtype=np.uint8), np.uint8)
        self._buf = buf  # keep alive until handle copies it (ctor copies)
        self._handle = self._lib.epic_rans_stream_new(
            _u8p(buf), np.int64(buf.size))
        if not self._handle:
            raise ValueError("invalid stream")

    def decode_stream(self, indexes) -> np.ndarray:
        indexes = _ascontig(indexes, np.int32).ravel()
        out = np.empty(indexes.size, dtype=np.int32)
        rc = self._lib.epic_rans_stream_decode(
            self._handle, _i32p(indexes), np.int64(indexes.size),
            _u32p(self._coder.cdfs), np.int64(self._coder.cdfs.shape[1]),
            _i32p(self._coder.cdf_lengths), _i32p(self._coder.offsets),
            np.int32(self._coder.precision), _i32p(out),
        )
        if rc != 0:
            raise RuntimeError(f"stream decode failed with code {rc}")
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.epic_rans_stream_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
