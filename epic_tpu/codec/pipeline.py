"""Concurrent sweep pipeline: overlap independent sweeps' host phases.

The progressive decoder's base chain is an interleaved host<->device loop
(ns0 program round trips with a blocking CDF-index fetch each — the data
dependency of reference pic.py:862-903), so a full-ladder decode is
LATENCY-bound, not compute-bound: on the measured runtime a dispatch+fetch
round trip costs ~30 ms while the device programs themselves total ~0.35 s
per sweep (artifacts/profile_r5.json). Different sweeps are independent,
and those waits release the GIL, so running each sweep's host phase
(entropy-code + decode) on its own worker thread overlaps the round trips
almost perfectly (measured: 3 chains of 10 round trips in 0.50 s vs 1.30 s
serial).

This is the standard serving pattern — concurrent requests over one
accelerator — expressed at the codec layer:

    pipe = SweepPipeline(codec, q_list, rems=..., workers=3)
    for res in pipe.run(batches):
        res["x_hat"]  # device handle: [1+Q, B, H, W, 3]

The main thread dispatches every sweep's DEVICE programs in submission
order (progressive_encode_start is pure async dispatch), so device-side
program order stays deterministic; workers only run host work: the rANS
encode (progressive_encode_finish), and the full-ladder decode
(progressive_decode_all). Thread safety relies on: jitted-program calls
being thread-safe, the C rANS being stateless per call with per-bitstream
stream decoders, PICCodec._prog building programs under a lock, and
RansCoder's stats/overflow stash being lock/thread-local guarded.

Results are yielded in submission order; ``max_in_flight`` bounds device
buffer retention (each in-flight sweep holds its encode state + x_hat on
the chip).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Iterator, Optional, Sequence

from .pic_codec import PICCodec
from .progressive import (progressive_decode_all, progressive_encode_finish,
                          progressive_encode_start)


class SweepPipeline:
    """Encode + full-ladder decode of independent image batches with the
    host phases of up to ``workers`` sweeps in flight concurrently."""

    def __init__(self, codec: PICCodec,
                 q_list: Optional[Sequence[float]] = None,
                 rems: bool = False,
                 workers: int = 3,
                 max_in_flight: Optional[int] = None,
                 decode: bool = True):
        if codec.chain_mode == "io" and workers > 1:
            # the io chain's ordered callbacks assume one in-flight decode
            # per coder; the scan/interleaved modes have no such state
            workers = 1
        self.codec = codec
        self.q_list = list(q_list) if q_list is not None else None
        self.rems = bool(rems)
        self.workers = max(1, int(workers))
        self.max_in_flight = int(max_in_flight or (self.workers + 1))
        self.decode = bool(decode)
        # per-phase wall accumulators (host-side, summed across workers —
        # concurrent phases overlap, so these exceed elapsed wall by design)
        self.timing: Dict[str, float] = {"encode_start_s": 0.0,
                                         "encode_finish_s": 0.0,
                                         "decode_s": 0.0}
        self.finish_phases: Dict[str, float] = {}
        import threading

        self._tlock = threading.Lock()

    def _tadd(self, key: str, dt: float) -> None:
        with self._tlock:
            self.timing[key] += dt

    def _host_stage(self, st: Dict[str, Any]) -> Dict[str, Any]:
        t0 = time.time()
        local_phases: Dict[str, float] = {}
        bs, bits = progressive_encode_finish(self.codec, st,
                                             timing=local_phases)
        t1 = time.time()
        self._tadd("encode_finish_s", t1 - t0)
        with self._tlock:
            for k, v in local_phases.items():
                self.finish_phases[k] = self.finish_phases.get(k, 0.0) + v
        res: Dict[str, Any] = {"bitstreams": bs, "bits": bits,
                               "x": st["x"], "ckpts": st["auto_ckpts"]}
        if self.decode:
            out = progressive_decode_all(self.codec, bs, rems=self.rems,
                                         y_checkpoints=st["auto_ckpts"])
            # x_hat stays a device handle: callers sync once at the end
            res["x_hat"] = out["x_hat"]
            self._tadd("decode_s", time.time() - t1)
        return res

    def run(self, batches: Iterable[Any]) -> Iterator[Dict[str, Any]]:
        """Yield one result dict per input batch, in submission order.

        Each result: {"bitstreams", "bits", "x", "ckpts"} plus "x_hat"
        (device handle, [1+Q, B, H, W, 3]) when decode=True.
        """
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            futs = []
            for x in batches:
                while len(futs) >= self.max_in_flight:
                    yield futs.pop(0).result()
                t0 = time.time()
                st = progressive_encode_start(self.codec, x, self.q_list,
                                              rems=self.rems)
                self._tadd("encode_start_s", time.time() - t0)
                futs.append(ex.submit(self._host_stage, st))
            for f in futs:
                yield f.result()


def run_sweeps(codec: PICCodec, batches: Iterable[Any],
               q_list: Optional[Sequence[float]] = None,
               rems: bool = False, workers: int = 3,
               max_in_flight: Optional[int] = None) -> list:
    """One-shot convenience wrapper: list of SweepPipeline.run results."""
    pipe = SweepPipeline(codec, q_list, rems=rems, workers=workers,
                         max_in_flight=max_in_flight)
    return list(pipe.run(batches))
