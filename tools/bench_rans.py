"""Microbenchmark of the native rANS coder on realistic Gaussian tables.

Measures encode/decode symbols/s on the single host core with the same
table geometry the codec uses (64 Gaussian scale tables + escape slot) and
a symbol distribution drawn from those scales. No JAX import — runs in ~s.

Usage: python tools/bench_rans.py [n_symbols]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from epic_tpu.entropy.coder import (RansCoder,  # noqa: E402
                                    pmf_to_quantized_cdf_batch)


def gaussian_tables(num_scales=64, smin=0.11, smax=256.0, tail=1e-9):
    scales = np.exp(np.linspace(np.log(smin), np.log(smax), num_scales))
    lmax = 0
    pmfs, lengths, offsets = [], [], []
    from math import erf, sqrt

    def cdf(x, s):
        return 0.5 * (1 + erf(x / (s * sqrt(2.0))))

    for s in scales:
        t = max(1, int(np.ceil(4 * s)))  # +-4 sigma support
        xs = np.arange(-t, t + 1)
        p = np.array([cdf(x + 0.5, s) - cdf(x - 0.5, s) for x in xs])
        p = np.maximum(p, tail)
        tm = max(2 * cdf(-t - 0.5, s), tail)
        # pmf_length real symbols + 1 tail/escape slot, quantized together
        # (mirrors entropy/gaussian.py:140-152)
        row = np.concatenate([p / (p.sum() + tm) * (1 - tm), [tm]])
        pmfs.append(row)
        lengths.append(len(xs))
        offsets.append(-t)
        lmax = max(lmax, len(xs))
    pm = np.zeros((num_scales, lmax + 1), np.float32)
    for i, p in enumerate(pmfs):
        pm[i, :len(p)] = p
    lengths = np.asarray(lengths, np.int32)
    cdfs = pmf_to_quantized_cdf_batch(pm, lengths + 1)
    return (cdfs, lengths + 2, np.asarray(offsets, np.int32),
            np.asarray(scales))


def main(n=4_000_000):
    cdfs, cdf_lengths, offsets, scales = gaussian_tables()
    rng = np.random.default_rng(0)
    # scale-index distribution like a trained codec: mostly small scales
    idx = np.clip(rng.geometric(0.15, n) - 1, 0, 63).astype(np.int32)
    sym = np.round(rng.normal(0, scales[idx])).astype(np.int32)

    coder = RansCoder(cdfs, cdf_lengths, offsets)
    nmsg = 16
    lens = [n // nmsg] * nmsg
    lens[-1] += n - sum(lens)

    t0 = time.perf_counter()
    blobs = coder.encode_batch(sym, idx, lens)
    t_enc = time.perf_counter() - t0
    nbytes = sum(len(b) for b in blobs)
    t0 = time.perf_counter()
    out = coder.decode_batch(blobs, idx, lens)
    t_dec = time.perf_counter() - t0
    assert np.array_equal(out, sym)
    bits = nbytes * 8 / n
    print(f"n={n} enc {n/t_enc/1e6:.2f} Msym/s  dec {n/t_dec/1e6:.2f} "
          f"Msym/s  ({bits:.3f} bits/sym, lut={'yes' if getattr(coder, '_lut', None) is not None else 'no'})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000)
