"""Measure the tunnel cost model for the base-chain fusion design.

The r4 profile shows the codec's interleaved base chain pays ~30 ms per
PROGRAM LAUNCH (base_params/base_sym/base_finish are ~tiny-FLOP programs
measured at ~29-30 ms each). The candidate fix is ONE scanned program
with the per-slice host rANS as an ordered io_callback. Whether that
wins depends on what a callback round trip costs vs a launch on this
tunneled runtime — this probe measures both:

  A. N separate tiny-program launches (today's structure)
  B. one lax.scan program with N ordered io_callbacks of the same payload
  C. pure D2H/H2D transfer of the payload (floor)

Usage: timeout 600 python tools/probe_io_callback.py [--n 10] [--iters 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10, help="chain length")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--shape", type=int, nargs=4, default=[4, 48, 32, 32])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")
    shape = tuple(args.shape)
    n = args.n

    x = jnp.ones(shape, jnp.float32)

    # --- A: N separate tiny launches (blocking chain like the decoder) ---
    @jax.jit
    def tiny(a, s):
        return a * 1.0001 + s.astype(jnp.float32), (a > 0).astype(jnp.int8)

    s0 = jnp.zeros(shape, jnp.int16)
    tiny(x, s0)[0].block_until_ready()  # compile
    for trial in range(args.iters):
        t0 = time.time()
        a = x
        for i in range(n):
            a, idx = tiny(a, s0)
            idx_np = np.asarray(jax.device_get(idx))      # D2H int8
            s_np = (idx_np.astype(np.int16) + i)          # host "rANS"
            s0 = jnp.asarray(s_np)                        # H2D int16
        a.block_until_ready()
        print(f"A launch-chain     n={n}: {time.time()-t0:.4f}s")

    # --- B: one scanned program with ordered io_callbacks ---
    calls = []

    def cb(i, idx, sym):
        calls.append(int(i))
        return np.asarray(sym)  # host no-op (enc/sim mode analog)

    from jax.experimental import io_callback

    @jax.jit
    def chain(a0):
        def body(a, i):
            idx = (a > 0).astype(jnp.int8)
            sym = (a.astype(jnp.int16))
            sym = io_callback(
                cb, jax.ShapeDtypeStruct(shape, jnp.int16),
                i, idx, sym, ordered=True)
            a = a * 1.0001 + sym.astype(jnp.float32)
            return a, ()
        a, _ = jax.lax.scan(body, a0, jnp.arange(n, dtype=jnp.int32))
        return a

    try:
        chain(x).block_until_ready()  # compile
        for trial in range(args.iters):
            calls.clear()
            t0 = time.time()
            chain(x).block_until_ready()
            print(f"B io_callback-scan n={n}: {time.time()-t0:.4f}s "
                  f"(callbacks fired: {len(calls)}, ordered "
                  f"{calls == sorted(calls)})")
    except Exception as e:
        print(f"B io_callback-scan FAILED: {type(e).__name__}: {e}")

    # --- C: raw transfer floor ---
    idx8 = jnp.zeros(shape, jnp.int8)
    s16 = np.zeros(shape, np.int16)
    jax.device_get(idx8)
    for trial in range(args.iters):
        t0 = time.time()
        for i in range(n):
            _ = np.asarray(jax.device_get(idx8))
            _ = jnp.asarray(s16).block_until_ready()
        print(f"C transfer-floor   n={n}: {time.time()-t0:.4f}s "
              f"({(np.prod(shape) * 3 * n) / 1e6:.1f} MB total)")

    # --- D: single launch, no callback (launch floor) ---
    @jax.jit
    def chain_pure(a0):
        def body(a, i):
            a = a * 1.0001 + 1.0
            return a, ()
        a, _ = jax.lax.scan(body, a0, jnp.arange(n, dtype=jnp.int32))
        return a

    chain_pure(x).block_until_ready()
    for trial in range(args.iters):
        t0 = time.time()
        chain_pure(x).block_until_ready()
        print(f"D single-launch    n={n}: {time.time()-t0:.4f}s")


if __name__ == "__main__":
    main()
