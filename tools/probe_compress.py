"""Micro-benchmark: checkerboard compress formulations at 1080p.

Variants: gather (int-index), lane-strided lax.slice, reshape-pair.
Also resample_deferred-style full-plane parity decimation.

Usage: python tools/probe_compress.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_PLANES = 7  # the flagship compresses ~7 planes per frame


def scan_bench(fn, x0, p0, name):
    @jax.jit
    def run(x, p):
        def body(c, i):
            return c + 1e-6, jnp.sum(fn(x + c, p))
        _, css = jax.lax.scan(body, 0.0, jnp.arange(10))
        return css

    css = jax.block_until_ready(run(x0, p0))
    assert len(set(np.asarray(css).tolist())) > 1
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0, p0))
    dt = (time.perf_counter() - t0) / 10
    print(f"  {name}: {dt*1e3:.2f} ms")


def row_even(par, h, tail):
    rowpar = (jnp.arange(h, dtype=jnp.int32) + par) % 2
    return (rowpar == 0).reshape((h, 1) + (1,) * tail)


def compress_gather(x, par):
    h, w = x.shape[:2]
    even = x[:, 0::2]
    odd = x[:, 1::2]
    return jnp.where(row_even(par, h, x.ndim - 2), even, odd)


def compress_slice(x, par):
    h, w = x.shape[:2]
    tail = x.shape[2:]
    strides = (1, 2) + (1,) * len(tail)
    even = jax.lax.slice(x, (0, 0) + (0,) * len(tail), (h, w - 1) + tail,
                         strides)
    odd = jax.lax.slice(x, (0, 1) + (0,) * len(tail), (h, w) + tail, strides)
    return jnp.where(row_even(par, h, x.ndim - 2), even, odd)


def compress_reshape(x, par):
    h, w = x.shape[:2]
    tail = x.shape[2:]
    pairs = x.reshape((h, w // 2, 2) + tail)
    even = pairs[:, :, 0]
    odd = pairs[:, :, 1]
    return jnp.where(row_even(par, h, x.ndim - 2), even, odd)


def main():
    rng = np.random.default_rng(0)
    par0 = jnp.int32(1)
    for c in (4, 1):
        shape = (1080, 1920, c) if c > 1 else (1080, 1920)
        x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        print(f"plane [{','.join(map(str, shape))}] x{N_PLANES}:")
        for name, fn in (("gather", compress_gather),
                         ("slice", compress_slice),
                         ("reshape", compress_reshape)):
            def many(x, p, fn=fn):
                return sum(jnp.sum(fn(x + i * 1e-7, p))
                           for i in range(N_PLANES))
            scan_bench(many, x0, par0, name)


if __name__ == "__main__":
    main()
