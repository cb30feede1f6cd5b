"""Micro-benchmark: small-table per-element lookup strategies at 2M indices.

Candidates:
  sweep   — current table_gather select sweep (T jnp.where ops)
  onehot  — one-hot [N,T] matmul against the [T,C] table on the MXU
  onehot_hi — same with Precision.HIGHEST (exact f32)
  xla     — plain row gather table[idx]

Usage: python tools/probe_gather.py [T ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hikari_tpu.utils.math import table_gather  # noqa: E402

N = 1920 * 1080
STEPS = 10


def scan_bench(fn, x0, name):
    @jax.jit
    def run(x):
        def body(c, i):
            return c + 1, fn(c)
        _, css = jax.lax.scan(body, x, jnp.arange(STEPS))
        return css

    css = jax.block_until_ready(run(x0))
    assert len(set(np.asarray(css).tolist())) > 1, f"{name}: identical!"
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"  {name}: {dt*1e3:.2f} ms")


def onehot_gather(table, idx, precision):
    t, c = table.shape
    oh = (idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :]).astype(
        table.dtype)
    return jnp.dot(oh, table, precision=precision)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 40, 64, 256, 1024]
    rng = np.random.default_rng(0)
    for t in sizes:
        print(f"T={t}, C=16, N=2.07M:")
        table = jnp.asarray(rng.uniform(-1e3, 1e3, (t, 16)).astype(np.float32))
        idx0 = jnp.asarray(rng.integers(0, t, N).astype(np.int32))

        # correctness first (vs numpy)
        want = np.asarray(table)[np.asarray(idx0)]
        got_hi = np.asarray(onehot_gather(table, idx0,
                                          jax.lax.Precision.HIGHEST))
        err_hi = np.abs(got_hi - want).max()
        got_def = np.asarray(onehot_gather(table, idx0, None))
        err_def = np.abs(got_def - want).max()
        print(f"  onehot max err: HIGHEST={err_hi:.3e} default={err_def:.3e}")

        scan_bench(lambda i: jnp.sum(table_gather(table, i % t, small_max=4096)
                                     if t <= 4096 else table[i % t]),
                   idx0, "sweep")
        scan_bench(lambda i: jnp.sum(onehot_gather(table, i % t,
                                                   jax.lax.Precision.HIGHEST)),
                   idx0, "onehot_hi")
        scan_bench(lambda i: jnp.sum(onehot_gather(table, i % t, None)),
                   idx0, "onehot_def")
        scan_bench(lambda i: jnp.sum(table[i % t]), idx0, "xla gather")


if __name__ == "__main__":
    main()
