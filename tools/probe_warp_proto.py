"""Prototype: per-group window fetch via in-kernel DMA (warp engine v2).

Measures a Pallas kernel that fetches one [WB, WROWS, 128] bf16 window per
GROUPxGROUP-pixel group (computed dynamic block coords, double-buffered
DMA) and applies separable filter weights in-kernel — the replacement for
ops/warp.py's ~45 ms XLA window materialization at 1080p.

Layout: V [hb, wb, WROWS, 128] bf16 — V[by, bx] holds source rows
8*by..8*by+WROWS of the 8-pixel block bx (FP=16 channels -> 128 lanes).
A window is V[by, bx:bx+WB]: both indices ride NON-tiled outer dims, so
dynamic offsets are legal (dynamic LANE offsets are rejected by Mosaic).

Usage: python tools/probe_warp_proto.py [GROUP ...]   (default 8 16 32)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

FP = 16           # padded channel count (lanes per pixel)
BLK = 128         # 8 px * FP


def make_kernel(group, b_batch):
    wb = group // 8 + 2          # window blocks across
    wrows = 8 * wb               # window rows
    npix = group * group

    def kernel(byx_ref, v_any, ly, lx, out, scr, sem):
        b = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, bi, k):
            g = bi * b_batch + k
            packed = byx_ref[g]
            by = jax.lax.div(packed, 4096)
            bx = jax.lax.rem(packed, 4096)
            return pltpu.make_async_copy(
                v_any.at[by, pl.ds(bx, wb)], scr.at[slot, k],
                sem.at[slot, k])

        @pl.when(b == 0)
        def _():
            for k in range(b_batch):
                dma(0, 0, k).start()

        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < n)
        def _():
            for k in range(b_batch):
                dma(jax.lax.rem(b + 1, 2), b + 1, k).start()

        yy = jax.lax.broadcasted_iota(jnp.int32, (npix, wrows), 1).astype(
            jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (npix, BLK), 1).astype(
            jnp.float32)
        xsub = jnp.floor(lane / FP)
        for k in range(b_batch):
            dma(slot, b, k).wait()
            lyv = ly[k, :]
            lxv = lx[k, :]
            wy = jnp.maximum(0.0, 1.0 - 0.5 * jnp.abs(lyv[:, None] - yy))
            s128 = jnp.zeros((npix, BLK), jnp.float32)
            for i in range(wb):
                win = scr[slot, k, i].astype(jnp.float32)  # [wrows, BLK]
                t = jnp.dot(wy, win, preferred_element_type=jnp.float32)
                xpos = xsub + (8.0 * i)
                wx = jnp.maximum(0.0,
                                 1.0 - 0.5 * jnp.abs(lxv[:, None] - xpos))
                s128 = s128 + t * wx
            acc = jnp.zeros((npix, FP), jnp.float32)
            for j in range(8):
                acc = acc + s128[:, j * FP:(j + 1) * FP]
            out[k, :, :] = acc

    return kernel, wb, wrows, npix


def run_case(group, b_batch=None):
    if b_batch is None:
        b_batch = 8  # block first dim must be divisible by 8
    kernel, wb, wrows, npix = make_kernel(group, b_batch)
    gy, gx = 1080 // group, 1920 // group
    G = gy * gx
    G -= G % b_batch
    hb, wbt = 137, 242
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(hb, wbt, wrows, BLK))
                    .astype(np.float32).astype(jnp.bfloat16))
    by = rng.integers(0, hb, G).astype(np.int32)
    bx = rng.integers(0, wbt - wb, G).astype(np.int32)
    byx = jnp.asarray(by * 4096 + bx)
    ly = jnp.asarray(rng.uniform(0, wrows, (G, npix)).astype(np.float32))
    lx = jnp.asarray(rng.uniform(0, wrows, (G, npix)).astype(np.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // b_batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((b_batch, npix), lambda g, byx: (g, 0)),
            pl.BlockSpec((b_batch, npix), lambda g, byx: (g, 0)),
        ],
        out_specs=pl.BlockSpec((b_batch, npix, FP),
                               lambda g, byx: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, b_batch, wb, wrows, BLK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, b_batch)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, npix, FP), jnp.float32),
    )
    run = jax.jit(lambda b, vv, a, c: fn(b, vv, a, c))
    out = jax.block_until_ready(run(byx, v, ly, lx))

    iters = 20

    @jax.jit
    def timed(b, vv, a, c):
        def body(carry, i):
            o = fn(b, vv, a + carry, c)
            return carry + 1e-3, jnp.sum(o[::97, ::7, 0])
        return jax.lax.scan(body, 0.0, jnp.arange(iters))[1]

    sums = jax.block_until_ready(timed(byx, v, ly, lx))
    assert len(set(np.asarray(sums).tolist())) > 1, "identical!"
    t0 = time.perf_counter()
    jax.block_until_ready(timed(byx, v, ly, lx))
    dt = (time.perf_counter() - t0) / iters * 1e3
    px = G * npix
    print(f"GROUP={group} B={b_batch}: {dt:.2f} ms for {G} windows "
          f"({px/1e6:.2f} Mpx, {dt*1e6/px:.1f} ns/px)")

    # correctness spot-check
    vn = np.asarray(v.astype(jnp.float32))
    on = np.asarray(out)
    for g in (0, G // 2):
        win = vn[by[g], bx[g]:bx[g] + wb]
        win = np.concatenate(list(win), axis=-1)
        win = win.reshape(wrows, wb * 8, FP)
        wy = np.maximum(0.0, 1.0 - 0.5 * np.abs(
            np.asarray(ly)[g][:, None] - np.arange(wrows)))
        t = np.einsum("py,yxf->pxf", wy, win)
        wx = np.maximum(0.0, 1.0 - 0.5 * np.abs(
            np.asarray(lx)[g][:, None] - np.arange(wb * 8)))
        want = np.einsum("pxf,px->pf", t, wx)
        err = np.abs(want - on[g]).max() / (np.abs(want).max() + 1e-6)
        print(f"  group {g}: rel err {err:.2e}")


def main():
    groups = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for g in groups:
        run_case(g)


if __name__ == "__main__":
    main()
