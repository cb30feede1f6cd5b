"""Prototype: per-group window fetch via in-kernel DMA (warp engine v2).

Question: can a Pallas kernel fetch G ~32k per-group [24, 384] bf16 windows
(one DMA each, double-buffered) from a precomputed vertical-triple tensor
fast enough to beat the ~45 ms XLA window materialization in ops/warp.py?

Measures the DMA + weight-contraction loop at 1080p scale (G = 135*240).

Usage: python tools/probe_warp_proto.py
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

GROUP = 8
WINDOW = 24
FP = 16          # padded channel count (lanes per pixel)
LANES = WINDOW * FP  # 384


B = 8  # groups per grid step


def kernel(byx_ref, v_any, ly, lx, out, scr, sem):
    """Grid over batches of B groups; one [24, 384] window DMA per group,
    double-buffered across batches.

    byx_ref: [G, 2] i32 in SMEM (prefetched): block-row and x lane offset.
    v_any:   [HB, 24, WF] bf16 vertical-triple tensor (ANY/HBM).
    ly/lx:   [B, 64] f32 blocks (per-group local coords).
    out:     [B, 64, FP] f32 block.
    scr:     [2, B, 24, LANES] bf16; sem: [2, B] DMA semaphores.
    """
    b = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, bi, k):
        g = bi * B + k
        by = byx_ref[g, 0]
        xo = byx_ref[g, 1]
        return pltpu.make_async_copy(
            v_any.at[by, :, pl.ds(xo, LANES)], scr.at[slot, k],
            sem.at[slot, k])

    @pl.when(b == 0)
    def _():
        for k in range(B):
            dma(0, 0, k).start()

    slot = jax.lax.rem(b, 2)

    @pl.when(b + 1 < n)
    def _():
        for k in range(B):
            dma(jax.lax.rem(b + 1, 2), b + 1, k).start()

    yy = jax.lax.broadcasted_iota(jnp.float32, (64, WINDOW), 1)
    lane = jax.lax.broadcasted_iota(jnp.float32, (64, LANES), 1)
    xpos = jnp.floor(lane / FP)
    for k in range(B):
        dma(slot, b, k).wait()
        win = scr[slot, k].astype(jnp.float32)  # [24, LANES]
        lyv = ly[k, :]
        lxv = lx[k, :]
        wy = jnp.maximum(0.0, 1.0 - 0.5 * jnp.abs(lyv[:, None] - yy))
        t = jnp.dot(wy, win, preferred_element_type=jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - 0.5 * jnp.abs(lxv[:, None] - xpos))
        tw = t * wx
        acc = jnp.zeros((64, FP), jnp.float32)
        for i in range(WINDOW):
            acc = acc + tw[:, i * FP:(i + 1) * FP]
        out[k, :, :] = acc


def main():
    hb, wf = 137, 1920 * FP
    gy, gx = 135, 240
    G = gy * gx
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(hb, 24, wf)).astype(np.float32)
                    .astype(jnp.bfloat16))
    by = rng.integers(0, hb, G).astype(np.int32)
    xo = (rng.integers(0, 1920 - 24, G) * FP).astype(np.int32)
    byx = jnp.asarray(np.stack([by, xo], -1))
    ly = jnp.asarray(rng.uniform(0, 24, (G, 64)).astype(np.float32))
    lx = jnp.asarray(rng.uniform(0, 24, (G, 64)).astype(np.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((B, 64), lambda g, byx: (g, 0)),
            pl.BlockSpec((B, 64), lambda g, byx: (g, 0)),
        ],
        out_specs=pl.BlockSpec((B, 64, FP), lambda g, byx: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, 24, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(kernel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 64, FP), jnp.float32),
    )
    run = jax.jit(lambda b, vv, a, c: fn(b, vv, a, c))
    out = jax.block_until_ready(run(byx, v, ly, lx))
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = run(byx, v, ly, lx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"warp-window kernel: {dt:.3f} ms for G={G} "
          f"({dt*1e6/G:.0f} ns/group)")

    # correctness spot-check vs numpy for a few groups
    vn = np.asarray(v.astype(jnp.float32))
    on = np.asarray(out)
    for g in (0, 7, 12345):
        win = vn[by[g], :, xo[g]:xo[g] + LANES]
        yy = np.arange(24)
        wy = np.maximum(0.0, 1.0 - 0.5 * np.abs(
            np.asarray(ly)[g][:, None] - yy))
        t = wy @ win
        lane = np.arange(LANES)
        xpos = lane // FP
        wx = np.maximum(0.0, 1.0 - 0.5 * np.abs(
            np.asarray(lx)[g][:, None] - xpos))
        tw = t * wx
        want = tw.reshape(64, 24, FP).sum(1)
        err = np.abs(want - on[g]).max() / (np.abs(want).max() + 1e-6)
        print(f"  group {g}: rel err {err:.2e}")


if __name__ == "__main__":
    main()
