"""Prototype probe for the tile-cull trace engine's risky Pallas pieces.

Validates on the real TPU (and CPU interpret mode):
  1. in-kernel double-buffered `pltpu.make_async_copy` from an ANY-space
     triangle table with a *dynamically computed* row base (pl.ds),
  2. scalar reads of an int32 cluster list held in VMEM,
  3. a dynamic fori_loop trip count per grid step,
and measures the per-(ray, tri) cost of the resulting block intersector so
the cull engine's cluster size can be chosen from data.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7

CLUSTER = 64       # triangle rows per DMA block
CAP = 128          # max clusters per tile
ROWS = 8           # ray block rows (8 x 128 = 1024 rays per tile)
LANES = 128


def _kernel(list_ref, count_ref, tris_any, rox, roy, roz, rdx, rdy, rdz,
            t_out, p_out, scratch, sems):
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    n = count_ref[0, 0, 0]

    def dma(slot, j):
        cid = list_ref[0, 0, j]
        # table rows pack 8 triangles x 16 floats = 128 lanes; a cluster of
        # CLUSTER tris = CLUSTER // 8 full rows (lane-aligned DMA)
        base = cid * (CLUSTER // 8)
        return pltpu.make_async_copy(
            tris_any.at[pl.ds(base, CLUSTER // 8), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    def body(j, carry):
        t_best, p_best = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()

        dma(slot, j).wait()

        def row_body(r, c2):
            row = scratch[pl.ds(slot, 1), pl.ds(r, 1), :]

            def one_tri(o, c3):
                tb, pb = c3
                v0x, v0y, v0z = row[0, 0, o], row[0, 0, o + 1], row[0, 0, o + 2]
                v1x, v1y, v1z = row[0, 0, o + 3], row[0, 0, o + 4], row[0, 0, o + 5]
                v2x, v2y, v2z = row[0, 0, o + 6], row[0, 0, o + 7], row[0, 0, o + 8]
                inst = row[0, 0, o + 9]
                prim = row[0, 0, o + 10]
                abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
                acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
                ux = dy * acz - dz * acy
                uy = dz * acx - dx * acz
                uz = dx * acy - dy * acx
                det = abx * ux + aby * uy + abz * uz
                inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0, 1.0 / det)
                aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
                u = (aox * ux + aoy * uy + aoz * uz) * inv_det
                vx = aoy * abz - aoz * aby
                vy = aoz * abx - aox * abz
                vz = aox * aby - aoy * abx
                v = (dx * vx + dy * vy + dz * vz) * inv_det
                dist = (acx * vx + acy * vy + acz * vz) * inv_det
                ok = ((jnp.abs(det) >= F32_EPSILON)
                      & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (dist > F32_EPSILON) & (dist < tb)
                      & (inst >= 0.0))
                return (jnp.where(ok, dist, tb), jnp.where(ok, prim, pb))

            for o in range(0, 128, 16):  # 8 triangles per row, static offsets
                c2 = one_tri(o, c2)
            return c2

        return jax.lax.fori_loop(0, CLUSTER // 8, row_body, (t_best, p_best))

    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32))
    t_best, p_best = jax.lax.fori_loop(0, n, body, init)
    t_out[:] = t_best
    p_out[:] = p_best


def run(tris_padded, lists, counts, rays, interpret=False):
    tiles = lists.shape[0]
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, CAP), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ] + [ray_spec] * 6,
        out_specs=[ray_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, CLUSTER // 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(lists[:, None, :], counts[:, :, None], tris_padded, *rays)
    return out


def main():
    rng = np.random.default_rng(0)
    C = 256                      # clusters
    tiles = 64
    P = C * CLUSTER
    tris = np.zeros((P, 16), np.float32)  # packed to [P//8, 128] below
    # random small triangles in [0,10]^3
    base = rng.uniform(0, 10, (P, 3)).astype(np.float32)
    tris[:, 0:3] = base
    tris[:, 3:6] = base + rng.uniform(0.05, 0.3, (P, 3))
    tris[:, 6:9] = base + rng.uniform(0.05, 0.3, (P, 3))
    tris[:, 9] = 1.0   # instance
    tris[:, 10] = np.arange(P)

    lists = np.zeros((tiles, CAP), np.int32)
    counts = np.zeros((tiles, 1), np.int32)
    for i in range(tiles):
        n = rng.integers(4, CAP)
        counts[i, 0] = n
        lists[i, :n] = rng.choice(C, n, replace=False)

    n_rays = tiles * ROWS * LANES
    ro = np.full((n_rays, 3), [5, 5, -5], np.float32)
    rd = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rays = [ro[:, 0].reshape(tiles * ROWS, LANES),
            ro[:, 1].reshape(tiles * ROWS, LANES),
            ro[:, 2].reshape(tiles * ROWS, LANES),
            rd[:, 0].reshape(tiles * ROWS, LANES),
            rd[:, 1].reshape(tiles * ROWS, LANES),
            rd[:, 2].reshape(tiles * ROWS, LANES)]
    rays = [jnp.asarray(r) for r in rays]
    tris_j = jnp.asarray(tris.reshape(P // 8, 128))
    lists_j = jnp.asarray(lists)
    counts_j = jnp.asarray(counts)

    t, p = run(tris_j, lists_j, counts_j, rays)
    t = np.asarray(t)
    p = np.asarray(p)

    # oracle: numpy brute force over each tile's listed clusters
    from hikari_tpu.ops.trace import intersect_triangle

    errs = 0
    for i in range(0, tiles, 7):
        cid = lists[i, :counts[i, 0]]
        rowsel = np.concatenate([np.arange(c * CLUSTER, (c + 1) * CLUSTER)
                                 for c in cid])
        tsel = tris[rowsel]
        r0 = i * ROWS * LANES
        ros = ro[r0:r0 + 40]
        rds = rd[r0:r0 + 40]
        tt, _, _ = intersect_triangle(
            jnp.asarray(ros)[:, None, :], jnp.asarray(rds)[:, None, :],
            jnp.asarray(tsel[None, :, 0:3]), jnp.asarray(tsel[None, :, 3:6]),
            jnp.asarray(tsel[None, :, 6:9]))
        tbest = np.asarray(tt).min(axis=1)
        got = t.reshape(tiles, ROWS * LANES)[i, :40]
        if not np.allclose(np.minimum(tbest, F32_MAX), got, rtol=1e-4):
            bad = np.abs(tbest - got) > 1e-3 * np.maximum(1, np.abs(tbest))
            errs += bad.sum()
    print("correctness errors:", errs)

    # timing: scan-in-jit with evolving origins
    @jax.jit
    def bench(rays0):
        def step(carry, _):
            rs = carry
            t, p = run(tris_j, lists_j, counts_j, rs)
            rs2 = [r + 1e-3 * t.reshape(r.shape)[..., :1] * 0 + 1e-3
                   if k < 3 else r for k, r in enumerate(rs)]
            rs2[0] = rs[0] + 1e-3 + 1e-6 * t.reshape(rs[0].shape)
            return rs2, t[0, 0]
        _, ts = jax.lax.scan(step, rays0, None, length=20)
        return ts

    ts = bench(rays)
    ts.block_until_ready()
    t0 = time.perf_counter()
    ts = bench(rays)
    ts.block_until_ready()
    dt = (time.perf_counter() - t0) / 20
    pairs = counts.sum() * CLUSTER * ROWS * LANES
    print(f"per dispatch: {dt*1e3:.3f} ms, pairs={pairs/1e6:.1f}M, "
          f"{dt/pairs*1e9:.4f} ns/pair, "
          f"{dt / (tiles*ROWS*LANES) * 1e9:.1f} ns/ray")


if __name__ == "__main__":
    main()
