"""Probe: pallas brute-force with bigger ray blocks per grid step.

p1/p3/p7 showed the [8,128]-ray-block kernel is grid-overhead-bound
(~8us/step), not compute-bound, at flagship scene sizes. Variants:
  b8 / b32 / b64 / b128: block rows per grid step (separate in/out refs)
  pk32 / pk128: packed single-input [R, 9*128] layout (1 DMA per step)

Usage: python tools/probe_blocks.py b8 b64 ...
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tools.probe_kernel import make_rays, make_tris, scan_bench, N  # noqa: E402

_LANES = 128
F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7


def _mt_body(tris_ref, ox, oy, oz, dx, dy, dz, mt, ex):
    """Returns (t_best, prim_best) after the triangle loop."""
    n_tris = tris_ref.shape[0]

    def body(j, carry):
        t_best, p_best = carry
        row = tris_ref[pl.ds(j, 1), :]
        v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
        v1x, v1y, v1z = row[0, 3], row[0, 4], row[0, 5]
        v2x, v2y, v2z = row[0, 6], row[0, 7], row[0, 8]
        inst = row[0, 9]
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
              & (dist > F32_EPSILON) & (dist < mt) & (dist < t_best)
              & (inst >= 0.0) & (inst != ex))
        jf = j.astype(jnp.float32)
        return jnp.where(ok, dist, t_best), jnp.where(ok, jf, p_best)

    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32))
    return jax.lax.fori_loop(0, n_tris, body, init)


def _kernel_sep(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl,
                t_out, p_out):
    t, p = _mt_body(tris_ref, rox[:], roy[:], roz[:], rdx[:], rdy[:], rdz[:],
                    maxt[:], excl[:])
    t_out[:] = t
    p_out[:] = p


def bf_blocked(tris, ro, rd, max_t, excl, block_rows):
    n = ro.shape[0]
    rows = n // _LANES

    def prep(x):
        return x.reshape(rows, _LANES)

    args = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(max_t), prep(excl)]
    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    t, p = pl.pallas_call(
        _kernel_sep,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [spec] * 8,
        out_specs=[spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 2,
    )(jnp.pad(tris, ((0, 0), (0, 6))), *args)
    return t.reshape(-1), p.reshape(-1)


def _kernel_packed(tris_ref, rays_ref, t_out, p_out):
    L = _LANES
    ox = rays_ref[:, 0 * L:1 * L]
    oy = rays_ref[:, 1 * L:2 * L]
    oz = rays_ref[:, 2 * L:3 * L]
    dx = rays_ref[:, 3 * L:4 * L]
    dy = rays_ref[:, 4 * L:5 * L]
    dz = rays_ref[:, 5 * L:6 * L]
    mt = rays_ref[:, 6 * L:7 * L]
    ex = rays_ref[:, 7 * L:8 * L]
    t, p = _mt_body(tris_ref, ox, oy, oz, dx, dy, dz, mt, ex)
    t_out[:] = t
    p_out[:] = p


def bf_packed(tris, ro, rd, max_t, excl, block_rows):
    n = ro.shape[0]
    rows = n // _LANES
    packed = jnp.concatenate([
        x.reshape(rows, _LANES) for x in
        (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
         max_t, excl)], axis=1)  # [rows, 8*128]
    in_spec = pl.BlockSpec((block_rows, 8 * _LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, p = pl.pallas_call(
        _kernel_packed,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), in_spec],
        out_specs=[out_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 2,
    )(jnp.pad(tris, ((0, 0), (0, 6))), packed)
    return t.reshape(-1), p.reshape(-1)


def main():
    which = sys.argv[1:] or ["b8", "b32", "b64", "b128", "pk32", "pk128"]
    print("devices:", jax.devices())
    ro, rd = make_rays()
    ro = jnp.asarray(ro)
    rd = jnp.asarray(rd)
    maxt = jnp.full((N,), F32_MAX, jnp.float32)
    excl = jnp.full((N,), -1.0, jnp.float32)
    tris = jnp.asarray(make_tris(40))

    for name in which:
        if name.startswith("pk"):
            br = int(name[2:])
            fn = lambda ro_, br=br: jnp.sum(jnp.where(
                bf_packed(tris, ro_, rd, maxt, excl, br)[1] >= 0,
                bf_packed(tris, ro_, rd, maxt, excl, br)[0], 0.0))
            # avoid double call: compute once
            def fn(ro_, br=br):
                t, p = bf_packed(tris, ro_, rd, maxt, excl, br)
                return jnp.sum(jnp.where(p >= 0, t, 0.0))
        else:
            br = int(name[1:])
            def fn(ro_, br=br):
                t, p = bf_blocked(tris, ro_, rd, maxt, excl, br)
                return jnp.sum(jnp.where(p >= 0, t, 0.0))
        scan_bench(fn, ro, f"{name} rays/step={br*128}")


if __name__ == "__main__":
    main()
