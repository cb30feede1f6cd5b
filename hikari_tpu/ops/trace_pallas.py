"""Pallas brute-force ray-triangle intersector.

The XLA formulation of the brute-force trace costs ~40ns/ray for a 40-tri
scene (intermediate materialization between scan tiles). This kernel keeps a
[8,128] ray tile in registers/VMEM and streams every triangle over it inside
one fused loop — the whole intersection never touches HBM. Triangles (rows
of tri_pos_flat: 9 vertex floats + instance id) live in VMEM, so this engine
serves scenes up to a few thousand triangles (the cornell/minimal/simple
benchmark class); bigger scenes use the lockstep BVH engine.

Avoids tpu.dynamic_gather (broken on this environment's terminal compiler):
the only dynamic access is a `pl.ds` row slice of the triangle table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7

_LANES = 128
# Rows of 128 rays per grid step. Measured (tools/probe_blocks.py): the
# per-grid-step fixed overhead is ~8us on this TPU, so [8,128] blocks are
# overhead-bound (16 ms for 2.07M rays x 40 tris) while [128,128] blocks are
# compute-bound (5.2 ms). VMEM per step at 128 rows: ~0.7 MB + tables.
_BLOCK_ROWS = 128
_TILE = _LANES * _BLOCK_ROWS  # rays per grid step


def _kernel_full(tris_ref, attr_ref, rox, roy, roz, rdx, rdy, rdz, maxt,
                 excl, incl, t_out, prim_out, nx_out, ny_out, nz_out,
                 uvx_out, uvy_out, mat_out, inst_out):
    """Intersection + in-loop attribute interpolation: the winning
    triangle's vertex normals/uvs are in scalar registers when it wins, so
    hit attributes (light.wgsl:496-523) cost nothing extra — no post-trace
    table lookup at all."""
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    inc = incl[:]
    n_tris = tris_ref.shape[0]

    def body(j, carry):
        (t_best, p_best, nxb, nyb, nzb, uvxb, uvyb, matb, instb) = carry
        row = tris_ref[pl.ds(j, 1), :]
        v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
        v1x, v1y, v1z = row[0, 3], row[0, 4], row[0, 5]
        v2x, v2y, v2z = row[0, 6], row[0, 7], row[0, 8]
        inst = row[0, 9]
        a = attr_ref[pl.ds(j, 1), :]  # normals 0:9, uvs 9:15, inst 15, mat 16

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

        ok = (
            (jnp.abs(det) >= F32_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (dist > F32_EPSILON)
            & (dist < mt)
            & (dist < t_best)
            & (inst >= 0.0)
            & (inst != ex)
            & ((inc < 0.0) | (inst == inc))
        )
        # interpolate attributes with this triangle's (u, v)
        nx = a[0, 0] + u * (a[0, 3] - a[0, 0]) + v * (a[0, 6] - a[0, 0])
        ny = a[0, 1] + u * (a[0, 4] - a[0, 1]) + v * (a[0, 7] - a[0, 1])
        nz = a[0, 2] + u * (a[0, 5] - a[0, 2]) + v * (a[0, 8] - a[0, 2])
        uvx = a[0, 9] + u * (a[0, 11] - a[0, 9]) + v * (a[0, 13] - a[0, 9])
        uvy = a[0, 10] + u * (a[0, 12] - a[0, 10]) + v * (a[0, 14] - a[0, 10])
        jf = j.astype(jnp.float32)
        return (jnp.where(ok, dist, t_best), jnp.where(ok, jf, p_best),
                jnp.where(ok, nx, nxb), jnp.where(ok, ny, nyb),
                jnp.where(ok, nz, nzb), jnp.where(ok, uvx, uvxb),
                jnp.where(ok, uvy, uvyb), jnp.where(ok, a[0, 16], matb),
                jnp.where(ok, inst, instb))

    z = jnp.zeros(ox.shape, jnp.float32)
    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32), z, z, z, z, z, z,
            jnp.full(ox.shape, -1.0, jnp.float32))
    t_best, p_best, nx, ny, nz, uvx, uvy, mat, inst_b = jax.lax.fori_loop(
        0, n_tris, body, init)
    t_out[:] = t_best
    prim_out[:] = p_best
    nx_out[:] = nx
    ny_out[:] = ny
    nz_out[:] = nz
    uvx_out[:] = uvx
    uvy_out[:] = uvy
    mat_out[:] = mat
    inst_out[:] = inst_b


def _kernel(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl, incl,
            t_out, u_out, v_out, prim_out, inst_out):
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    inc = incl[:]

    n_tris = tris_ref.shape[0]

    def body(j, carry):
        t_best, u_best, v_best, p_best, i_best = carry
        row = tris_ref[pl.ds(j, 1), :]  # [1, 10]
        v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
        v1x, v1y, v1z = row[0, 3], row[0, 4], row[0, 5]
        v2x, v2y, v2z = row[0, 6], row[0, 7], row[0, 8]
        inst = row[0, 9]

        abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
        acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
        # u_vec = rd x ac
        ux = dy * acz - dz * acy
        uy = dz * acx - dx * acz
        uz = dx * acy - dy * acx
        det = abx * ux + aby * uy + abz * uz
        inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0, 1.0 / det)
        aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
        u = (aox * ux + aoy * uy + aoz * uz) * inv_det
        # v_vec = ao x ab
        vx = aoy * abz - aoz * aby
        vy = aoz * abx - aox * abz
        vz = aox * aby - aoy * abx
        v = (dx * vx + dy * vy + dz * vz) * inv_det
        dist = (acx * vx + acy * vy + acz * vz) * inv_det

        ok = (
            (jnp.abs(det) >= F32_EPSILON)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (dist > F32_EPSILON)
            & (dist < mt)
            & (dist < t_best)
            & (inst >= 0.0)
            & (inst != ex)
            & ((inc < 0.0) | (inst == inc))
        )
        jf = j.astype(jnp.float32)
        return (jnp.where(ok, dist, t_best), jnp.where(ok, u, u_best),
                jnp.where(ok, v, v_best), jnp.where(ok, jf, p_best),
                jnp.where(ok, inst, i_best))

    init = (
        jnp.full(ox.shape, F32_MAX, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.full(ox.shape, -1.0, jnp.float32),
        jnp.full(ox.shape, -1.0, jnp.float32),
    )
    t_best, u_best, v_best, p_best, i_best = jax.lax.fori_loop(
        0, n_tris, body, init)
    t_out[:] = t_best
    u_out[:] = u_best
    v_out[:] = v_best
    prim_out[:] = p_best
    inst_out[:] = i_best


@partial(jax.jit, static_argnames=("interpret",))
def pallas_brute_force_full(tris, attrs, ro, rd, max_t, exclude_instance,
                            include_instance, interpret: bool = False):
    """Fused intersect + hit-info. Returns the hit_info dict contract
    (position/normal/uv/instance/material) plus t/prim."""
    DISTANCE_MAX = 65535.0
    n = ro.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    rows = n_pad // _LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(rows, _LANES)

    args = [
        prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
        prep(rd[:, 0], 1.0), prep(rd[:, 1]), prep(rd[:, 2]),
        prep(max_t, 0.0),
        prep(exclude_instance.astype(jnp.float32), -1.0),
        prep(include_instance.astype(jnp.float32), -1.0),
    ]
    grid = rows // _BLOCK_ROWS
    ray_spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    p = tris.shape[0]
    outs = pl.pallas_call(
        _kernel_full,
        interpret=interpret,
        grid=(grid,),
        in_specs=[pl.BlockSpec((p, 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p, 24), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 9,
        out_specs=[ray_spec] * 9,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 9,
    )(jnp.pad(tris, ((0, 0), (0, 6))), jnp.pad(attrs, ((0, 0), (0, 7))),
      *args)

    t, pbest, nx, ny, nz, uvx, uvy, mat, inst_f = [
        o.reshape(-1)[:n] for o in outs]
    prim = jnp.round(pbest).astype(jnp.int32)
    miss = prim < 0
    tt = jnp.where(miss, DISTANCE_MAX, t)
    pos = ro + rd * tt[:, None]
    normal = jnp.stack([nx, ny, nz], -1)
    from hikari_tpu.utils.math import dot3

    normal = normal * jax.lax.rsqrt(
        jnp.maximum(dot3(normal, normal), 1e-20))[:, None]
    instance = jnp.round(inst_f).astype(jnp.int32)
    return {
        "t": jnp.where(miss, F32_MAX, t),
        "prim": prim,
        "instance": instance,
        "position": jnp.concatenate(
            [pos, jnp.where(miss, 0.0, 1.0)[:, None]], -1),
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "uv": jnp.where(miss[:, None], 0.0, jnp.stack([uvx, uvy], -1)),
        "material": jnp.where(miss, -1, jnp.round(mat).astype(jnp.int32)),
    }


def _kernel_shadow(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl, incl,
                   t_out, inst_out):
    """Occlusion (shadow-ray) intersector: division-free Möller-Trumbore.

    Shadow consumers (occlude_hit_info, light.wgsl:526-533) need only
    (hit t, hit instance) — no barycentrics, no attributes. All conditions
    are tested in |det|-multiplied form and the closest-t comparison is done
    by cross-multiplication, so the per-triangle loop has no divide and only
    three carried values; the single divide happens once per ray at the end.
    """
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    inc = incl[:]
    n_tris = tris_ref.shape[0]

    def body(j, carry):
        td_best, ads_best, inst_best = carry
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
        s = jnp.sign(det)
        ads = det * s  # |det|
        aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
        ud = (aox * ux + aoy * uy + aoz * uz) * s
        vx = aoy * abz - aoz * aby
        vy = aoz * abx - aox * abz
        vz = aox * aby - aoy * abx
        vd = (dx * vx + dy * vy + dz * vz) * s
        td = (acx * vx + acy * vy + acz * vz) * s
        ok = (
            (ads >= F32_EPSILON)
            & (ud >= 0.0) & (vd >= 0.0) & (ud + vd <= ads)
            & (td > F32_EPSILON * ads)
            & (td < mt * ads)
            & (td * ads_best < td_best * ads)  # t < t_best, cross-multiplied
            & (inst >= 0.0)
            & (inst != ex)
            & ((inc < 0.0) | (inst == inc))
        )
        return (jnp.where(ok, td, td_best), jnp.where(ok, ads, ads_best),
                jnp.where(ok, inst, inst_best))

    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.ones(ox.shape, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32))
    td, ads, inst = jax.lax.fori_loop(0, n_tris, body, init)
    t_out[:] = jnp.where(inst >= 0.0, td / ads, F32_MAX)
    inst_out[:] = inst


@partial(jax.jit, static_argnames=("interpret",))
def pallas_shadow(tris, ro, rd, max_t, exclude_instance, include_instance,
                  interpret: bool = False):
    """Shadow/occlusion trace: returns {t, instance, u, v, prim} with
    u/v/prim zero/-1 placeholders (occlusion consumers never read them)."""
    n = ro.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    rows = n_pad // _LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(rows, _LANES)

    args = [
        prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
        prep(rd[:, 0], 1.0), prep(rd[:, 1]), prep(rd[:, 2]),
        prep(max_t, 0.0),
        prep(exclude_instance.astype(jnp.float32), -1.0),
        prep(include_instance.astype(jnp.float32), -1.0),
    ]
    ray_spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, inst = pl.pallas_call(
        _kernel_shadow,
        interpret=interpret,
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 9,
        out_specs=[ray_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 2,
    )(jnp.pad(tris, ((0, 0), (0, 6))), *args)
    t = t.reshape(-1)[:n]
    inst = jnp.round(inst.reshape(-1)[:n]).astype(jnp.int32)
    miss = inst < 0
    return {
        "t": jnp.where(miss, F32_MAX, t),
        "u": jnp.zeros((n,), jnp.float32),
        "v": jnp.zeros((n,), jnp.float32),
        "prim": jnp.full((n,), -1, jnp.int32),
        "instance": inst,
    }


@partial(jax.jit, static_argnames=("interpret",))
def pallas_brute_force(tris, ro, rd, max_t, exclude_instance,
                       include_instance, interpret: bool = False):
    """tris: [P, 10] f32 (tri_pos_flat). ro/rd [N,3]. Returns hit dict."""
    n = ro.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    rows = n_pad // _LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return x.reshape(rows, _LANES)

    args = [
        prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
        prep(rd[:, 0], 1.0), prep(rd[:, 1]), prep(rd[:, 2]),
        prep(max_t, 0.0),
        prep(exclude_instance.astype(jnp.float32), -1.0),
        prep(include_instance.astype(jnp.float32), -1.0),
    ]
    grid = rows // _BLOCK_ROWS
    ray_spec = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 5
    t, u, v, p, inst = pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 9,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
    )(jnp.pad(tris, ((0, 0), (0, 6))), *args)

    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    prim = jnp.round(p.reshape(-1)[:n]).astype(jnp.int32)
    return {
        "t": jnp.where(prim < 0, F32_MAX, t),
        "u": u,
        "v": v,
        "prim": prim,
        "instance": jnp.round(inst.reshape(-1)[:n]).astype(jnp.int32),
    }
