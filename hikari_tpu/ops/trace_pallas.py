"""Pallas brute-force ray-triangle intersector (small-scene flagship engine).

The XLA formulation of the brute-force trace costs ~40 ns/ray for a 40-tri
scene (intermediate materialization between scan tiles). These kernels keep
a [128,128] ray tile in VMEM and stream every triangle over it in one fused
loop — the intersection never touches HBM.

Triangle layout: 8 triangles packed per 128-lane row (16 f32 fields each),
the same layout as the large-scene cull engine (models/clusters.py). The
inner loop loads one full row and unrolls the 8 triangles with STATIC lane
offsets — measured ~0.046 ns per (ray, triangle) pair on v5e, ~6.7x the
per-triangle scalar-load formulation this replaces (the scalar loads could
not be software-pipelined by Mosaic; full-row vector loads can).

Semantics: Möller-Trumbore per light.wgsl:364-398 with the exclude/include
instance masks of light.wgsl:459,682-687. Serves scenes up to a few
thousand triangles (the cornell/minimal/simple benchmark class); larger
scenes use the tile-cull engine (ops/trace_cull.py).

Avoids tpu.dynamic_gather (broken on this environment's terminal compiler):
the only dynamic access is a `pl.ds` full-width row slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7
DISTANCE_MAX = 65535.0

_LANES = 128
# Rows of 128 rays per grid step. Measured (tools/probe_blocks.py): the
# per-grid-step fixed overhead is ~8us on this TPU, so [8,128] blocks are
# overhead-bound while [128,128] blocks are compute-bound.
_BLOCK_ROWS = 128
_TILE = _LANES * _BLOCK_ROWS  # rays per grid step


def _pack8(table, width=16):
    """[P, C<=width] -> [ceil(P/8), 8*width lanes] with degenerate padding
    rows (instance -1 never intersects)."""
    p, c = table.shape
    rows = max(8, -(-p // 8) * 8)
    pad = jnp.full((rows - p, c), 0.0, table.dtype)
    t = jnp.concatenate([table, pad], axis=0) if rows > p else table
    if c < width:
        fill = jnp.zeros((rows, width - c), table.dtype)
        if c == 10:  # pos rows: col 9 is instance; padding must stay -1
            t = t.at[p:, 9].set(-1.0)
        t = jnp.concatenate([t, fill], axis=1)
    return t.reshape(rows // 8, 8 * width)


def _mt8(row, o, ox, oy, oz, dx, dy, dz):
    """Möller-Trumbore for the triangle at static lane offset o of a packed
    row. Returns (dist, u, v, inst, geo_valid)."""
    v0x, v0y, v0z = row[0, o], row[0, o + 1], row[0, o + 2]
    v1x, v1y, v1z = row[0, o + 3], row[0, o + 4], row[0, o + 5]
    v2x, v2y, v2z = row[0, o + 6], row[0, o + 7], row[0, o + 8]
    inst = row[0, o + 9]
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
    valid = ((jnp.abs(det) >= F32_EPSILON)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (dist > F32_EPSILON))
    return dist, u, v, inst, valid


def _kernel_full(tris_ref, attr_ref, rox, roy, roz, rdx, rdy, rdz, maxt,
                 excl, incl, t_out, prim_out, nx_out, ny_out, nz_out,
                 uvx_out, uvy_out, mat_out, inst_out):
    """Intersection + in-loop attribute interpolation: the winning
    triangle's vertex normals/uvs are live when it wins, so hit attributes
    (light.wgsl:496-523) cost no post-trace table lookup."""
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    inc = incl[:]
    n_rows = tris_ref.shape[0]

    def body(r, carry):
        row = tris_ref[pl.ds(r, 1), :]
        arow = attr_ref[pl.ds(r, 1), :]
        rf = r.astype(jnp.float32)
        for k in range(8):
            o = k * 16
            (t_best, p_best, nxb, nyb, nzb, uvxb, uvyb, matb, instb) = carry
            dist, u, v, inst, valid = _mt8(row, o, ox, oy, oz, dx, dy, dz)
            ok = (valid & (dist < mt) & (dist < t_best)
                  & (inst >= 0.0) & (inst != ex)
                  & ((inc < 0.0) | (inst == inc)))
            # attr row per tri: n0 n1 n2 (9), uv0 uv1 uv2 (6), material (1)
            a0 = o
            nx = (arow[0, a0] + u * (arow[0, a0 + 3] - arow[0, a0])
                  + v * (arow[0, a0 + 6] - arow[0, a0]))
            ny = (arow[0, a0 + 1] + u * (arow[0, a0 + 4] - arow[0, a0 + 1])
                  + v * (arow[0, a0 + 7] - arow[0, a0 + 1]))
            nz = (arow[0, a0 + 2] + u * (arow[0, a0 + 5] - arow[0, a0 + 2])
                  + v * (arow[0, a0 + 8] - arow[0, a0 + 2]))
            uvx = (arow[0, a0 + 9] + u * (arow[0, a0 + 11] - arow[0, a0 + 9])
                   + v * (arow[0, a0 + 13] - arow[0, a0 + 9]))
            uvy = (arow[0, a0 + 10]
                   + u * (arow[0, a0 + 12] - arow[0, a0 + 10])
                   + v * (arow[0, a0 + 14] - arow[0, a0 + 10]))
            pf = rf * 8.0 + float(k)
            carry = (jnp.where(ok, dist, t_best), jnp.where(ok, pf, p_best),
                     jnp.where(ok, nx, nxb), jnp.where(ok, ny, nyb),
                     jnp.where(ok, nz, nzb), jnp.where(ok, uvx, uvxb),
                     jnp.where(ok, uvy, uvyb),
                     jnp.where(ok, arow[0, a0 + 15], matb),
                     jnp.where(ok, inst, instb))
        return carry

    z = jnp.zeros(ox.shape, jnp.float32)
    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32), z, z, z, z, z, z,
            jnp.full(ox.shape, -1.0, jnp.float32))
    t_best, p_best, nx, ny, nz, uvx, uvy, mat, inst_b = jax.lax.fori_loop(
        0, n_rows, body, init)
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
    n_rows = tris_ref.shape[0]

    def body(r, carry):
        row = tris_ref[pl.ds(r, 1), :]
        rf = r.astype(jnp.float32)
        for k in range(8):
            t_best, u_best, v_best, p_best, i_best = carry
            dist, u, v, inst, valid = _mt8(row, k * 16, ox, oy, oz,
                                           dx, dy, dz)
            ok = (valid & (dist < mt) & (dist < t_best)
                  & (inst >= 0.0) & (inst != ex)
                  & ((inc < 0.0) | (inst == inc)))
            pf = rf * 8.0 + float(k)
            carry = (jnp.where(ok, dist, t_best), jnp.where(ok, u, u_best),
                     jnp.where(ok, v, v_best), jnp.where(ok, pf, p_best),
                     jnp.where(ok, inst, i_best))
        return carry

    init = (
        jnp.full(ox.shape, F32_MAX, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.zeros(ox.shape, jnp.float32),
        jnp.full(ox.shape, -1.0, jnp.float32),
        jnp.full(ox.shape, -1.0, jnp.float32),
    )
    t_best, u_best, v_best, p_best, i_best = jax.lax.fori_loop(
        0, n_rows, body, init)
    t_out[:] = t_best
    u_out[:] = u_best
    v_out[:] = v_best
    prim_out[:] = p_best
    inst_out[:] = i_best


def _kernel_shadow(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl, incl,
                   t_out, inst_out):
    """Occlusion (shadow-ray) intersector: division-free Möller-Trumbore.

    Shadow consumers (occlude_hit_info, light.wgsl:526-533) need only
    (hit t, hit instance). All conditions are tested in |det|-multiplied
    form and the closest-t comparison is done by cross-multiplication, so
    the loop has no divide; the single divide happens once per ray at the
    end.
    """
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    inc = incl[:]
    n_rows = tris_ref.shape[0]

    def body(r, carry):
        row = tris_ref[pl.ds(r, 1), :]
        for k in range(8):
            td_best, ads_best, inst_best = carry
            o = k * 16
            v0x, v0y, v0z = row[0, o], row[0, o + 1], row[0, o + 2]
            v1x, v1y, v1z = row[0, o + 3], row[0, o + 4], row[0, o + 5]
            v2x, v2y, v2z = row[0, o + 6], row[0, o + 7], row[0, o + 8]
            inst = row[0, o + 9]
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
                & (td * ads_best < td_best * ads)
                & (inst >= 0.0)
                & (inst != ex)
                & ((inc < 0.0) | (inst == inc))
            )
            carry = (jnp.where(ok, td, td_best),
                     jnp.where(ok, ads, ads_best),
                     jnp.where(ok, inst, inst_best))
        return carry

    init = (jnp.full(ox.shape, F32_MAX, jnp.float32),
            jnp.ones(ox.shape, jnp.float32),
            jnp.full(ox.shape, -1.0, jnp.float32))
    td, ads, inst = jax.lax.fori_loop(0, n_rows, body, init)
    t_out[:] = jnp.where(inst >= 0.0, td / ads, F32_MAX)
    inst_out[:] = inst


def _prep_rays(ro, rd, max_t, exclude_instance, include_instance):
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
    return args, rows


def _tri_spec(rows8):
    return pl.BlockSpec((rows8, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


_RAY_SPEC = pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_brute_force_full(tris, attrs, ro, rd, max_t, exclude_instance,
                            include_instance, interpret: bool = False):
    """Fused intersect + hit-info. Returns the hit_info dict contract
    (position/normal/uv/instance/material) plus t/prim.
    tris [P,10]; attrs [P,17] (normals 9, uvs 6, instance, material)."""
    n = ro.shape[0]
    args, rows = _prep_rays(ro, rd, max_t, exclude_instance,
                            include_instance)
    tp = _pack8(tris)
    # attr rows pack to 16 fields: normals(9) uvs(6) material(1) — the
    # instance column is carried by the pos row
    ap = _pack8(jnp.concatenate([attrs[:, 0:15], attrs[:, 16:17]], axis=1))
    outs = pl.pallas_call(
        _kernel_full,
        interpret=interpret,
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[_tri_spec(tp.shape[0]), _tri_spec(ap.shape[0])]
        + [_RAY_SPEC] * 9,
        out_specs=[_RAY_SPEC] * 9,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 9,
    )(tp, ap, *args)

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


@partial(jax.jit, static_argnames=("interpret",))
def pallas_shadow(tris, ro, rd, max_t, exclude_instance, include_instance,
                  interpret: bool = False):
    """Shadow/occlusion trace: returns {t, instance, u, v, prim} with
    u/v/prim zero/-1 placeholders (occlusion consumers never read them)."""
    n = ro.shape[0]
    args, rows = _prep_rays(ro, rd, max_t, exclude_instance,
                            include_instance)
    tp = _pack8(tris)
    t, inst = pl.pallas_call(
        _kernel_shadow,
        interpret=interpret,
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[_tri_spec(tp.shape[0])] + [_RAY_SPEC] * 9,
        out_specs=[_RAY_SPEC] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 2,
    )(tp, *args)
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
    args, rows = _prep_rays(ro, rd, max_t, exclude_instance,
                            include_instance)
    tp = _pack8(tris)
    t, u, v, p, inst = pl.pallas_call(
        _kernel,
        interpret=interpret,
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[_tri_spec(tp.shape[0])] + [_RAY_SPEC] * 9,
        out_specs=[_RAY_SPEC] * 5,
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 5,
    )(tp, *args)

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
