"""Fused Pallas G-buffer prepass (camera rays -> trace -> G-buffer planes).

The modular prepass (ops/prepass.py) runs the Pallas trace kernel and then
assembles the 5 G-buffer channels + the full-screen albedo in XLA: one-hot
attribute matmuls, a per-pixel motion-matrix sweep, two view-projection
einsums, clip->uv math and the env-BRDF albedo — ~5 ms of [H,W] fusions at
1080p (round-3 profile). This kernel keeps each 128x128 pixel block in VMEM
and produces every plane in one pass:

* primary ray generation with Halton jitter (prepass.wgsl vertex contract);
* nearest-hit Möller-Trumbore with in-loop normal/uv/material interpolation
  (light.wgsl:364-398, 496-523);
* NDC depth via view_proj (prepass.wgsl:85-99), instance/material ids+0.5;
* velocity = clip_to_uv(VP*P) - clip_to_uv(prevVP * motion * P) with the
  per-instance motion matrix selected by an unrolled sweep
  (transform.rs:8-44 / prepass.wgsl fragment);
* the env-BRDF full-screen albedo (light.wgsl:1020-1042, no-texture path).

Depth gradients (forward differences) stay in XLA — two cheap shift passes.
Eligible for the same small-scene class as ops/light_fused.py plus an
instance-count cap (the motion sweep is unrolled per instance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.ops.light_fused import (
    _block_h,
    _mat_sweep,
    _env_brdf_approx,
    _rsqrt_n,
    _dot,
)

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7
DISTANCE_MAX = 65535.0

_LANES = 128

MAX_INSTANCES = 16

# params row layout
_P_INV_VP = 0     # inverse view_proj, row-major 16
_P_VP = 16        # view_proj 16
_P_PREV_VP = 32   # previous view_proj 16
_P_CAM = 48       # camera world position 3
_P_JIT = 51       # jitter pixels x, y
_P_WH = 53        # width, height (f32)
_P_OFF = 55       # decimation y-parity offset (0/1, f32)
_P_OFFX = 56      # decimation x-parity offset (0/1, f32)
_P_ROW0 = 57      # global row offset of this call's first output row
#                   (manual row sharding — parallel/shard.py)


def prepass_fused_eligible(scene, *, no_texture: bool,
                           tracer_kind: str) -> bool:
    from hikari_tpu.ops.light_fused import MAX_TRIS, MAX_MATERIALS

    if not no_texture or tracer_kind != "brute_force_pallas":
        return False
    if scene["tri_pos_flat"].shape[0] > MAX_TRIS:
        return False
    if scene["mat_packed"].shape[0] > MAX_MATERIALS:
        return False
    if scene["inst_motion"].shape[0] > MAX_INSTANCES:
        return False
    return True


def _build_kernel(*, n_tri_rows: int, n_inst: int, n_mats: int, width: int,
                  block_h: int, scale: int = 1):
    def kernel(params, tris, attrs, motion, mats,
               px_o, py_o, pz_o, dep_o, nx_o, ny_o, nz_o, inst_o, mat_o,
               velu_o, velv_o, uvx_o, uvy_o, alb_r_o, alb_g_o, alb_b_o):
        pid = pl.program_id(0)
        # 2-D row blocks (block_h, W): outputs are born in the [H,W]
        # {1,0:T(8,128)} layout every XLA consumer uses — flat [N/128,128]
        # blocks forced a relayout copy per plane (~0.26 ms each at 1080p).
        # tpu.iota only produces integers; exact below 2^24 so f32 is safe
        i = lax.broadcasted_iota(
            jnp.int32, (block_h, width), 0).astype(jnp.float32)
        j = lax.broadcasted_iota(
            jnp.int32, (block_h, width), 1).astype(jnp.float32)
        if scale == 1:
            y = pid.astype(jnp.float32) * block_h + i + params[0, _P_ROW0]
            x = j
        else:
            # decimated (jittered-deferred) pass: generate rays at the
            # parity-selected quad pixels (2y+s, 2x+s) directly — this is
            # bit-identical to decimating the full-res planes
            # (restir.resample_deferred ratio-2 path) without any lane
            # shuffles, which cost ~1.5 ms/plane as XLA relayouts
            y = (float(scale) * (pid.astype(jnp.float32) * block_h + i
                                 + params[0, _P_ROW0])
                 + params[0, _P_OFF])
            x = float(scale) * j + params[0, _P_OFFX]

        # --- camera ray (ops/prepass.py camera_rays)
        w_img = params[0, _P_WH]
        h_img = params[0, _P_WH + 1]
        u = (x + 0.5 + params[0, _P_JIT]) / w_img
        v = (y + 0.5 + params[0, _P_JIT + 1]) / h_img
        ndc_x = u * 2.0 - 1.0
        ndc_y = (1.0 - v) * 2.0 - 1.0

        def unproject(z):
            m = lambda r, c: params[0, _P_INV_VP + 4 * r + c]
            hx = m(0, 0) * ndc_x + m(0, 1) * ndc_y + m(0, 2) * z + m(0, 3)
            hy = m(1, 0) * ndc_x + m(1, 1) * ndc_y + m(1, 2) * z + m(1, 3)
            hz = m(2, 0) * ndc_x + m(2, 1) * ndc_y + m(2, 2) * z + m(2, 3)
            hw = m(3, 0) * ndc_x + m(3, 1) * ndc_y + m(3, 2) * z + m(3, 3)
            inv = 1.0 / hw
            return hx * inv, hy * inv, hz * inv

        ax, ay, az = unproject(0.9)
        bx, by, bz = unproject(0.1)
        dx, dy, dz = bx - ax, by - ay, bz - az
        inv_len = lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
        dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
        ox = jnp.full_like(dx, params[0, _P_CAM])
        oy = jnp.full_like(dx, params[0, _P_CAM + 1])
        oz = jnp.full_like(dx, params[0, _P_CAM + 2])

        # --- nearest hit with fused attr+uv interpolation
        def body(r, carry):
            row = tris[pl.ds(r, 1), :]
            arow = attrs[pl.ds(r, 1), :]
            for k in range(8):
                (t_best, nxb, nyb, nzb, uvxb, uvyb, matb, instb) = carry
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
                inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0,
                                    1.0 / det)
                aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
                uu = (aox * ux + aoy * uy + aoz * uz) * inv_det
                vx = aoy * abz - aoz * aby
                vy = aoz * abx - aox * abz
                vz = aox * aby - aoy * abx
                vv = (dx * vx + dy * vy + dz * vz) * inv_det
                dist = (acx * vx + acy * vy + acz * vz) * inv_det
                ok = ((jnp.abs(det) >= F32_EPSILON)
                      & (uu >= 0.0) & (uu <= 1.0)
                      & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (dist > F32_EPSILON)
                      & (dist < t_best)
                      & (inst >= 0.0))
                a0 = o
                nx = (arow[0, a0] + uu * (arow[0, a0 + 3] - arow[0, a0])
                      + vv * (arow[0, a0 + 6] - arow[0, a0]))
                ny = (arow[0, a0 + 1]
                      + uu * (arow[0, a0 + 4] - arow[0, a0 + 1])
                      + vv * (arow[0, a0 + 7] - arow[0, a0 + 1]))
                nz = (arow[0, a0 + 2]
                      + uu * (arow[0, a0 + 5] - arow[0, a0 + 2])
                      + vv * (arow[0, a0 + 8] - arow[0, a0 + 2]))
                uvx = (arow[0, a0 + 9]
                       + uu * (arow[0, a0 + 11] - arow[0, a0 + 9])
                       + vv * (arow[0, a0 + 13] - arow[0, a0 + 9]))
                uvy = (arow[0, a0 + 10]
                       + uu * (arow[0, a0 + 12] - arow[0, a0 + 10])
                       + vv * (arow[0, a0 + 14] - arow[0, a0 + 10]))
                carry = (jnp.where(ok, dist, t_best),
                         jnp.where(ok, nx, nxb), jnp.where(ok, ny, nyb),
                         jnp.where(ok, nz, nzb),
                         jnp.where(ok, uvx, uvxb), jnp.where(ok, uvy, uvyb),
                         jnp.where(ok, arow[0, a0 + 15], matb),
                         jnp.where(ok, inst, instb))
            return carry

        z0 = jnp.zeros_like(dx)
        init = (jnp.full_like(dx, F32_MAX), z0, z0, z0, z0, z0,
                jnp.full_like(dx, -1.0), jnp.full_like(dx, -1.0))
        t, nx, ny, nz, uvx, uvy, mat_f, inst_f = lax.fori_loop(
            0, n_tri_rows, body, init)
        mask = inst_f >= 0.0
        nx, ny, nz = _rsqrt_n(nx, ny, nz)
        nx = jnp.where(mask, nx, 0.0)
        ny = jnp.where(mask, ny, 0.0)
        nz = jnp.where(mask, nz, 0.0)
        tt = jnp.where(mask, t, DISTANCE_MAX)
        wx = ox + dx * tt
        wy = oy + dy * tt
        wz = oz + dz * tt

        # --- NDC depth (ops/prepass.py ndc_depth)
        def project(m0, px, py, pz):
            m = lambda r, c: params[0, m0 + 4 * r + c]
            cx = m(0, 0) * px + m(0, 1) * py + m(0, 2) * pz + m(0, 3)
            cy = m(1, 0) * px + m(1, 1) * py + m(1, 2) * pz + m(1, 3)
            cz = m(2, 0) * px + m(2, 1) * py + m(2, 2) * pz + m(2, 3)
            cw = m(3, 0) * px + m(3, 1) * py + m(3, 2) * pz + m(3, 3)
            return cx, cy, cz, cw

        cx_, cy_, cz_, cw_ = project(_P_VP, wx, wy, wz)
        depth = jnp.where(mask, cz_ / cw_, 0.0)

        # --- velocity: motion-matrix sweep (inst_motion rows)
        inst_safe = jnp.maximum(inst_f, 0.0)
        mrows = [jnp.full_like(dx, motion[0, c]) for c in range(16)]
        for m_i in range(1, n_inst):
            sel = inst_safe == float(m_i)
            for c in range(16):
                mrows[c] = jnp.where(sel, motion[m_i, c], mrows[c])
        pw = (mrows[12] * wx + mrows[13] * wy + mrows[14] * wz + mrows[15])
        inv_pw = 1.0 / pw
        pwx = (mrows[0] * wx + mrows[1] * wy + mrows[2] * wz
               + mrows[3]) * inv_pw
        pwy = (mrows[4] * wx + mrows[5] * wy + mrows[6] * wz
               + mrows[7]) * inv_pw
        pwz = (mrows[8] * wx + mrows[9] * wy + mrows[10] * wz
               + mrows[11]) * inv_pw

        def clip_uv(cx, cy, cw):
            iu = cx / cw
            iv = cy / cw
            uo = (iu + 1.0) * 0.5
            vo = 1.0 - (iv + 1.0) * 0.5
            return uo, vo

        un, vn = clip_uv(cx_, cy_, cw_)
        pcx, pcy, _pcz, pcw = project(_P_PREV_VP, pwx, pwy, pwz)
        up, vp = clip_uv(pcx, pcy, pcw)
        velu = jnp.where(mask, un - up, 0.0)
        velv = jnp.where(mask, vn - vp, 0.0)

        # --- full-screen albedo (env_brdf, no-texture surface)
        valid = depth >= F32_EPSILON
        surf = _mat_sweep(mats, n_mats, jnp.maximum(mat_f, 0.0))
        vvx, vvy, vvz = _rsqrt_n(params[0, _P_CAM] - wx,
                                 params[0, _P_CAM + 1] - wy,
                                 params[0, _P_CAM + 2] - wz)
        nov = jnp.maximum(_dot(nx, ny, nz, vvx, vvy, vvz), 0.0001)
        dr, dg, db = surf.diff
        f0r, f0g, f0b = surf.f0
        da_r, da_g, da_b = _env_brdf_approx(dr, dg, db,
                                            jnp.ones_like(nov), nov)
        sa_r, sa_g, sa_b = _env_brdf_approx(f0r, f0g, f0b, surf.rough, nov)

        px_o[:] = jnp.where(mask, wx, 0.0)
        py_o[:] = jnp.where(mask, wy, 0.0)
        pz_o[:] = jnp.where(mask, wz, 0.0)
        dep_o[:] = depth
        nx_o[:] = nx
        ny_o[:] = ny
        nz_o[:] = nz
        inst_o[:] = inst_f + 0.5
        mat_o[:] = mat_f + 0.5
        velu_o[:] = velu
        velv_o[:] = velv
        uvx_o[:] = jnp.where(mask, uvx, 0.0)
        uvy_o[:] = jnp.where(mask, uvy, 0.0)
        alb_r_o[:] = jnp.where(valid, da_r + sa_r, 0.0)
        alb_g_o[:] = jnp.where(valid, da_g + sa_g, 0.0)
        alb_b_o[:] = jnp.where(valid, da_b + sa_b, 0.0)

    return kernel


def _build_kernel_slim(*, n_tri_rows: int, n_inst: int, width: int,
                       block_h: int):
    """Slim variant for the SMAA parity quads: depth / velocity / instance
    only, at the stride-2 decimated coords (2y+a, 2x+b). The hit loop
    carries only (t, instance) — no attribute interpolation."""
    def kernel(params, tris, motion, dep_o, velu_o, velv_o, inst_o):
        pid = pl.program_id(0)
        i = lax.broadcasted_iota(
            jnp.int32, (block_h, width), 0).astype(jnp.float32)
        j = lax.broadcasted_iota(
            jnp.int32, (block_h, width), 1).astype(jnp.float32)
        y = (2.0 * (pid.astype(jnp.float32) * block_h + i
                    + params[0, _P_ROW0]) + params[0, _P_OFF])
        x = 2.0 * j + params[0, _P_OFFX]

        w_img = params[0, _P_WH]
        h_img = params[0, _P_WH + 1]
        u = (x + 0.5 + params[0, _P_JIT]) / w_img
        v = (y + 0.5 + params[0, _P_JIT + 1]) / h_img
        ndc_x = u * 2.0 - 1.0
        ndc_y = (1.0 - v) * 2.0 - 1.0

        def unproject(z):
            m = lambda r, c: params[0, _P_INV_VP + 4 * r + c]
            hx = m(0, 0) * ndc_x + m(0, 1) * ndc_y + m(0, 2) * z + m(0, 3)
            hy = m(1, 0) * ndc_x + m(1, 1) * ndc_y + m(1, 2) * z + m(1, 3)
            hz = m(2, 0) * ndc_x + m(2, 1) * ndc_y + m(2, 2) * z + m(2, 3)
            hw = m(3, 0) * ndc_x + m(3, 1) * ndc_y + m(3, 2) * z + m(3, 3)
            inv = 1.0 / hw
            return hx * inv, hy * inv, hz * inv

        ax, ay, az = unproject(0.9)
        bx, by, bz = unproject(0.1)
        dx, dy, dz = bx - ax, by - ay, bz - az
        inv_len = lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
        dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
        ox = jnp.full_like(dx, params[0, _P_CAM])
        oy = jnp.full_like(dx, params[0, _P_CAM + 1])
        oz = jnp.full_like(dx, params[0, _P_CAM + 2])

        def body(r, carry):
            row = tris[pl.ds(r, 1), :]
            for k in range(8):
                t_best, instb = carry
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
                inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0,
                                    1.0 / det)
                aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
                uu = (aox * ux + aoy * uy + aoz * uz) * inv_det
                vx = aoy * abz - aoz * aby
                vy = aoz * abx - aox * abz
                vz = aox * aby - aoy * abx
                vv = (dx * vx + dy * vy + dz * vz) * inv_det
                dist = (acx * vx + acy * vy + acz * vz) * inv_det
                ok = ((jnp.abs(det) >= F32_EPSILON)
                      & (uu >= 0.0) & (uu <= 1.0)
                      & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (dist > F32_EPSILON)
                      & (dist < t_best)
                      & (inst >= 0.0))
                carry = (jnp.where(ok, dist, t_best),
                         jnp.where(ok, inst, instb))
            return carry

        init = (jnp.full_like(dx, F32_MAX), jnp.full_like(dx, -1.0))
        t, inst_f = lax.fori_loop(0, n_tri_rows, body, init)
        mask = inst_f >= 0.0
        tt = jnp.where(mask, t, DISTANCE_MAX)
        wx = ox + dx * tt
        wy = oy + dy * tt
        wz = oz + dz * tt

        def project(m0, px, py, pz):
            m = lambda r, c: params[0, m0 + 4 * r + c]
            cx = m(0, 0) * px + m(0, 1) * py + m(0, 2) * pz + m(0, 3)
            cy = m(1, 0) * px + m(1, 1) * py + m(1, 2) * pz + m(1, 3)
            cz = m(2, 0) * px + m(2, 1) * py + m(2, 2) * pz + m(2, 3)
            cw = m(3, 0) * px + m(3, 1) * py + m(3, 2) * pz + m(3, 3)
            return cx, cy, cz, cw

        cx_, cy_, cz_, cw_ = project(_P_VP, wx, wy, wz)
        dep_o[:] = jnp.where(mask, cz_ / cw_, 0.0)

        inst_safe = jnp.maximum(inst_f, 0.0)
        mrows = [jnp.full_like(dx, motion[0, c]) for c in range(16)]
        for m_i in range(1, n_inst):
            sel = inst_safe == float(m_i)
            for c in range(16):
                mrows[c] = jnp.where(sel, motion[m_i, c], mrows[c])
        pw = (mrows[12] * wx + mrows[13] * wy + mrows[14] * wz + mrows[15])
        inv_pw = 1.0 / pw
        pwx = (mrows[0] * wx + mrows[1] * wy + mrows[2] * wz
               + mrows[3]) * inv_pw
        pwy = (mrows[4] * wx + mrows[5] * wy + mrows[6] * wz
               + mrows[7]) * inv_pw
        pwz = (mrows[8] * wx + mrows[9] * wy + mrows[10] * wz
               + mrows[11]) * inv_pw

        def clip_uv(cx, cy, cw):
            iu = cx / cw
            iv = cy / cw
            uo = (iu + 1.0) * 0.5
            vo = 1.0 - (iv + 1.0) * 0.5
            return uo, vo

        un, vn = clip_uv(cx_, cy_, cw_)
        pcx, pcy, _pcz, pcw = project(_P_PREV_VP, pwx, pwy, pwz)
        up, vp = clip_uv(pcx, pcy, pcw)
        velu_o[:] = jnp.where(mask, un - up, 0.0)
        velv_o[:] = jnp.where(mask, vn - vp, 0.0)
        inst_o[:] = inst_f + 0.5

    return kernel


def _call_planes(kernel_args, size, *, scale, interpret, mesh=None):
    """One pallas_call producing the 16 G-buffer/albedo planes at `size`.
    scale=1: plane[y,x] is pixel (y,x); scale=2: pixel (2y+s, 2x+s) with s
    the parity offset in params[_P_OFF]. With a mesh, the call runs as a
    shard_map island over the row axis (pixel-local: no halo), each shard
    generating rays for its own global rows via params[_P_ROW0]."""
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from hikari_tpu.parallel import shard as _sh

        n = _sh.nshards(mesh)
        h, w = size
        hl = -(-h // n)

        def local(params, tris, attrs, motion, mats):
            idx = jax.lax.axis_index(_sh.AXIS)
            p2 = params.at[0, _P_ROW0].set((idx * hl).astype(jnp.float32))
            return _call_planes((p2, tris, attrs, motion, mats), (hl, w),
                                scale=scale, interpret=interpret)

        outs = _sh.smap(local, mesh, in_specs=(P(),) * 5,
                        out_specs=[P(_sh.AXIS, None)] * 16)(*kernel_args)
        return [o[:h] for o in outs]
    params, tris, attrs, motion, mats = kernel_args
    h, w = size
    bh = _block_h(w)
    hp = -(-h // bh) * bh
    n_inst = motion.shape[0]
    n_mats = mats.shape[0]
    kernel = _build_kernel(n_tri_rows=tris.shape[0], n_inst=n_inst,
                           n_mats=n_mats, width=w, block_h=bh, scale=scale)

    def tab_spec(r):
        return pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    ray_spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    n_out = 16
    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(hp // bh,),
        in_specs=[tab_spec(1), tab_spec(tris.shape[0]),
                  tab_spec(attrs.shape[0]), tab_spec(n_inst),
                  tab_spec(n_mats)],
        out_specs=[ray_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((hp, w), jnp.float32)]
        * n_out,
    )(params, tris, attrs, motion, mats)
    return [o[:h] for o in outs]


def _assemble(planes, *, grad_scale=1.0):
    """Planes -> (gbuf dict, albedo [h,w,4]). grad_scale: forward
    differences step in full-res pixels (2 for the decimated planes)."""
    (px, py, pz, depth, nx, ny, nz, inst, mat, velu, velv, uvx, uvy,
     alb_r, alb_g, alb_b) = planes
    position = jnp.stack([px, py, pz, depth], axis=-1)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    instance_material = jnp.stack([inst, mat], axis=-1)
    velocity_uv = jnp.stack([velu, velv, uvx, uvy], axis=-1)
    inv = 1.0 / grad_scale
    ddx = jnp.concatenate([depth[:, 1:] - depth[:, :-1],
                           (depth[:, -1:] - depth[:, -2:-1])], axis=1) * inv
    ddy = jnp.concatenate([depth[1:, :] - depth[:-1, :],
                           (depth[-1:, :] - depth[-2:-1, :])], axis=0) * inv
    gbuf = {
        "position": position,
        "normal": normal,
        "depth_gradient": jnp.stack([ddx, ddy], axis=-1),
        "instance_material": instance_material,
        "velocity_uv": velocity_uv,
    }
    valid = depth >= F32_EPSILON
    albedo = jnp.stack([alb_r, alb_g, alb_b, valid.astype(jnp.float32)],
                       axis=-1)
    return gbuf, albedo


@partial(jax.jit, static_argnames=("size", "dec_size", "interpret", "mesh"))
def prepass_fused(scene, view, prev_view, jitter, size, dec_size=None,
                  dec_parity=None, interpret: bool = False, mesh=None):
    """Returns (gbuf dict matching ops/prepass.py's contract, albedo
    [H,W,4]). jitter: [2] pixel jitter (frame_jitter).

    With dec_size=(h/2, w/2) and dec_parity (frame&1), additionally
    returns (g_dec, albedo_dec) at dec_size: the ratio-2 jittered-deferred
    decimation of the G-buffer computed directly at the decimated pixel
    coords (bit-identical to restir.resample_deferred for every plane
    except depth_gradient, which uses a step-2 forward difference)."""
    from hikari_tpu.ops.light_fused import _pack8

    if not interpret:
        # CPU test platform: run under the Pallas interpreter
        interpret = not any(d.platform != "cpu" for d in jax.devices())

    h, w = size
    tris = _pack8(scene["tri_pos_flat"])
    attrs = _pack8(jnp.concatenate(
        [scene["tri_attr"][:, 0:15], scene["tri_attr"][:, 16:17]], axis=1))
    n_inst = scene["inst_motion"].shape[0]
    motion = jnp.pad(scene["inst_motion"],
                     ((0, 0), (0, _LANES - 16)))
    n_mats = scene["mat_packed"].shape[0]
    mats = jnp.pad(scene["mat_packed"],
                   ((0, 0), (0, _LANES - scene["mat_packed"].shape[1])))

    row0 = jnp.zeros((_LANES,), jnp.float32)
    row0 = lax.dynamic_update_slice(
        row0, view["inverse_view_proj"].reshape(-1), (_P_INV_VP,))
    row0 = lax.dynamic_update_slice(
        row0, view["view_proj"].reshape(-1), (_P_VP,))
    row0 = lax.dynamic_update_slice(
        row0, prev_view["view_proj"].reshape(-1), (_P_PREV_VP,))
    row0 = lax.dynamic_update_slice(
        row0, view["world_position"], (_P_CAM,))
    row0 = lax.dynamic_update_slice(
        row0, jnp.asarray(jitter, jnp.float32), (_P_JIT,))
    row0 = row0.at[_P_WH].set(float(w)).at[_P_WH + 1].set(float(h))
    if dec_parity is not None:
        s = dec_parity.astype(jnp.float32)
        row0 = row0.at[_P_OFF].set(s).at[_P_OFFX].set(s)
    params = row0[None, :]

    kernel_args = (params, tris, attrs, motion, mats)
    planes = _call_planes(kernel_args, size, scale=1, interpret=interpret,
                          mesh=mesh)
    gbuf, albedo = _assemble(planes)
    if dec_size is None:
        return gbuf, albedo
    dec_planes = _call_planes(kernel_args, dec_size, scale=2,
                              interpret=interpret, mesh=mesh)
    g_dec, albedo_dec = _assemble(dec_planes, grad_scale=2.0)
    return gbuf, albedo, g_dec, albedo_dec


@partial(jax.jit, static_argnames=("size", "dec_size", "interpret", "mesh"))
def prepass_fused_quads(scene, view, prev_view, jitter, size, dec_size,
                        interpret: bool = False, mesh=None):
    """SMAA TU4X decimation context: for each stride-2 parity quad (a, b)
    the depth / velocity.xy / instance planes at dec_size, computed by
    tracing rays at the decimated coords (2y+a, 2x+b) — identical values
    to the full-res G-buffer's quad decimation (smaa.py _parity_ctx),
    without the ~1.5 ms/plane XLA quad-reshape relayouts.

    Returns {(a, b): {"depth" [h,w], "velocity" [h,w,2], "instance"
    [h,w]}}. The scene tables are identical to prepass_fused's, so XLA
    CSEs the packing when both run in one jitted frame."""
    from hikari_tpu.ops.light_fused import _pack8

    if not interpret:
        interpret = not any(d.platform != "cpu" for d in jax.devices())

    h, w = size
    tris = _pack8(scene["tri_pos_flat"])
    n_inst = scene["inst_motion"].shape[0]
    motion = jnp.pad(scene["inst_motion"], ((0, 0), (0, _LANES - 16)))

    row0 = jnp.zeros((_LANES,), jnp.float32)
    row0 = lax.dynamic_update_slice(
        row0, view["inverse_view_proj"].reshape(-1), (_P_INV_VP,))
    row0 = lax.dynamic_update_slice(
        row0, view["view_proj"].reshape(-1), (_P_VP,))
    row0 = lax.dynamic_update_slice(
        row0, prev_view["view_proj"].reshape(-1), (_P_PREV_VP,))
    row0 = lax.dynamic_update_slice(
        row0, view["world_position"], (_P_CAM,))
    row0 = lax.dynamic_update_slice(
        row0, jnp.asarray(jitter, jnp.float32), (_P_JIT,))
    row0 = row0.at[_P_WH].set(float(w)).at[_P_WH + 1].set(float(h))

    dh, dw = dec_size

    def call_slim(params, tris, motion, rows):
        bh = _block_h(dw)
        hp = -(-rows // bh) * bh

        def tab_spec(r):
            return pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        ray_spec = pl.BlockSpec((bh, dw), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        kernel = _build_kernel_slim(n_tri_rows=tris.shape[0],
                                    n_inst=motion.shape[0],
                                    width=dw, block_h=bh)
        outs = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(hp // bh,),
            in_specs=[tab_spec(1), tab_spec(tris.shape[0]),
                      tab_spec(motion.shape[0])],
            out_specs=[ray_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((hp, dw), jnp.float32)] * 4,
        )(params, tris, motion)
        return [o[:rows] for o in outs]

    out = {}
    for a in (0, 1):
        for b in (0, 1):
            params = (row0.at[_P_OFF].set(float(a))
                      .at[_P_OFFX].set(float(b)))[None, :]
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                from hikari_tpu.parallel import shard as _sh

                n = _sh.nshards(mesh)
                hl = -(-dh // n)

                def local(params, tris, motion, hl=hl):
                    idx = jax.lax.axis_index(_sh.AXIS)
                    p2 = params.at[0, _P_ROW0].set(
                        (idx * hl).astype(jnp.float32))
                    return call_slim(p2, tris, motion, hl)

                dep, velu, velv, inst = [
                    o[:dh] for o in _sh.smap(
                        local, mesh, in_specs=(P(), P(), P()),
                        out_specs=[P(_sh.AXIS, None)] * 4)(
                            params, tris, motion)]
            else:
                dep, velu, velv, inst = call_slim(params, tris, motion, dh)
            out[(a, b)] = {
                "depth": dep,
                "velocity": jnp.stack([velu, velv], axis=-1),
                "instance": inst,
            }
    return out
