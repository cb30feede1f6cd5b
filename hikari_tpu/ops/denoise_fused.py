"""Fused Pallas a-trous denoiser level (denoise.wgsl:43-116).

The XLA formulation of one a-trous level (ops/denoise.py) is 8 taps x
(geometry weights + C channels), each tap a separate [h,w] pad/shift fusion
that re-reads the irradiance stack and the G-buffer planes from HBM — the
whole 4-level denoiser measured 12.5 ms of the 23.2 ms flagship frame
(round-3 profile, 1080p). This kernel runs one level for ALL channels in
one pass over row blocks held in VMEM:

* per tap: slice the row window from the (prev, cur, next) block triple,
  rotate lanes for the x offset (pltpu.roll), mask out-of-image taps;
* edge-stopping weights exactly as denoise.wgsl:43-66 — normal^16,
  exp(-|dz|/(|g.o|+eps)), instance id match, luminance/variance — with the
  two exponentials merged into one exp(-(depth_arg + lum_arg));
* channel irradiance accumulation + the 3-sigma firefly clamp
  (denoise.wgsl firefly / post_process.rs:773-784) in-register.

Input layout: three stacked plane tensors (channels-first [P, H, W] so each
plane keeps the native (8,128)-tiled layout):
  irr  [3C, H, W]   bf16  demodulated irradiance (level input/output; the
                          XLA path also stores bf16 between levels)
  geo  [2+C, H, W]  bf16  grad_x, grad_y, then C luminance-weight
                          denominators 1 / (4 * var^0.25 + 1e-3)
  f32s [5, H, W]    f32   depth, instance id (exact), nx, ny, nz
                          (pre-normalized; f32 because normal^16 amplifies
                          bf16 rounding ~16x)

Semantics match ops/denoise.py's level loop bit-for-bit up to f32
round-off; tests/test_denoise_fused.py asserts equivalence in interpret
mode against the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.config import ATROUS_KERNEL

F32_MAX = 3.402823466e38
_LUMA = (0.2126, 0.7152, 0.0722)

_TAPS = tuple((oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1)
              if not (oy == 0 and ox == 0))


def _block_rows(nch: int) -> int:
    """Row-block height: the (prev, cur, next) triple of all three stacks
    plus the output must fit VMEM double-buffered (~16 MB/core). 16 rows x
    1920 lanes keeps the worst case (C=3: 27+24+6 blocks + 9 out) ~9 MB."""
    return 16


def _build_kernel(*, step: int, nch: int, ffs: tuple, bh: int,
                  h: int, w: int):
    s = step
    k_center = float(ATROUS_KERNEL[1, 1])

    def kernel(row0_ref, irr_prev, irr_cur, irr_next, geo_prev, geo_cur,
               geo_next, f_prev, f_cur, f_next, out):
        # row0: global row of this call's first row (manual sharding —
        # parallel/shard.py); the out-of-image tap masks use global rows
        r0 = pl.program_id(0) * bh + row0_ref[0]

        def window(prev, cur, nxt, p, oy):
            """Rows [oy*s, oy*s + bh) of plane p relative to this block."""
            o = oy * s
            if o == 0:
                return cur[p].astype(jnp.float32)
            if o < 0:
                return jnp.concatenate(
                    [prev[p, bh + o:, :], cur[p, :bh + o, :]],
                    axis=0).astype(jnp.float32)
            return jnp.concatenate(
                [cur[p, o:, :], nxt[p, :o, :]], axis=0).astype(jnp.float32)

        def shift(plane, ox):
            """plane[y, x + ox*s] via lane rotation — wrapped entries are
            killed by the tap mask. Static two-slice concat (not pltpu.roll)
            so interpret mode matches Mosaic exactly."""
            if ox == 0:
                return plane
            k = (ox * s) % w
            return jnp.concatenate([plane[:, k:], plane[:, :k]], axis=1)

        rows = lax.broadcasted_iota(jnp.int32, (bh, w), 0) + r0
        cols = lax.broadcasted_iota(jnp.int32, (bh, w), 1)

        # --- center pixel state
        gx = geo_cur[0].astype(jnp.float32)
        gy = geo_cur[1].astype(jnp.float32)
        denom = [geo_cur[2 + c].astype(jnp.float32) for c in range(nch)]
        d0 = f_cur[0]
        i0 = f_cur[1]
        n0 = [f_cur[2 + i] for i in range(3)]

        c_irr, bad, lum0 = [], [], []
        for c in range(nch):
            rgb = [irr_cur[3 * c + i].astype(jnp.float32) for i in range(3)]
            fin = (jnp.isfinite(rgb[0]) & jnp.isfinite(rgb[1])
                   & jnp.isfinite(rgb[2]))
            over = ((rgb[0] > F32_MAX) | (rgb[1] > F32_MAX)
                    | (rgb[2] > F32_MAX))
            b = ~fin | over
            rgb = [jnp.where(b, 0.0, ch) for ch in rgb]
            c_irr.append(rgb)
            bad.append(b)
            lum0.append(_LUMA[0] * rgb[0] + _LUMA[1] * rgb[1]
                        + _LUMA[2] * rgb[2])

        sum_irr = [[ch * k_center for ch in c_irr[c]] for c in range(nch)]
        sum_w = [jnp.where(bad[c], 0.0, k_center) for c in range(nch)]
        ff_m1 = [jnp.zeros((bh, w), jnp.float32) for _ in range(nch)]
        ff_m2 = [jnp.zeros((bh, w), jnp.float32) for _ in range(nch)]
        ff_cnt = [jnp.zeros((bh, w), jnp.float32) for _ in range(nch)]

        for oy, ox in _TAPS:
            k_tap = float(ATROUS_KERNEL[oy + 1, ox + 1])
            ok = ((rows + oy * s >= 0) & (rows + oy * s < h)
                  & (cols + ox * s >= 0) & (cols + ox * s < w))

            sn = [shift(window(f_prev, f_cur, f_next, 2 + i, oy), ox)
                  for i in range(3)]
            sd = shift(window(f_prev, f_cur, f_next, 0, oy), ox)
            si = shift(window(f_prev, f_cur, f_next, 1, oy), ox)

            # normal^16 * instance * kernel  (denoise.wgsl:43-66)
            nw = jnp.maximum(0.0, n0[0] * sn[0] + n0[1] * sn[1]
                             + n0[2] * sn[2])
            nw = nw * nw
            nw = nw * nw
            nw = nw * nw
            nw = nw * nw
            iw = jnp.maximum(0.0, 1.0 - jnp.abs(i0 - si))
            geo_w = nw * iw * k_tap
            # depth term folded into the per-channel exp below:
            # exp(-a)*exp(-b) == exp(-(a+b))
            dg = jnp.abs(gx * ox + gy * oy)
            d_arg = jnp.abs(d0 - sd) / (dg + 0.01)

            for c in range(nch):
                src = [shift(window(irr_prev, irr_cur, irr_next,
                                    3 * c + i, oy), ox) for i in range(3)]
                fin = (jnp.isfinite(src[0]) & jnp.isfinite(src[1])
                       & jnp.isfinite(src[2]))
                over = ((src[0] > F32_MAX) | (src[1] > F32_MAX)
                        | (src[2] > F32_MAX))
                okc = ok & fin & ~over
                s_lum = (_LUMA[0] * src[0] + _LUMA[1] * src[1]
                         + _LUMA[2] * src[2])
                wgt = geo_w * jnp.exp(
                    -(d_arg + jnp.abs(lum0[c] - s_lum) * denom[c]))
                wgt = jnp.where(okc, wgt, 0.0)
                for i in range(3):
                    # zero excluded tap values: NaN * 0 == NaN would spread
                    sum_irr[c][i] = sum_irr[c][i] + jnp.where(
                        okc, src[i], 0.0) * wgt
                sum_w[c] = sum_w[c] + wgt
                if ffs[c]:
                    ff_m1[c] = ff_m1[c] + jnp.where(okc, s_lum, 0.0)
                    ff_m2[c] = ff_m2[c] + jnp.where(okc, s_lum * s_lum, 0.0)
                    ff_cnt[c] = ff_cnt[c] + okc.astype(jnp.float32)

        for c in range(nch):
            wsum = sum_w[c]
            zero = wsum < 1e-4
            inv = 1.0 / jnp.maximum(wsum, 1e-4)
            ni = [jnp.where(zero, 0.0, ch * inv) for ch in sum_irr[c]]
            if ffs[c]:
                cnt = jnp.maximum(ff_cnt[c], 1.0)
                mean = ff_m1[c] / cnt
                var = ff_m2[c] / cnt - mean * mean
                fire = lum0[c] > mean + 3.0 * jnp.sqrt(
                    jnp.maximum(var, 0.0))
                scale = mean / jnp.maximum(lum0[c], 1e-30)
                ni = [jnp.where(fire, scale * ch, ch) for ch in ni]
            for i in range(3):
                out[3 * c + i] = ni[i].astype(jnp.bfloat16)

    return kernel


@partial(jax.jit, static_argnames=("step", "nch", "ffs", "size",
                                   "interpret"))
def atrous_level(irr, geo, f32s, *, step: int, nch: int, ffs: tuple,
                 size, interpret: bool = False, row0=None):
    """One a-trous level for all channels. irr [3C,Hp,W] bf16,
    geo [5+C,Hp,W] bf16, f32s [2,Hp,W] f32 (row-padded to the block
    multiple); returns the filtered irr stack [3C,Hp,W] bf16. row0:
    global row of the stack's first row (sharded local calls)."""
    h, w = size
    bh = _block_rows(nch)
    hp = irr.shape[1]
    nb = hp // bh
    assert hp % bh == 0 and step <= bh

    kernel = _build_kernel(step=step, nch=nch, ffs=tuple(ffs), bh=bh,
                           h=h, w=w)
    if row0 is None:
        row0 = 0
    row0 = jnp.asarray([row0], jnp.int32)

    def spec(p, delta):
        if delta == 0:
            return pl.BlockSpec((p, bh, w), lambda i, pk: (0, i, 0),
                                memory_space=pltpu.VMEM)
        if delta < 0:
            return pl.BlockSpec((p, bh, w),
                                lambda i, pk: (0, jnp.maximum(i - 1, 0), 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((p, bh, w),
                            lambda i, pk: (0, jnp.minimum(i + 1, nb - 1), 0),
                            memory_space=pltpu.VMEM)

    ni, ng = irr.shape[0], geo.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[spec(ni, -1), spec(ni, 0), spec(ni, 1),
                  spec(ng, -1), spec(ng, 0), spec(ng, 1),
                  spec(5, -1), spec(5, 0), spec(5, 1)],
        out_specs=pl.BlockSpec((ni, bh, w), lambda i, pk: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((ni, hp, w), jnp.bfloat16),
        # the (prev,cur,next) triples sit right at the 16 MB scoped-vmem
        # default at full-res 1080p when the surrounding program leaves the
        # operands in S(1) (observed on the textured/modular path: 17.03 MB
        # requested); raise the cap like light_fused/spatial_fused do
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(row0, irr, irr, irr, geo, geo, geo, f32s, f32s, f32s)


def denoise_levels_fused(irrs, variances, normal, gradient, depth, instance,
                         ffs, steps, render_size, interpret: bool = False):
    """Run the full a-trous cascade with the Pallas level kernel.

    irrs: list of [h,w,3] f32 demodulated irradiance per channel;
    variances: list of [h,w] f32 (3x3-prefiltered, constant across levels);
    normal: [h,w,3] pre-normalized; gradient: [h,w,2]; depth/instance [h,w].
    Returns list of [h,w,3] f32 (filtered irradiance, firefly applied).
    """
    h, w = render_size
    nch = len(irrs)
    bh = _block_rows(nch)
    hp = -(-h // bh) * bh

    def pad(x):
        return jnp.pad(x, ((0, hp - h), (0, 0))) if hp > h else x

    planes = [pad(irr[..., i]) for irr in irrs for i in range(3)]
    irr = jnp.stack(planes).astype(jnp.bfloat16)
    denoms = [pad(1.0 / (4.0 * jnp.sqrt(jnp.sqrt(jnp.maximum(v, 0.0)))
                         + 1e-3)) for v in variances]
    geo = jnp.stack([pad(gradient[..., 0]), pad(gradient[..., 1])]
                    + denoms).astype(jnp.bfloat16)
    f32s = jnp.stack([pad(depth), pad(instance), pad(normal[..., 0]),
                      pad(normal[..., 1]), pad(normal[..., 2])])

    from hikari_tpu.parallel import shard as _sh

    mesh = _sh.active_mesh()
    if mesh is not None:
        # manual row sharding: each shard filters its rows + a one-block
        # ppermuted halo per level (the kernel's own (prev, cur, next)
        # block triple covers taps up to +-bh rows; global-row masks kill
        # the zero halos at the frame edges)
        from jax.sharding import PartitionSpec as P

        n = _sh.nshards(mesh)
        hpm = -(-hp // (bh * n)) * bh * n
        if hpm > hp:
            extra = hpm - hp
            irr = jnp.pad(irr, ((0, 0), (0, extra), (0, 0)))
            geo = jnp.pad(geo, ((0, 0), (0, extra), (0, 0)))
            f32s = jnp.pad(f32s, ((0, 0), (0, extra), (0, 0)))
        hl = hpm // n

        def local(irr, geo, f32s):
            idx = jax.lax.axis_index(_sh.AXIS)
            row0 = idx * hl - bh
            geo_h = _sh.halo_rows(geo, bh, bh, n, axis=1)
            f32_h = _sh.halo_rows(f32s, bh, bh, n, axis=1)
            for step in steps:
                irr_h = _sh.halo_rows(irr, bh, bh, n, axis=1)
                out = atrous_level(irr_h, geo_h, f32_h, step=step, nch=nch,
                                   ffs=tuple(ffs), size=(h, w),
                                   interpret=interpret, row0=row0)
                irr = out[:, bh:bh + hl]
            return irr

        irr = _sh.smap(local, mesh,
                       in_specs=(P(None, _sh.AXIS, None),) * 3,
                       out_specs=P(None, _sh.AXIS, None))(irr, geo, f32s)
    else:
        for step in steps:
            irr = atrous_level(irr, geo, f32s, step=step, nch=nch,
                               ffs=tuple(ffs), size=(h, w),
                               interpret=interpret)

    irr = irr.astype(jnp.float32)
    return [jnp.stack([irr[3 * c + i, :h] for i in range(3)], axis=-1)
            for c in range(nch)]
