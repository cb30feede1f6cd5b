"""Banded per-pixel reprojection gather (Pallas).

The temporal-reuse path must fetch each pixel's previous-frame reservoir at
its reprojected coords (light.wgsl:1089). The XLA row-gather formulation
(`jnp.take` of a [h*w, 16F] table) lowered to a 103 ms/frame kCustom
gather at 1080p (round-3 profile) — element-strided reads. This kernel
exploits the banded structure of reprojection (source coords deviate from
each pixel's position by a smooth velocity field):

* per 8x128-pixel group, the mean integer offset (rdy, rdx) centers a
  [GROUP_H+2R, GROUP_W+margin] window; the window is DMA'd from the
  channel-plane source [h, F, w] (rows at 1-row granularity, x at
  128-lane chunks + one dynamic lane roll for sub-chunk alignment);
* each pixel's residual (source minus position minus group mean) is an
  integer in [-R, R]^2 for smooth motion, so the gather collapses to
  (2R+1)^2 static tap slices selected by a precomputed tap code;
* pixels whose residual falls outside the band (motion-field
  discontinuities: object silhouettes under fast motion) return ZEROS —
  an empty reservoir, i.e. the same "start fresh" outcome the
  depth/normal/instance gates produce at disocclusions.

Within the band the result is bit-exact vs `jnp.take` (pure selection,
no arithmetic on the values — safe for bit-packed reservoir fields).

Sources use the channel-plane layout [h, F, w] (matching the physical
layout XLA already chooses for [h, w, F] carries, without the logical
transpose that forced relayouts).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_H = 8
GROUP_W = 128
CHUNK = 128
NCK = 2                 # window x-chunks (256 px)
R = 1                   # residual radius (around the group-mean offset)
# the zero margins keep window origins unclamped, so the tap ranges only
# need the residual band itself (+1 x tap for the o<=_O_MAX roll clamp)
YT = 2 * R + 1          # y taps
XT = 2 * R + 2          # x taps
WIN_R = GROUP_H + YT - 1          # window rows
_O_MAX = NCK * CHUNK - (GROUP_W - 1 + XT)  # max in-window roll offset
# scalar-prefetch pack encoding (row0, cx, o) -> (row0*CXF + cx)*CHUNK + o;
# CXF bounds the padded source's x-chunk count (64 chunks = ~8k px wide)
_CXF = 64


def _make_kernel(n_src: int, fp: int):
    def kernel(pk_ref, code_ref, *rest):
        srcs = rest[:n_src]
        outs = rest[n_src:2 * n_src]
        scr, sem = rest[2 * n_src], rest[2 * n_src + 1]
        g = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, gi, s, j):
            pk = pk_ref[gi]
            row0 = pk // (CHUNK * _CXF)
            rem = pk - row0 * (CHUNK * _CXF)
            cx = rem // CHUNK
            return pltpu.make_async_copy(
                srcs[s].at[pl.ds(row0, WIN_R), :, cx + j, :],
                scr.at[slot, s, :, :, pl.ds(j * CHUNK, CHUNK)],
                sem.at[slot, s, j])

        @pl.when(g == 0)
        def _():
            for s in range(n_src):
                for j in range(NCK):
                    dma(0, 0, s, j).start()

        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n)
        def _():
            for s in range(n_src):
                for j in range(NCK):
                    dma(jax.lax.rem(g + 1, 2), g + 1, s, j).start()

        o = jax.lax.rem(pk_ref[g], CHUNK)
        code = code_ref[...]
        masks = [code == k for k in range(YT * XT)]
        for s in range(n_src):
            for j in range(NCK):
                dma(slot, g, s, j).wait()
            rolled = pltpu.roll(scr[slot, s], -o, axis=2)
            for c in range(fp):
                win_c = rolled[:, c, :]          # [WIN_R, NCK*CHUNK]
                acc = jnp.zeros((GROUP_H, GROUP_W), jnp.float32)
                for dy in range(YT):
                    for dx in range(XT):
                        sl = jax.lax.slice(
                            win_c, (dy, dx), (dy + GROUP_H, dx + GROUP_W))
                        acc = acc + jnp.where(
                            masks[dy * XT + dx], sl, 0.0)
                outs[s][:, c, :] = acc

    return kernel


def _group_pack(piy, pix, yhi, xhi, hp, wp, hs_p, ws_p):
    """Per-group window origin + tap code. piy/pix are SOURCE coords
    (already margin-shifted into the padded source array of hs_p x ws_p);
    the output grid is hp x wp. Valid source coords are [0, yhi) x
    [0, xhi) (the real data region inside the padded source). Returns
    (pack [G] i32, code [hp, wp] i32)."""
    gy, gx = hp // GROUP_H, wp // GROUP_W
    yy = jnp.arange(hp, dtype=jnp.int32)[:, None]
    xx = jnp.arange(wp, dtype=jnp.int32)[None, :]
    dy = piy - yy                     # per-pixel integer offset (+margin)
    dx = pix - xx
    # group means over pixels whose source is REAL: padded/rejected
    # sources would otherwise drag the window origin off the live band
    live = ((piy >= 0) & (piy < yhi) & (pix >= 0) & (pix < xhi)).astype(
        jnp.float32)

    def gmean(v):
        vg = (v.astype(jnp.float32) * live).reshape(gy, GROUP_H, gx, GROUP_W)
        n = live.reshape(gy, GROUP_H, gx, GROUP_W).sum(axis=(1, 3))
        return jnp.round(vg.sum(axis=(1, 3))
                         / jnp.maximum(n, 1.0)).astype(jnp.int32)

    rdy = gmean(dy)                                            # [gy, gx]
    rdx = gmean(dx)
    gy0 = jnp.arange(gy, dtype=jnp.int32)[:, None] * GROUP_H
    gx0 = jnp.arange(gx, dtype=jnp.int32)[None, :] * GROUP_W
    # center the slack (YT-1-2R extra rows / XT-1-2R extra cols) around
    # the mean so both residual signs keep full +-R coverage
    row0 = jnp.clip(gy0 + rdy - R - (YT - 1 - 2 * R) // 2, 0, hs_p - WIN_R)
    xw0 = gx0 + rdx - R - (XT - 1 - 2 * R) // 2
    cx = jnp.clip(xw0 // CHUNK, 0, ws_p // CHUNK - NCK)
    o = jnp.clip(xw0 - cx * CHUNK, 0, _O_MAX)
    x0 = cx * CHUNK + o
    pack = (row0 * _CXF + cx) * CHUNK + o                      # [gy, gx]
    # tap code vs the ACTUAL window origin (clamps self-invalidate)
    row0_e = jnp.repeat(jnp.repeat(row0, GROUP_H, 0), GROUP_W, 1)
    x0_e = jnp.repeat(jnp.repeat(x0, GROUP_H, 0), GROUP_W, 1)
    py = yy % GROUP_H
    px = xx % GROUP_W
    dyi = piy - row0_e - py
    dxi = pix - x0_e - px
    ok = ((dyi >= 0) & (dyi < YT) & (dxi >= 0) & (dxi < XT)
          & (live > 0.0))
    code = jnp.where(ok, dyi * XT + dxi, -1)
    return pack.reshape(-1), code


def _gather_impl(sources: Sequence, piy, pix, interpret: bool) -> List:
    """sources: [hs, F, w] channel-plane tensors; piy/pix: [h, w] i32
    source coords in [0, hs) x [0, w) (out-of-range rejects). Output
    [h, F, w]; h may differ from hs (sharded local calls pass halo-extended
    sources)."""
    n_src = len(sources)
    hs, fp, w = sources[0].shape
    h = piy.shape[0]
    # zero margins on the SOURCE so window origins never clamp (clamped
    # windows would misalign the static tap range and reject whole edge
    # groups under motion)
    my, mx = GROUP_H, CHUNK
    hs_p = hs + 2 * my
    ws_p = -(-(w + 2 * mx) // CHUNK) * CHUNK
    # the pack encoding's cx field must hold every window chunk index;
    # fail loudly instead of silently corrupting gathered reservoirs
    assert ws_p // CHUNK - NCK < _CXF, (
        f"render width {w} exceeds the {_CXF}-chunk pack-encoding range")
    srcs = []
    for s in sources:
        assert s.shape == (hs, fp, w)
        sp = jnp.pad(s, ((my, my), (0, 0), (mx, ws_p - w - mx)))
        # 128-lane x-chunk view (free: splits the minor dim)
        srcs.append(sp.reshape(hs_p, fp, ws_p // CHUNK, CHUNK))
    # output grid padded to group multiples
    hp = -(-h // GROUP_H) * GROUP_H
    wp = -(-w // GROUP_W) * GROUP_W
    piy = jnp.pad(piy.astype(jnp.int32) + my, ((0, hp - h), (0, wp - w)),
                  constant_values=-1)
    pix = jnp.pad(pix.astype(jnp.int32) + mx, ((0, hp - h), (0, wp - w)),
                  constant_values=-1)
    pack, code = _group_pack(piy, pix, my + hs, mx + w, hp, wp, hs_p, ws_p)
    gy, gx = hp // GROUP_H, wp // GROUP_W
    G = gy * gx

    kernel = _make_kernel(n_src, fp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((GROUP_H, GROUP_W),
                               lambda g, pk, gx=gx: (g // gx, g % gx))]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * n_src,
        out_specs=[pl.BlockSpec((GROUP_H, fp, GROUP_W),
                                lambda g, pk, gx=gx: (g // gx, 0, g % gx))]
        * n_src,
        scratch_shapes=[
            pltpu.VMEM((2, n_src, WIN_R, fp, NCK * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_src, NCK)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, fp, wp), jnp.float32)] * n_src,
        interpret=interpret,
    )(pack, code, *srcs)
    return [o[:h, :, :w] for o in outs]


# rows of neighbor-shard context exchanged under manual sharding; sources
# whose reprojection strays further reject (same contract as out-of-band)
SHARD_HALO = 16


@partial(jax.jit, static_argnames=("interpret", "mesh"))
def reproj_gather(sources: Sequence, piy, pix,
                  interpret: bool = False, mesh=None) -> List:
    """sources: list of [h, F, w] f32 channel-plane tensors (same h/F/w).
    piy/pix: [h, w] i32 source coords. Returns list of [h, F, w] with
    out[y, :, x] = src[piy, :, pix] for in-band pixels, zeros otherwise.

    With a mesh: runs as a shard_map island over rows — each shard gathers
    from its own block plus SHARD_HALO ppermuted neighbor rows."""
    if not interpret:
        interpret = not any(d.platform != "cpu" for d in jax.devices())
    if mesh is None:
        return _gather_impl(sources, piy, pix, interpret)

    from jax.sharding import PartitionSpec as P

    from hikari_tpu.parallel import shard as _sh

    n = _sh.nshards(mesh)
    h, fp, w = sources[0].shape
    hl = -(-h // n)
    hp = hl * n
    if hp > h:
        sources = [jnp.pad(s, ((0, hp - h), (0, 0), (0, 0)))
                   for s in sources]
        piy = jnp.pad(piy, ((0, hp - h), (0, 0)))
        pix = jnp.pad(pix, ((0, hp - h), (0, 0)))

    halo = min(SHARD_HALO, hl)

    def local(piy, pix, *srcs):
        idx = jax.lax.axis_index(_sh.AXIS)
        base = idx * hl - halo
        srcs_h = [_sh.halo_rows(s, halo, halo, n, axis=0)
                  for s in srcs]
        piy_l = piy.astype(jnp.int32) - base
        return _gather_impl(srcs_h, piy_l, pix, interpret)

    outs = _sh.smap(
        local, mesh,
        in_specs=(P(_sh.AXIS, None), P(_sh.AXIS, None))
        + (P(_sh.AXIS, None, None),) * len(sources),
        out_specs=[P(_sh.AXIS, None, None)] * len(sources))(
            piy, pix, *sources)
    return [o[:h] for o in outs]
