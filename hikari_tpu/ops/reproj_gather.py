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
# window x-chunks: the tap footprint is GROUP_W-1+XT = 132 lanes and the
# roll offset o ranges over [0, 256) after right-edge cx clamping — 3
# chunks (384 lanes) fit both, so the roll NEVER shifts the tap range
# (with 2 chunks the o-clamp sliver shifted it on ~2% of groups —
# including every static-camera group — silently rejecting their +dev
# pixels). The x margin below is PHASE-ALIGNED so typical motion keeps
# o <= _O2 and the third chunk's DMA is skipped entirely.
NCK = 3
R = 1                   # y residual radius (around the group-mean offset)
YT = 2 * R + 1          # y taps: dev_y in [-R, R]
# x taps: a SYMMETRIC +-(R+1) band — zoom/rotation ramp linearly across
# the 128-lane group (a 2%/frame zoom sweeps +-1.3 px + rounding), so the
# x band needs one more tap each side than y's 8-row extent does
XT = 2 * (R + 1) + 1
WIN_R = GROUP_H + YT - 1          # window rows
# x margin: 64 lanes each side, so a group's window origin sits at
# o = (64 - R - 1 + rdx) mod 128 — static cameras land at o = 62 and any
# |rdx| <= 62 px/frame stays within the FIRST TWO chunks (o <= _O2); only
# faster pans or right-edge cx clamps fetch the third chunk
MX = 64
_O2 = 2 * CHUNK - (GROUP_W - 1 + XT)       # max o served by 2 chunks
_O_MAX = NCK * CHUNK - (GROUP_W - 1 + XT)  # max in-window roll offset
# scratch lane extent: the next power of two >= NCK*CHUNK. Mosaic's
# dynamic-shift lane roll (pltpu.roll) SILENTLY MISCOMPILES on
# non-power-of-two lane counts (384 lanes: ~69% wrong values on a v5e,
# bit-exact at 512 — tools/debug_reproj_tpu.py; interpret mode hides it).
# Only NCK chunks are ever DMA'd; the tail chunk is never read because
# rolled tap lanes stay <= _O_MAX + GROUP_W-1+XT-1 = NCK*CHUNK - 1.
SCR_LANES = 1 << (NCK * CHUNK - 1).bit_length()
_O_RADIX = 256                             # o field width in the pack
assert _O_MAX < _O_RADIX
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

        def fields(gi):
            pk = pk_ref[gi] >> 1
            row0 = pk // (_O_RADIX * _CXF)
            rem = pk - row0 * (_O_RADIX * _CXF)
            return row0, rem // _O_RADIX, jax.lax.rem(rem, _O_RADIX)

        def dma(slot, gi, s, j, cx, row0):
            return pltpu.make_async_copy(
                srcs[s].at[pl.ds(row0, WIN_R), :, cx + j, :],
                scr.at[slot, s, :, :, pl.ds(j * CHUNK, CHUNK)],
                sem.at[slot, s, j])

        def start_group(slot, gi):
            row0, cx, o = fields(gi)
            for s in range(n_src):
                for j in range(2):
                    dma(slot, gi, s, j, cx, row0).start()

                # 3rd chunk only when the roll reaches past 2 chunks
                @pl.when(o > _O2)
                def _(s=s):
                    dma(slot, gi, s, 2, cx, row0).start()

        @pl.when(g == 0)
        def _():
            start_group(0, 0)

        slot = jax.lax.rem(g, 2)

        @pl.when(g + 1 < n)
        def _():
            start_group(jax.lax.rem(g + 1, 2), g + 1)

        row0_g, cx_g, o = fields(g)
        wide = (pk_ref[g] & 1) == 1
        code = code_ref[...]

        def gather_src(s, dxs):
            """Sum of masked static tap slabs over ALL fp planes at once
            (one select per tap instead of one per (tap, channel))."""
            rolled = pltpu.roll(scr[slot, s], -o, axis=2)
            acc = jnp.zeros((GROUP_H, fp, GROUP_W), jnp.float32)
            for dy in range(YT):
                for dx in dxs:
                    sl = jax.lax.slice(
                        rolled, (dy, 0, dx),
                        (dy + GROUP_H, fp, dx + GROUP_W))
                    acc = acc + jnp.where(
                        (code == dy * XT + dx)[:, None, :], sl, 0.0)
            return acc

        for s in range(n_src):
            for j in range(2):
                dma(slot, g, s, j, cx_g, row0_g).wait()

            @pl.when(o > _O2)
            def _(s=s):
                dma(slot, g, s, 2, cx_g, row0_g).wait()

            # two-tier tap loop: groups whose residuals stay in the +-R
            # core band (static scenes, smooth pans — the common case)
            # skip the outer x taps entirely
            @pl.when(~wide)
            def _(s=s):
                outs[s][...] = gather_src(s, range(1, XT - 1))

            @pl.when(wide)
            def _(s=s):
                outs[s][...] = gather_src(s, range(XT))

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
    # o absorbs right-edge cx clamps (o > CHUNK-1 is valid: the 3-chunk
    # window covers any roll <= _O_MAX); pathological fields clip
    o = jnp.clip(xw0 - cx * CHUNK, 0, _O_MAX)
    x0 = cx * CHUNK + o
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
    # per-group wide flag: any valid tap using the outer x columns
    # (dev = +-(R+1)) forces the kernel's 15-tap branch; the common
    # narrow band takes the 9-tap branch
    outer = ok & ((dxi == 0) | (dxi == XT - 1))
    wide = outer.reshape(gy, GROUP_H, gx, GROUP_W).any(axis=(1, 3))
    pack = (((row0 * _CXF + cx) * _O_RADIX + o) * 2
            + wide.astype(jnp.int32))                          # [gy, gx]
    return pack.reshape(-1), code


def _gather_impl(sources: Sequence, piy, pix, interpret: bool) -> List:
    """sources: [hs, F, w] channel-plane tensors; piy/pix: [h, w] i32
    source coords in [0, hs) x [0, w) (out-of-range rejects). Output
    [h, F, w]; h may differ from hs (sharded local calls pass halo-extended
    sources)."""
    n_src = len(sources)
    hs, fp, w = sources[0].shape
    h = piy.shape[0]
    # zero margins on the SOURCE so window origins never clamp for motion
    # within the margin (clamped windows land at larger o, still covered by
    # the 3-chunk window; only >margin motion rejects at the edges)
    my, mx = GROUP_H, MX
    hs_p = hs + 2 * my
    # at least NCK chunks so the window's chunk indices always exist
    ws_p = max(-(-(w + 2 * mx) // CHUNK) * CHUNK, NCK * CHUNK)
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
            pltpu.VMEM((2, n_src, WIN_R, fp, SCR_LANES), jnp.float32),
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
        # pad with -1 (reject), NOT 0: zero is a VALID source row, and the
        # pad rows would otherwise count as live in their group's mean,
        # dragging the window origin away from the single-device placement
        piy = jnp.pad(piy, ((0, hp - h), (0, 0)), constant_values=-1)
        pix = jnp.pad(pix, ((0, hp - h), (0, 0)), constant_values=-1)

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
