"""Banded channel-plane warp (Pallas): filtered history resampling without
the HWC->lane-pack relayouts of ops/warp2.py.

The TAA/SMAA history fetches (taa.wgsl:75-170, smaa.wgsl:81-271) sample
previous-frame buffers at per-pixel fractional reprojected coords. The v2
warp engine (ops/warp2.py) serves them from 16-channel lane-packed window
DMAs — correct and fast in-kernel, but the HWC->pack interleave plus the
[G, npix, C] unpack around it cost ~10 ms/frame at 1080p, and the kernel
itself plateaus at ~1.7 us/group (14 ms) because every pixel pays a
32-row window regardless of motion.

This kernel exploits the same banded structure as ops/reproj_gather.py
(velocity fields are smooth, so per 8x128-pixel group the integer part of
the source offset deviates from the group mean by |r| <= R for ~all
pixels):

* sources are channel-plane [h, F, w] tensors — built by stacking 2-D
  planes on axis 1 (no minor-dim interleave, unlike the HWC pack);
* per group, ONE [WIN_R, F, 2*128] window is DMA'd at the group-mean
  offset (rows at 1-row granularity, x at 128-lane chunks + one dynamic
  lane roll);
* the separable filter (nearest / bilinear / catmull-rom, the taa.wgsl /
  smaa.wgsl history kernels) is evaluated IN REGISTER: for each of the
  (2R+4)^2 static window shifts, the per-pixel weight is the 1-D filter
  at distance (local_coord - shift) — the filter's finite support makes
  out-of-band shifts contribute exactly zero;
* sources are edge-padded by the window margin, so border taps replicate
  the edge texel — the clamp-to-edge tap semantics of the reference's
  samplers. Sub-band border overlap (coords < 1 px outside) is exact;
  a LARGER off-screen shift clamps coords into a ramp steeper than the
  band, so those border pixels band-clamp (callers reject them via
  boundary tests — taa.wgsl's boundary_miss);
* pixels whose residual falls OUTSIDE the band clamp their local coords
  to the band edge — the same "wrong value at a motion discontinuity"
  contract as warp2's window clamp; every caller rejects those pixels
  via disocclusion tests.

Within the band (|integer residual| <= R) the result matches the direct
per-pixel separable filter to f32 rounding.
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
# window x-chunks: the group footprint is GROUP_W-1+NSH = 133 lanes and the
# roll offset o ranges over [0, 128) — 3 chunks (384 lanes) fit both, so o
# never clamps (a clamped o would shift local coords out of the filter band)
NCK = 3
R = 1                    # integer residual radius around the group mean
NSH = 2 * R + 4          # static shifts per axis (4-tap frame + 2R band)
WIN_R = GROUP_H + NSH - 1
assert NCK * CHUNK >= (GROUP_W - 1 + NSH) + (CHUNK - 1)
_CXF = 64                # x-chunk field bound in the scalar-prefetch pack
# x margin: 64 lanes, PHASE-ALIGNED so a static camera's window origin
# lands at o = 62 and any |group offset| <= 61 px/frame keeps the whole
# 133-lane footprint within the first two chunks — the third chunk's DMA
# is then skipped (pl.when on o)
MX = 64
_O2 = 2 * CHUNK - (GROUP_W - 1 + NSH)   # max o served by 2 chunks
# scratch lane extent: next power of two >= NCK*CHUNK. Mosaic's dynamic
# lane roll (pltpu.roll) SILENTLY MISCOMPILES on non-power-of-two lane
# counts (384: ~100% wrong on a v5e, exact at 512 — see
# tools/debug_warp_band_tpu.py / reproj_gather.SCR_LANES). Only NCK
# chunks are DMA'd; rolled tap lanes stay <= (CHUNK-1) + GROUP_W-1+NSH-1
# = 259 < NCK*CHUNK, so the undefined tail chunk is never read.
SCR_LANES = 1 << (NCK * CHUNK - 1).bit_length()


def _w1d(dist, kind: str):
    """1-D filter weight at signed distance `dist` (finite support)."""
    if kind == "nearest":
        return ((dist <= 0.5) & (dist > -0.5)).astype(jnp.float32)
    if kind == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    if kind == "catmull":
        a = jnp.abs(dist)
        return jnp.where(
            a < 1.0, 1.5 * a**3 - 2.5 * a**2 + 1.0,
            jnp.where(a < 2.0, -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0,
                      0.0))
    raise ValueError(kind)


def _make_kernel(kinds: Sequence[str], fps: Sequence[int]):
    n_src = len(kinds)
    uniq = tuple(sorted(set(kinds)))

    def kernel(pk_ref, ly_ref, lx_ref, *rest):
        srcs = rest[:n_src]
        outs = rest[n_src:2 * n_src]
        scrs = rest[2 * n_src:3 * n_src]
        sem = rest[3 * n_src]
        g = pl.program_id(0)
        n = pl.num_programs(0)

        def fields(gi):
            pk = pk_ref[gi] >> 1
            row0 = pk // (CHUNK * _CXF)
            rem = pk - row0 * (CHUNK * _CXF)
            return row0, rem // CHUNK, jax.lax.rem(rem, CHUNK)

        def dma(slot, gi, s, j, cx, row0):
            return pltpu.make_async_copy(
                srcs[s].at[pl.ds(row0, WIN_R), :, cx + j, :],
                scrs[s].at[slot, :, :, pl.ds(j * CHUNK, CHUNK)],
                sem.at[slot, s, j])

        def start_group(slot, gi):
            row0, cx, o = fields(gi)
            for s in range(n_src):
                for j in range(2):
                    dma(slot, gi, s, j, cx, row0).start()

                # the 3rd chunk only when the roll reaches past 2 chunks
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
        narrow = (pk_ref[g] & 1) == 1
        ly = ly_ref[...]
        lx = lx_ref[...]

        if "nearest" in uniq:
            # 1-hot taps: a (ry, rx) mask per in-band shift pair is ~2.6x
            # fewer VPU ops than the 2-D weighted sum (local coords are
            # clamped to [1, NSH-2-eps], so rounded coords land in
            # [1, NSH-2] — every pixel, in-band or clamped, hits a mask)
            ry = jnp.round(ly).astype(jnp.int32)
            rx = jnp.round(lx).astype(jnp.int32)
            nmask = [[(ry == s) & (rx == t)
                      for t in range(1, NSH - 1)]
                     for s in range(1, NSH - 1)]

        def weighted(win_c, k, shifts):
            wys = [_w1d(ly - s, k) for s in shifts]
            wxs = [_w1d(lx - t, k) for t in shifts]
            acc = jnp.zeros((GROUP_H, GROUP_W), jnp.float32)
            for i, sy_ in enumerate(shifts):
                xacc = jnp.zeros((GROUP_H, GROUP_W), jnp.float32)
                for j, tx in enumerate(shifts):
                    sl = jax.lax.slice(
                        win_c, (sy_, tx), (sy_ + GROUP_H, tx + GROUP_W))
                    xacc = xacc + wxs[j] * sl
                acc = acc + wys[i] * xacc
            return acc

        for s in range(n_src):
            for j in range(2):
                dma(slot, g, s, j, cx_g, row0_g).wait()

            @pl.when(o > _O2)
            def _(s=s):
                dma(slot, g, s, 2, cx_g, row0_g).wait()

            rolled = pltpu.roll(scrs[s][slot], -o, axis=2)
            k = kinds[s]

            def emit(shifts, s=s, k=k, rolled=rolled):
                for c in range(fps[s]):
                    win_c = rolled[:, c, :]      # [WIN_R, NCK*CHUNK]
                    if k == "nearest":
                        acc = jnp.zeros((GROUP_H, GROUP_W), jnp.float32)
                        for sy_ in range(1, NSH - 1):
                            for tx in range(1, NSH - 1):
                                sl = jax.lax.slice(
                                    win_c, (sy_, tx),
                                    (sy_ + GROUP_H, tx + GROUP_W))
                                acc = jnp.where(
                                    nmask[sy_ - 1][tx - 1], sl, acc)
                    else:
                        acc = weighted(win_c, k, shifts)
                    outs[s][:, c, :] = acc

            if k == "nearest":
                emit(None)
            else:
                # narrow groups (every local coord in [2, 3): uniform
                # integer offsets — static scenes and smooth pans) only
                # touch the central 4-tap support: 16 taps instead of 36
                @pl.when(narrow)
                def _():
                    emit(range(1, 5))

                @pl.when(~narrow)
                def _():
                    emit(range(NSH))

    return kernel


def _band_coords(sy, sx, hs_p, ws_p, hp, wp):
    """Group window origins + per-pixel local coords (padded-source frame).

    sy/sx are clamped source coords (+margin shift applied by the caller).
    Returns (pack [G] i32, ly [hp, wp] f32, lx [hp, wp] f32)."""
    gy, gx = hp // GROUP_H, wp // GROUP_W
    yy = jnp.arange(hp, dtype=jnp.float32)[:, None]
    xx = jnp.arange(wp, dtype=jnp.float32)[None, :]
    dy = sy - yy
    dx = sx - xx

    def gmean(v):
        vg = v.reshape(gy, GROUP_H, gx, GROUP_W)
        return jnp.round(vg.mean(axis=(1, 3))).astype(jnp.int32)

    rdy = gmean(dy)
    rdx = gmean(dx)
    gy0 = jnp.arange(gy, dtype=jnp.int32)[:, None] * GROUP_H
    gx0 = jnp.arange(gx, dtype=jnp.int32)[None, :] * GROUP_W
    row0 = jnp.clip(gy0 + rdy - (R + 1), 0, hs_p - WIN_R)
    # xw0 stays in [0, ws_p - NCK*CHUNK + CHUNK - 1] by the margin sizing
    # (left margin MX, right margin >= 2*CHUNK + MX); the clip guards
    # pathological fields only
    xw0 = jnp.clip(gx0 + rdx - (R + 1), 0, ws_p - 2 * CHUNK - 1)
    cx = xw0 // CHUNK
    o = xw0 - cx * CHUNK
    x0 = xw0
    row0_e = jnp.repeat(jnp.repeat(row0, GROUP_H, 0), GROUP_W, 1)
    x0_e = jnp.repeat(jnp.repeat(x0, GROUP_H, 0), GROUP_W, 1)
    py = (jnp.arange(hp, dtype=jnp.float32) % GROUP_H)[:, None]
    px = (jnp.arange(wp, dtype=jnp.float32) % GROUP_W)[None, :]
    # full-support local range for the 4-tap frame: taps floor(l)-1..+2
    # must land in [0, NSH), i.e. l in [1, NSH-2]; out-of-band pixels clamp
    # to the band edge (in-band coords already lie in [1, NSH-2), so no
    # in-band pixel is changed by the clip). The upper bound NSH-2-eps —
    # not NSH-1 — keeps the full 4-tap support inside the static shift
    # loop (catmull weights sum to 1) and rounds inside the nearest-mask
    # range [1, NSH-2].
    ly = jnp.clip(sy - row0_e.astype(jnp.float32) - py, 1.0, NSH - 2 - 1e-3)
    lx = jnp.clip(sx - x0_e.astype(jnp.float32) - px, 1.0, NSH - 2 - 1e-3)
    # narrow groups: every local coord in [2, 3) (uniform integer offsets)
    # -> the weighted kernels' full support is the central 4 shifts
    def gall(m):
        return m.reshape(gy, GROUP_H, gx, GROUP_W).all(axis=(1, 3))

    narrow = gall((ly >= 2.0) & (ly < 3.0) & (lx >= 2.0) & (lx < 3.0))
    pack = (((row0 * _CXF + cx) * CHUNK + o) * 2
            + narrow.astype(jnp.int32)).reshape(-1)
    return pack, ly, lx


def _warp_impl(sources: Sequence, kinds: Sequence[str], sy, sx,
               interpret: bool) -> List:
    """sources: [hs, F_s, w] channel-plane tensors; sy/sx [h, w] f32 source
    coords (pixel centers at integers). Output [h, F_s, w] per source."""
    n_src = len(sources)
    hs, _, w = sources[0].shape
    h = sy.shape[0]
    my, mx = GROUP_H, MX
    hs_p = hs + 2 * my
    # right margin >= 2*CHUNK + MX: window origins near the right edge
    # reach up to mx + w + ~MX, and the NCK-chunk DMA needs 2 more chunks
    ws_p = -(-(w + mx + 2 * CHUNK + MX) // CHUNK) * CHUNK
    assert ws_p // CHUNK - NCK < _CXF, (
        f"render width {w} exceeds the {_CXF}-chunk pack-encoding range")
    srcs = []
    fps = []      # real channel counts (kernel loops these)
    fpads = []    # sublane-aligned counts (Mosaic tiles the channel dim:
                  # window slices of an unaligned dim fail to compile)
    for s in sources:
        assert s.shape[0] == hs and s.shape[2] == w
        fp = s.shape[1]
        fps.append(fp)
        fpad = -(-fp // 8) * 8
        fpads.append(fpad)
        # EDGE padding: margin texels replicate the border, so clamped
        # border taps read the edge value (the samplers' clamp-to-edge)
        sp = jnp.pad(s, ((my, my), (0, fpad - fp), (mx, ws_p - w - mx)),
                     mode="edge")
        srcs.append(sp.reshape(hs_p, fpad, ws_p // CHUNK, CHUNK))
    hp = -(-h // GROUP_H) * GROUP_H
    wp = -(-w // GROUP_W) * GROUP_W
    syp = jnp.pad(jnp.clip(sy, 0.0, hs - 1.0) + my,
                  ((0, hp - h), (0, wp - w)), mode="edge")
    sxp = jnp.pad(jnp.clip(sx, 0.0, w - 1.0) + mx,
                  ((0, hp - h), (0, wp - w)), mode="edge")
    pack, ly, lx = _band_coords(syp, sxp, hs_p, ws_p, hp, wp)
    gy, gx = hp // GROUP_H, wp // GROUP_W
    G = gy * gx

    kernel = _make_kernel(tuple(kinds), tuple(fps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((GROUP_H, GROUP_W),
                               lambda g, pk, gx=gx: (g // gx, g % gx))] * 2
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * n_src,
        out_specs=[pl.BlockSpec((GROUP_H, fpad, GROUP_W),
                                lambda g, pk, gx=gx: (g // gx, 0, g % gx))
                   for fpad in fpads],
        scratch_shapes=[pltpu.VMEM((2, WIN_R, fpad, SCR_LANES),
                                   jnp.float32)
                        for fpad in fpads]
        + [pltpu.SemaphoreType.DMA((2, n_src, NCK))],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, fpad, wp), jnp.float32)
                   for fpad in fpads],
        interpret=interpret,
    )(pack, ly, lx, *srcs)
    return [o[:h, :fp, :w] for o, fp in zip(outs, fps)]


# rows of neighbor-shard context under manual row sharding (same contract
# as reproj_gather.SHARD_HALO: farther motion clamps to the halo edge)
SHARD_HALO = 16


@partial(jax.jit, static_argnames=("kinds", "interpret", "mesh"))
def warp_band(sources: Sequence, kinds, sy, sx,
              interpret: bool = False, mesh=None) -> List:
    """Filtered per-pixel resample of channel-plane sources.

    sources: list of [hs, F_s, w] f32 channel-plane tensors (shared hs/w).
    kinds:   per-source filter — 'nearest' | 'bilinear' | 'catmull'.
    sy, sx:  [h, w] f32 source coordinates (pixel centers at integers).
    Returns  list of [h, F_s, w] f32.

    With a mesh: runs as a shard_map island over rows — each shard warps
    from its block plus SHARD_HALO ppermuted neighbor rows."""
    if not interpret:
        interpret = not any(d.platform != "cpu" for d in jax.devices())
    kinds = tuple(kinds)
    if mesh is None:
        return _warp_impl(sources, kinds, sy, sx, interpret)

    from jax.sharding import PartitionSpec as P

    from hikari_tpu.parallel import shard as _sh

    n = _sh.nshards(mesh)
    h = sy.shape[0]
    hs = sources[0].shape[0]
    if hs != h:
        # sharded callers must pass sources on the output row grid
        return _warp_impl(sources, kinds, sy, sx, interpret)
    hl = -(-h // n)
    hp = hl * n
    if hp > h:
        sources = [jnp.pad(s, ((0, hp - h), (0, 0), (0, 0)), mode="edge")
                   for s in sources]
        sy = jnp.pad(sy, ((0, hp - h), (0, 0)), mode="edge")
        sx = jnp.pad(sx, ((0, hp - h), (0, 0)), mode="edge")

    halo = min(SHARD_HALO, hl)

    def local(sy_l, sx_l, *srcs):
        idx = jax.lax.axis_index(_sh.AXIS)
        base = idx * hl - halo
        # replicate halos at the mesh edges: the single-device sampler
        # edge-pads the source, so border taps must read the boundary row,
        # not the ppermute ring's zeros (parity at the image's first/last
        # rows — tests/test_parallel.py reference-default case)
        srcs_h = [_sh.halo_rows(s, halo, halo, n, axis=0,
                                edge="replicate") for s in srcs]
        # clamp in GLOBAL coords first (the original image extent), then
        # rebase into the halo-extended local block
        sy_g = jnp.clip(sy_l, 0.0, h - 1.0) - base
        return _warp_impl(srcs_h, kinds, sy_g, sx_l, interpret)

    outs = _sh.smap(
        local, mesh,
        in_specs=(P(_sh.AXIS, None), P(_sh.AXIS, None))
        + (P(_sh.AXIS, None, None),) * len(sources),
        out_specs=[P(_sh.AXIS, None, None)] * len(sources))(
            sy, sx, *sources)
    return [o[:h] for o in outs]
