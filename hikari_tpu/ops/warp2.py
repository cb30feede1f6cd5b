"""Warp engine v2: per-group window fetch via in-kernel DMA (Pallas).

Replaces ops/warp.py's XLA window materialization for the hot TAA/SMAA
history fetches. The XLA formulation builds a 9x-overlapping window tensor
plus a row-gather plus layout copies (~45 ms at 1080p F=10, profiled); this
kernel instead DMAs ONE [wb, wrows, 128] window per 16x16-pixel group
directly from a compact block tensor and applies the separable filter
weights in VMEM (measured 8 ms at 1080p F=16 on v5e, tools/probe_warp_proto).

Key layout facts (measured/verified on this toolchain):
- dynamic LANE offsets in DMA slices are rejected by Mosaic ("tile index in
  dimension 2 is divisible by the tiling"), so the window's x-offset rides a
  NON-tiled outer dim: panels p[hb, wbt, 8, 128] (8 rows x 8 pixels x 16
  channels per block) and each group DMAs the WBxWB block window
  p[by:by+WB, bx:bx+WB] (sliced leading dims only).
- scalar-prefetch operands are row-padded in SMEM: pack (by, bx) into ONE
  i32 per group or a [G, 2] table blows the 1 MB SMEM budget.
- all reduces for one source share the single window DMA (reduces arg).
- the per-pixel x filter weight is evaluated once on [npix, 32] and spread
  to the 8px*16ch lane layout by an MXU dot with a 0/1 expansion matrix
  (exact: the bf16 3-pass f32 decomposition is exact against 0/1).

Semantics match ops/warp.py: group-mean-centered window, edge clamping of
local coords (pixels whose source strays past the window clamp to its edge
— exactly the silhouette pixels every caller rejects via disocclusion),
'nearest'/'bilinear'/'catmull' kernels, per-reduce (dy, dx) offsets and
channel slices.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16
FP = 16          # channels per pixel (padded); 8 px * FP = 128 lanes
BLK = 128
WB = GROUP // 8 + 2   # window blocks across = 4
WROWS = 8 * WB        # window rows = 32
B = 8                 # groups per grid step


def _margin(kernel: str) -> float:
    return 2.0 if kernel == "catmull" else 1.0


def _weights(dist, kernel: str):
    """dist: local minus tap position; returns the filter weight."""
    if kernel == "nearest":
        return ((jnp.abs(dist) <= 0.5) & (dist > -0.5)).astype(jnp.float32)
    if kernel == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    if kernel == "catmull":
        a = jnp.abs(dist)
        return jnp.where(
            a < 1.0, 1.5 * a**3 - 2.5 * a**2 + 1.0,
            jnp.where(a < 2.0, -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0,
                      0.0))
    raise ValueError(kernel)


def _make_kernel(reduces: Tuple[Tuple[str, Tuple[float, float],
                                      Tuple[int, int]], ...],
                 dtype):
    def kernel(byx_ref, p_any, ly, lx, *rest):
        nred = len(reduces)
        outs = rest[:nred]
        scr, sem = rest[nred], rest[nred + 1]
        b = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, bi, k):
            g = bi * B + k
            packed = byx_ref[g]
            by = jax.lax.div(packed, 4096)
            bx = jax.lax.rem(packed, 4096)
            # window = WBxWB panel blocks straight out of the compact panel
            # tensor (the old pre-stacked V tensor duplicated every row 4x:
            # ~2 ms of XLA concats + 4x the DMA bytes at 1080p)
            return pltpu.make_async_copy(
                p_any.at[pl.ds(by, WB), pl.ds(bx, WB)], scr.at[slot, k],
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

        npix = GROUP * GROUP
        yy = jax.lax.broadcasted_iota(jnp.int32, (npix, WROWS), 1).astype(
            jnp.float32)
        # x-weight expansion matrix: E[s, BLK*i + l] = (s == 8i + l//FP).
        # The x weight is identical for the FP channels of a pixel, so it is
        # evaluated ONCE on [npix, WROWS] and spread to lane layout by one
        # MXU dot (evaluating the filter directly on [npix, BLK] per block
        # was ~3.4M VPU ops/group — the round-3 profile's 15 ms TAA warp).
        sidx = jax.lax.broadcasted_iota(jnp.int32, (WROWS, WB * BLK), 0)
        lidx = jax.lax.broadcasted_iota(jnp.int32, (WROWS, WB * BLK), 1)
        expand = (sidx == (lidx // BLK) * 8
                  + jax.lax.rem(lidx, BLK) // FP).astype(dtype)
        for k in range(B):
            dma(slot, b, k).wait()
            # contraction inputs stay in the window dtype (f32 accumulate):
            # for bf16 windows the MXU runs natively (f32 inputs cost a
            # 3-pass decomposition); f32 windows keep full fidelity for
            # callers that asked for it. All reduces ride ONE pair of MXU
            # dots with the per-reduce weight rows stacked on M (4 dots +
            # 4 weight spreads per reduce measured ~2 ms/frame slower).
            win = jnp.concatenate(
                [scr[slot, k, :, i].reshape(WROWS, BLK) for i in range(WB)],
                axis=1)  # [WROWS, WB*BLK]
            wys, wxs = [], []
            for (kname, (offy, offx), _) in reduces:
                m = _margin(kname)
                lyv = jnp.clip(ly[k, :] + offy, m - 1.0, WROWS - m)
                lxv = jnp.clip(lx[k, :] + offx, m - 1.0, WROWS - m)
                wys.append(_weights(lyv[:, None] - yy, kname).astype(dtype))
                wxs.append(_weights(lxv[:, None] - yy, kname).astype(dtype))
            wy_all = jnp.concatenate(wys, axis=0)   # [nred*npix, WROWS]
            wx_all = jnp.concatenate(wxs, axis=0)
            wxe = jnp.dot(wx_all, expand, preferred_element_type=jnp.float32)
            t = jnp.dot(wy_all, win, preferred_element_type=jnp.float32)
            s = t * wxe                              # [nred*npix, WB*BLK]
            s128 = s[:, :BLK]
            for i in range(1, WB):
                s128 = s128 + s[:, i * BLK:(i + 1) * BLK]
            acc = s128[:, :FP]
            for j in range(1, 8):
                acc = acc + s128[:, j * FP:(j + 1) * FP]
            # write only the requested channel range: slicing the full
            # [G, npix, 16] output afterwards costs a real pass (3.25
            # ms profiled for the TAA aux slice at 1080p)
            for r, (_, _, (lo, hi)) in enumerate(reduces):
                outs[r][k, :, :] = acc[r * npix:(r + 1) * npix, lo:hi]

    return kernel


def warp_multi(src, sy, sx,
               reduces: Sequence[Tuple[str, Tuple[float, float],
                                       Tuple[int, int]]],
               dtype=jnp.float32) -> List:
    """Sample `src` [H, W, F<=16] at per-pixel source coords (sy, sx) [h, w]
    with one or more filters sharing one window fetch.

    reduces: list of (kernel, (dy, dx) offset, (ch_lo, ch_hi)).
    dtype: window storage dtype. bf16 halves the pack/V/DMA bytes — use it
    for color/position/velocity packs; keep f32 when the pack carries
    instance IDS (bf16 is exact only to 256) or other exact integers.
    Returns a list of [h, w, ch_hi-ch_lo] f32 arrays.

    Under an active row mesh (parallel/shard.py) the call runs as a
    shard_map island: each shard packs and warps its own rows, with
    _SHARD_HALO_BLOCKS ppermuted panel blocks of vertical context;
    reprojection beyond the halo clamps to the window edge exactly like
    the single-chip out-of-window contract."""
    from hikari_tpu.parallel import shard as _sh

    mesh = _sh.active_mesh()
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        n = _sh.nshards(mesh)
        H, W, F = src.shape
        h, w = sy.shape
        # output and source shards must cover PROPORTIONAL row ranges:
        # shard i's output rows [i*hh/n, ...) sample sources around
        # r*(those rows), which must lie in its source block [i*Hp/n, ...)
        r = H // h
        if r * h != H:
            # non-integral source/output row ratio: keep the call
            # replicated (correct, unscaled) rather than mis-shard it
            return _warp_core(src, sy, sx, reduces, dtype)
        hh = -(-h // (n * GROUP)) * (n * GROUP)
        Hp = hh * r
        if hh > h:
            sy = jnp.pad(sy, ((0, hh - h), (0, 0)), mode="edge")
            sx = jnp.pad(sx, ((0, hh - h), (0, 0)), mode="edge")
        if Hp > H:
            src = jnp.pad(src, ((0, Hp - H), (0, 0), (0, 0)), mode="edge")
        Hl = Hp // n
        halo_b = min(_SHARD_HALO_BLOCKS, Hl // 8)

        def local(src_l, sy_l, sx_l):
            idx = jax.lax.axis_index(_sh.AXIS)
            # window origins are computed in GLOBAL coords and rebased, so
            # in-halo windows land exactly where the single-chip call puts
            # them (incl. global edge clips); only out-of-halo motion
            # clamps differently (the out-of-window reject contract)
            block_base = idx * (Hl // 8) - halo_b
            # the global clip bound uses the ORIGINAL source extent (the
            # proportionality padding above must not widen the reachable
            # window range vs the single-chip call)
            outs = _warp_core(src_l, jnp.clip(sy_l, 0.0, H - 1.0), sx_l,
                              reduces, dtype, halo_blocks=halo_b,
                              n_shards=n, block_base=block_base,
                              hb_glob=max(-(-H // 8), WB))
            return outs

        outs = _sh.smap(
            local, mesh,
            in_specs=(P(_sh.AXIS, None, None), P(_sh.AXIS, None),
                      P(_sh.AXIS, None)),
            out_specs=[P(_sh.AXIS, None, None)] * len(reduces))(
                src, sy, sx)
        return [o[:h] for o in outs]
    return _warp_core(src, sy, sx, reduces, dtype)


# vertical panel blocks (8 rows each) exchanged per side under sharding
_SHARD_HALO_BLOCKS = 4


def _warp_core(src, sy, sx, reduces, dtype, halo_blocks: int = 0,
               n_shards: int = 1, block_base=None, hb_glob=None):
    H, W, F = src.shape
    assert F <= FP, "pack at most 16 channels per warp source"
    h, w = sy.shape
    on_tpu = any(d.platform != "cpu" for d in jax.devices())

    # ---- group geometry
    hh = -(-h // GROUP) * GROUP
    ww = -(-w // GROUP) * GROUP
    if (hh, ww) != (h, w):
        sy = jnp.pad(sy, ((0, hh - h), (0, ww - w)), mode="edge")
        sx = jnp.pad(sx, ((0, hh - h), (0, ww - w)), mode="edge")
    # sharded local calls pass GLOBAL sy (already clipped); single-chip
    # clips here
    if block_base is None:
        sy = jnp.clip(sy, 0.0, H - 1.0)
    sx = jnp.clip(sx, 0.0, W - 1.0)
    gy, gx = hh // GROUP, ww // GROUP
    G0 = gy * gx
    G = -(-G0 // B) * B

    # ---- compact panel tensor p [hb, wbt, 8, 128]; the kernel DMAs a
    # WBxWB block window per group directly from it
    hb = -(-H // 8)
    wbt = -(-W // 8)
    pad_h = hb * 8 - H
    pad_w = wbt * 8 - W
    srcp = src.astype(dtype)
    if FP > F:  # channel pad: zeros (edge-mode lowered to pad+max fusions)
        srcp = jnp.concatenate(
            [srcp, jnp.zeros((H, W, FP - F), dtype)], axis=-1)
    if pad_h or pad_w:
        srcp = jnp.pad(srcp, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    p = srcp.reshape(hb, 8, wbt, 8 * FP).transpose(0, 2, 1, 3)
    if halo_blocks:
        from hikari_tpu.parallel import shard as _sh

        p = _sh.halo_rows(p, halo_blocks, halo_blocks, n_shards, axis=0)
        hb = p.shape[0]
    # tiny sources: guarantee at least WB blocks each way (edge clones)
    if hb < WB:
        p = jnp.concatenate([p] + [p[-1:]] * (WB - hb), axis=0)
    if wbt < WB:
        p = jnp.concatenate([p] + [p[:, -1:]] * (WB - wbt), axis=1)

    # ---- per-group base blocks + local coords (window fully interior:
    # by <= hb-WB keeps the WBxWB DMA in range, and every clipped source
    # row/col 0..H-1 stays inside the shifted window)
    sy_g = sy.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
    sx_g = sx.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
    y_mean = sy_g.mean(axis=(2, 3))
    x_mean = sx_g.mean(axis=(2, 3))
    if block_base is None:
        by = jnp.clip(jnp.round((y_mean - WROWS / 2) / 8).astype(jnp.int32),
                      0, max(p.shape[0] - WB, 0))
        by_origin = by
    else:
        by_g = jnp.clip(jnp.round((y_mean - WROWS / 2) / 8).astype(jnp.int32),
                        0, hb_glob - WB)
        by = jnp.clip(by_g - block_base, 0, max(p.shape[0] - WB, 0))
        by_origin = by + block_base  # global row-block of the window top
    bx = jnp.clip(jnp.round((x_mean - WROWS / 2) / 8).astype(jnp.int32),
                  0, max(p.shape[1] - WB, 0))
    npix = GROUP * GROUP
    ly = (sy_g - (by_origin * 8)[:, :, None, None]).reshape(G0, npix)
    lx = (sx_g - (bx * 8)[:, :, None, None]).reshape(G0, npix)
    byx = (by * 4096 + bx).reshape(G0)
    if G != G0:
        pad = G - G0
        ly = jnp.concatenate([ly, jnp.zeros((pad, npix))], axis=0)
        lx = jnp.concatenate([lx, jnp.zeros((pad, npix))], axis=0)
        byx = jnp.concatenate([byx, jnp.zeros((pad,), jnp.int32)], axis=0)

    red_key = tuple((k, (float(oy), float(ox)), (int(lo), int(hi)))
                    for k, (oy, ox), (lo, hi) in reduces)
    kernel = _make_kernel(red_key, dtype)
    nred = len(reduces)
    widths = [hi - lo for _, _, (lo, hi) in reduces]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((B, npix), lambda g, byx: (g, 0)),
            pl.BlockSpec((B, npix), lambda g, byx: (g, 0)),
        ],
        out_specs=[pl.BlockSpec((B, npix, wd), lambda g, byx: (g, 0, 0))
                   for wd in widths],
        scratch_shapes=[
            pltpu.VMEM((2, B, WB, WB, 8, BLK), dtype),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, npix, wd), jnp.float32)
                   for wd in widths],
        interpret=not on_tpu,
    )
    outs = fn(byx, p, ly, lx)
    results = []
    for wd, o in zip(widths, outs):
        full = (o[:G0].reshape(gy, gx, GROUP, GROUP, wd)
                .transpose(0, 2, 1, 3, 4).reshape(hh, ww, wd))
        results.append(full[:h, :w])
    return results
