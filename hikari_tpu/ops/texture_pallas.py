"""Banded Pallas texture sampler for COHERENT uv fields (primary surface).

The reference samples per-pixel textures from a Vulkan `binding_array`
inside the lighting kernel (light.wgsl:749-793; pipelines specialized on
texture count, light.rs:96-174). TPUs have no per-lane gather, and the XLA
lowering of `sample_atlas` is a row gather measured at ~18 ms per bilinear
tap at 1080p (~9 ns/row) — 16 taps per surface retrieval. Primary-surface
uv fields are screen-coherent, so this kernel exploits the same structure
as ops/warp2.py:

* the atlas is pre-tiled ONCE at scene compile into panel blocks
  `atlas_panels [4, Ah/8, Aw/128, 8, 128]` (channel-major; leading dims are
  untiled, so a window DMA slices them dynamically — the Mosaic-legal way
  to get a dynamic window origin, see warp2.py notes);
* per 16x16-pixel group, ONE async copy fetches a [4, WRB, 2, 8, 128]
  window (WRB*8 x 256 texels x 4 channels) centered on the group's mean
  texel coordinate;
* separable bilinear = one MXU dot for the y pass ([npix, WR] weights x
  [WR, 4*256] window) and an elementwise x-weight multiply; the per-channel
  lane reduction is ONE more MXU dot with a 0/1 segment matrix.

Contract (mirrors ops/reproj_gather.py's banded philosophy): pixels whose
texel footprint falls outside the group window CLAMP to the window edge.
For primary surfaces the footprint leaves the window only under heavy
minification (texel/pixel ratio beyond ~WIN_ROWS/16) or when one group
spans two distant atlas rects; tools/probe_texture_window.py measures both
on the example scenes. Repeat addressing is exact: pack_atlas stores every
texture with a 1-texel wrapped border, so the ix=-1 / ix=w taps of a
wrapped bilinear footprint read real texels (models/material.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16            # pixels per group side (npix = 256)
NPIX = GROUP * GROUP
BLK = 128             # atlas lane-block width (texels)
WCB = 2               # window col blocks  -> 256 texels
WRB = 8               # window row blocks  -> 64 texel rows
WR = WRB * 8
B = 8                 # groups per grid step (sublane-divisible block dim)


def atlas_to_panels(atlas: np.ndarray, dtype=np.float32) -> np.ndarray:
    """[Ah, Aw, 4] atlas -> [4, hb, wb, 8, 128] channel-major panel blocks
    (built once at scene compile; rows/cols padded to block multiples, and
    at least one full window so tiny atlases never clamp the DMA)."""
    ah, aw = atlas.shape[:2]
    hb = max(-(-ah // 8), WRB)
    wb = max(-(-aw // BLK), WCB)
    a = np.zeros((hb * 8, wb * BLK, 4), dtype)
    a[:ah, :aw] = atlas
    return np.ascontiguousarray(
        a.reshape(hb, 8, wb, BLK, 4).transpose(4, 0, 2, 1, 3)).astype(dtype)


def _kernel(byx_ref, panels, ly, lx, out, scr, sem):
    b = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, bi, k):
        packed = byx_ref[bi * B + k]
        by = jax.lax.div(packed, 4096)
        bx = jax.lax.rem(packed, 4096)
        return pltpu.make_async_copy(
            panels.at[:, pl.ds(by, WRB), pl.ds(bx, WCB)],
            scr.at[slot, k], sem.at[slot, k])

    @pl.when(b == 0)
    def _():
        for k in range(B):
            dma(0, 0, k).start()

    slot = jax.lax.rem(b, 2)

    @pl.when(b + 1 < n)
    def _():
        for k in range(B):
            dma(jax.lax.rem(b + 1, 2), b + 1, k).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (NPIX, WR), 1).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (NPIX, WCB * BLK), 1).astype(
        jnp.float32)
    # segment matrix for the channel reduce: S[l, c] = (l // 256 == c)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (4 * WCB * BLK, 4), 0)
           // (WCB * BLK)
           == jax.lax.broadcasted_iota(jnp.int32, (4 * WCB * BLK, 4), 1)
           ).astype(jnp.bfloat16)
    for k in range(B):
        dma(slot, b, k).wait()
        # window -> [WR, 4*256] (c-major lane blocks)
        win = jnp.concatenate(
            [jnp.concatenate(
                [scr[slot, k, c, rb, cb] for cb in range(WCB)], axis=1)
             for c in range(4) for rb in range(WRB)],
            axis=0).reshape(4, WR, WCB * BLK)
        win = jnp.concatenate([win[c] for c in range(4)], axis=1)
        lyv = jnp.clip(ly[k, :], 0.0, WR - 1.0)
        lxv = jnp.clip(lx[k, :], 0.0, WCB * BLK - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(lyv[:, None] - rows)).astype(
            jnp.bfloat16)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(lxv[:, None] - cols)).astype(
            jnp.bfloat16)
        t = jnp.dot(wy, win, preferred_element_type=jnp.float32)
        wxe = jnp.concatenate([wx] * 4, axis=1)
        s = (t * wxe).astype(jnp.bfloat16)
        out[k, :, :] = jnp.dot(s, seg, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sample_impl(panels, byx, ly, lx, *, interpret: bool):
    G = byx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((B, NPIX), lambda g, byx: (g, 0)),
            pl.BlockSpec((B, NPIX), lambda g, byx: (g, 0)),
        ],
        out_specs=pl.BlockSpec((B, NPIX, 4), lambda g, byx: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, 4, WRB, WCB, 8, BLK), panels.dtype),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, NPIX, 4), jnp.float32),
        interpret=interpret,
    )(byx, panels, ly, lx)


def sample_atlas_coherent(scene, tex_id, uv, interpret: bool | None = None):
    """Bilinear atlas sample for a COHERENT [h, w] uv field (repeat
    addressing), matching ops/shading.sample_atlas within the window
    contract above (and bf16 window precision, ~2^-9 relative — below the
    u8 source quantization). tex_id [h, w] int32 (-1 = none -> 1.0),
    uv [h, w, 2]. Returns [h, w, 4] f32."""
    from hikari_tpu.utils.math import table_gather

    panels = scene["atlas_panels"]
    hb, wb = panels.shape[1], panels.shape[2]
    h, w = tex_id.shape
    if interpret is None:
        interpret = all(d.platform == "cpu" for d in jax.devices())

    rect = table_gather(scene["tex_rect"], jnp.maximum(tex_id, 0)).astype(
        jnp.float32)
    x0, y0 = rect[..., 0], rect[..., 1]
    tw = jnp.maximum(rect[..., 2], 1.0)
    th = jnp.maximum(rect[..., 3], 1.0)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = x0 + u * tw - 0.5
    fy = y0 + v * th - 0.5

    # ---- group geometry (pad to GROUP multiples; padded pixels clone the
    # edge so they never skew the group mean)
    hh = -(-h // GROUP) * GROUP
    ww = -(-w // GROUP) * GROUP
    valid = tex_id >= 0
    if (hh, ww) != (h, w):
        fy = jnp.pad(fy, ((0, hh - h), (0, ww - w)), mode="edge")
        fx = jnp.pad(fx, ((0, hh - h), (0, ww - w)), mode="edge")
        valid = jnp.pad(valid, ((0, hh - h), (0, ww - w)), mode="edge")
    gy, gx = hh // GROUP, ww // GROUP
    G0 = gy * gx

    fy_g = fy.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
    fx_g = fx.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
    v_g = valid.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
    nv = jnp.maximum(v_g.sum(axis=(2, 3)), 1)
    y_mean = (fy_g * v_g).sum(axis=(2, 3)) / nv
    x_mean = (fx_g * v_g).sum(axis=(2, 3)) / nv
    by = jnp.clip(jnp.round((y_mean - WR / 2) / 8).astype(jnp.int32),
                  0, hb - WRB)
    bx = jnp.clip(jnp.round((x_mean - WCB * BLK / 2) / BLK).astype(jnp.int32),
                  0, wb - WCB)
    ly = (fy_g - (by * 8)[:, :, None, None]).reshape(G0, NPIX)
    lx = (fx_g - (bx * BLK)[:, :, None, None]).reshape(G0, NPIX)
    byx = (by * 4096 + bx).reshape(G0)
    G = -(-G0 // B) * B
    if G != G0:
        pad = G - G0
        ly = jnp.concatenate([ly, jnp.zeros((pad, NPIX))], axis=0)
        lx = jnp.concatenate([lx, jnp.zeros((pad, NPIX))], axis=0)
        byx = jnp.concatenate([byx, jnp.zeros((pad,), jnp.int32)], axis=0)

    out = _sample_impl(panels, byx, ly, lx, interpret=interpret)
    full = (out[:G0].reshape(gy, gx, GROUP, GROUP, 4)
            .transpose(0, 2, 1, 3, 4).reshape(hh, ww, 4))[:h, :w]
    return jnp.where((tex_id >= 0)[..., None], full, 1.0)
