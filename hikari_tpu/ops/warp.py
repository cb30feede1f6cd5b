"""Warp sampling: screen-space resampling at per-pixel coordinates, TPU-way.

Every temporal pass (TAA history fetch, SMAA reprojection, reservoir
reprojection) needs `out[p] = src[p - velocity(p)]` — an arbitrary-index
gather, which on TPU costs ~24-40ns per gathered ROW (measured) and would
dominate the frame at full resolution. But the same measurements show wide
rows are nearly free (67GB/s at 9KB rows), and the warp field is smooth.

So: split the output into 8x8 pixel groups. Each group fetches ONE 24x24
source window (3x3 aligned 8px blocks, precomputed as one overlapping-block
tensor so the fetch is a single wide row-gather), then every pixel filters
from its window with separable kernel weights — two batched einsums that
map onto the MXU. The window absorbs arbitrarily large *uniform*
displacement (it rides the row index) plus the base-quantization residual
(+-4px), ~+-7px of intra-group source spread, and the filter support.
Pixels whose sources stray further (velocity discontinuities at object
silhouettes) clamp to the window edge — exactly the pixels every caller
already rejects via its disocclusion tests.

API:
    ctx = build_warp(src [H,W,F], sy [h,w], sx [h,w])
    out = warp_reduce(ctx, kernel="bilinear"|"nearest"|"catmull",
                      offset=(dy,dx), channels=(lo,hi))
Multiple warp_reduce calls share the one expensive window fetch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GROUP = 8
WINDOW = 24  # 3x3 aligned blocks: covers the +-4 base-quantization residual
             # plus ~+-7px of intra-group source spread and filter support


def _pad_to_blocks(src, extra_blocks=2):
    h, w = src.shape[:2]
    hp = -(-h // GROUP) * GROUP + GROUP * extra_blocks
    wp = -(-w // GROUP) * GROUP + GROUP * extra_blocks
    return jnp.pad(src, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")


def build_warp(src, sy, sx):
    """Prepare shared window state.

    src: [H,W,F] source; sy/sx: [h,w] float source pixel coords (may be out
    of range — clamped to edge). h,w must be multiples of 8.
    """
    hh0, ww0 = sy.shape
    hh = -(-hh0 // GROUP) * GROUP
    ww = -(-ww0 // GROUP) * GROUP
    if (hh, ww) != (hh0, ww0):
        sy = jnp.pad(sy, ((0, hh - hh0), (0, ww - ww0)), mode="edge")
        sx = jnp.pad(sx, ((0, hh - hh0), (0, ww - ww0)), mode="edge")
    H, W = src.shape[:2]
    f = src.shape[2]

    sy = jnp.clip(sy, 0.0, H - 1.0)
    sx = jnp.clip(sx, 0.0, W - 1.0)

    sp = _pad_to_blocks(src)
    hb = sp.shape[0] // GROUP
    wb = sp.shape[1] // GROUP
    blocks = sp.reshape(hb, GROUP, wb, GROUP, f).transpose(0, 2, 1, 3, 4)
    # overlapping 3x3-block windows: Q[by,bx] covers rows [8by, 8by+24)
    rows = []
    for dy in range(3):
        rows.append(jnp.concatenate(
            [blocks[dy:hb - 2 + dy, dx:wb - 2 + dx] for dx in range(3)],
            axis=3))
    q = jnp.concatenate(rows, axis=2)  # [hb-2, wb-2, 24, 24, F]
    qb_h, qb_w = q.shape[0], q.shape[1]
    q_flat = q.reshape(qb_h * qb_w, WINDOW * WINDOW * f)

    gy, gx = hh // GROUP, ww // GROUP
    sy_g = sy.reshape(gy, GROUP, gx, GROUP)
    sx_g = sx.reshape(gy, GROUP, gx, GROUP)
    y_mean = sy_g.mean(axis=(1, 3))
    x_mean = sx_g.mean(axis=(1, 3))
    # center the 24-window on the group's mean source position
    by = jnp.clip(jnp.round((y_mean - WINDOW / 2) / GROUP).astype(jnp.int32),
                  0, qb_h - 1)
    bx = jnp.clip(jnp.round((x_mean - WINDOW / 2) / GROUP).astype(jnp.int32),
                  0, qb_w - 1)

    idx = (by * qb_w + bx).reshape(-1)
    windows = jnp.take(q_flat, idx, axis=0).reshape(gy * gx, WINDOW, WINDOW, f)

    # local (window-relative) coords per pixel, grouped [G, 64]
    ly = (sy_g - (by * GROUP)[:, None, :, None]).transpose(0, 2, 1, 3).reshape(gy * gx, GROUP * GROUP)
    lx = (sx_g - (bx * GROUP)[:, None, :, None]).transpose(0, 2, 1, 3).reshape(gy * gx, GROUP * GROUP)

    return {"windows": windows, "ly": ly, "lx": lx, "f": f,
            "out_size": (hh, ww), "true_size": (hh0, ww0),
            "gy": gy, "gx": gx}


def _kernel_weights(t, kernel: str):
    """t: [...] fractional position; returns weights at the WINDOW integer
    window offsets [..., WINDOW]."""
    k = jnp.arange(WINDOW, dtype=jnp.float32)
    d = t[..., None] - k
    if kernel == "nearest":
        # one-hot at round(t)
        return (jnp.abs(d) <= 0.5).astype(jnp.float32) * (d > -0.5)
    if kernel == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    if kernel == "catmull":
        a = jnp.abs(d)
        w = jnp.where(
            a < 1.0, 1.5 * a**3 - 2.5 * a**2 + 1.0,
            jnp.where(a < 2.0, -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0, 0.0))
        return w
    raise ValueError(kernel)


def warp_reduce(ctx, kernel: str = "bilinear", offset=(0.0, 0.0),
                channels=None, precise: bool = None):
    """One filtered sample per output pixel from the shared windows.

    offset: (dy, dx) added to the source coords (for biased taps).
    channels: (lo, hi) slice of the packed source channels.
    The two contractions dominate the op's HBM traffic; smoothing kernels
    (bilinear/catmull — color filtering) run in bf16 with f32 accumulation.
    `nearest` stays exact f32 (it fetches raw data: depths, ids, positions).
    """
    win = ctx["windows"]
    if channels is not None:
        win = win[..., channels[0]:channels[1]]
    g, _, _, f = win.shape
    margin = 2.0 if kernel == "catmull" else 1.0
    ly = jnp.clip(ctx["ly"] + offset[0], margin - 1.0, WINDOW - margin)
    lx = jnp.clip(ctx["lx"] + offset[1], margin - 1.0, WINDOW - margin)
    wy = _kernel_weights(ly, kernel)  # [G, 64, WINDOW]
    wx = _kernel_weights(lx, kernel)

    if precise is None:
        precise = kernel == "nearest"
    dt = jnp.float32 if precise else jnp.bfloat16
    t = jnp.einsum("gpx,gyxf->gpyf", wx.astype(dt), win.astype(dt),
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("gpy,gpyf->gpf", wy.astype(dt), t.astype(dt),
                     preferred_element_type=jnp.float32)

    hh, ww = ctx["out_size"]
    gy, gx = ctx["gy"], ctx["gx"]
    full = out.reshape(gy, gx, GROUP, GROUP, f).transpose(0, 2, 1, 3, 4).reshape(hh, ww, f)
    th, tw = ctx["true_size"]
    return full[:th, :tw]


def warp_sample(src, sy, sx, kernel: str = "bilinear"):
    """Convenience: one-shot warp (build + single reduce)."""
    ctx = build_warp(src, sy, sx)
    return warp_reduce(ctx, kernel=kernel)
