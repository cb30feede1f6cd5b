"""TAA "Jasmine" (taa.wgsl:75-170): velocity dilation via 4-neighbor max
depth, Catmull-Rom history resample, disocclusion tests (boundary /
depth-ratio / position-distance / velocity-distance) gating a 3x3 YCoCg
variance clip, then blend mix(prev, curr, 0.1 / upscale_ratio).

TPU formulation: every *current-frame* tap is at a static offset -> static
shifts; every *history* tap is at uv - velocity -> ONE shared banded
channel-plane warp (ops.warp_band) serving the Catmull-Rom color fetch and
the 5-bias depth-quad / position / velocity disocclusion probes. (The
reference's 5-tap Catmull-Rom approximation becomes the exact 4x4 kernel
here — same filter, full footprint.) The banded warp needs no HWC->lane
pack: sources are channel-plane stacks built by one cheap moveaxis, and
the disocclusion tests consume its [h, F, w] outputs as 2-D plane slices
(measured 6.7 ms vs 26.6 ms for the packed v2 warp at 1080p x 10ch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.ops.warp_band import warp_band
from hikari_tpu.utils.math import (
    clip_towards_aabb_center,
    rgb_to_ycocg,
    ycocg_to_rgb,
)

_BIAS = 1.5


def _shift(img, dy, dx):
    """Static shift with clamp-to-edge via pad + static slice (int-array
    indexing lowers to slow XLA column gathers)."""
    h, w = img.shape[:2]
    p = jnp.pad(img, ((abs(dy), abs(dy)), (abs(dx), abs(dx)))
                + ((0, 0),) * (img.ndim - 2), mode="edge")
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(p, abs(dy) + dy, abs(dy) + dy + h, axis=0),
        abs(dx) + dx, abs(dx) + dx + w, axis=1)


def _resample_to(img, size):
    if img.shape[:2] == size:
        return img
    from hikari_tpu.ops.filters import resize_bilinear

    return resize_bilinear(img, size)


def nearest_velocity(gbuf_pos, gbuf_vel, size):
    """Velocity dilation (taa.wgsl:56-73): take velocity from the
    closest-depth pixel among the 4 diagonal neighbors (static shifts)."""
    depth = gbuf_pos[..., 3]
    d_pp = _shift(depth, 1, 1)
    d_np = _shift(depth, 1, -1)
    d_pn = _shift(depth, -1, 1)
    d_nn = _shift(depth, -1, -1)
    depths = jnp.stack([d_pp, d_np, d_pn, d_nn], -1)
    max_depth = jnp.max(depths, -1)
    is_max = depths == max_depth[..., None]
    # offsets in pixels (x right, y down)
    ox = jnp.sum(is_max * jnp.array([1.0, -1.0, 1.0, -1.0]), -1)
    oy = jnp.sum(is_max * jnp.array([1.0, 1.0, -1.0, -1.0]), -1)
    dilate = depth < max_depth
    # velocity at the offset pixel: offsets are +-1 -> 9 static candidates;
    # select via the (oy, ox) pair
    vel = gbuf_vel[..., :2]
    out = vel
    for sy in (-1, 1):
        for sx_ in (-1, 1):
            cand = _shift(vel, sy, sx_)
            take = dilate & (oy == sy) & (ox == sx_)
            out = jnp.where(take[..., None], cand, out)
    return out


def taa_jasmine(gbuf, prev_gbuf, prev_taa, current, frame, clear_color, size):
    """current: this frame's input at `size`; prev_taa: last frame's output.
    gbuf/prev_gbuf are FULL-res; `size` is the working (post-SMAA) size."""
    h, w = size
    texel = jnp.array([1.0 / w, 1.0 / h], jnp.float32)

    # resample G-buffer planes to the working size (uv-identity maps)
    pos = _resample_to(gbuf["position"], size)
    vel_tex = _resample_to(gbuf["velocity_uv"], size)
    prev_pos = _resample_to(prev_gbuf["position"], size)
    prev_vel = _resample_to(prev_gbuf["velocity_uv"], size)

    current_color = current[..., :3]
    alpha = current[..., 3:4]

    velocity = nearest_velocity(pos, vel_tex, size)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None].repeat(w, 1)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :].repeat(h, 0)
    sy = ys - velocity[..., 1] * h - 0.5
    sx = xs - velocity[..., 0] * w - 0.5
    previous_uv_y = (ys / h) - velocity[..., 1]
    previous_uv_x = (xs / w) - velocity[..., 0]
    boundary_miss = ((previous_uv_x < 0.0) | (previous_uv_x > 1.0)
                     | (previous_uv_y < 0.0) | (previous_uv_y > 1.0))

    cur_depth = pos[..., 3]
    has_content = cur_depth > 0.0
    depth_miss = cur_depth == 0.0
    position_miss = cur_depth == 0.0

    # The reference probes the previous depth quad at 5 +-1.5-texel biases
    # (taa.wgsl:109-124) — an ANY-over-footprint test. ANY(ratio < 0.95)
    # over a footprint equals testing against the footprint MAX of previous
    # depth, so max-pool previous depth over the (+-1.5 +-0.5) footprint
    # with static shifts BEFORE warping, then take ONE warped sample
    # (collapses ~26 warp reductions to 2).
    pdepth = prev_pos[..., 3]
    # separable max-pool (square footprint): 2r passes instead of (2r+1)^2-1
    pooled_y = pdepth
    for dy in (-2, -1, 1, 2):
        pooled_y = jnp.maximum(pooled_y, _shift(pdepth, dy, 0))
    pooled = pooled_y
    for dx in (-2, -1, 1, 2):
        pooled = jnp.maximum(pooled, _shift(pooled_y, 0, dx))

    # ONE banded warp over all history buffers (shared band coords, one
    # window DMA per source per group): catmull rgb from prev_taa, nearest
    # aux = prev pos xyz (0:3), pooled max depth (3), prev velocity (4:6).
    src_rgb = jnp.moveaxis(prev_taa[..., :3], -1, 1)
    src_aux = jnp.moveaxis(
        jnp.concatenate([prev_pos[..., :3], pooled[..., None],
                         prev_vel[..., :2]], -1), -1, 1)
    from hikari_tpu.parallel import shard as _sh

    pc_p, aux_p = warp_band([src_rgb, src_aux], ("catmull", "nearest"),
                            sy, sx, mesh=_sh.active_mesh())
    pmax = aux_p[:, 3, :]

    has_content |= pmax > 0.0
    depth_miss |= (pmax > 0.0) & (cur_depth / jnp.maximum(pmax, 1e-30) < 0.95)
    # position test at the center tap (the footprint OR is covered by the
    # pooled depth test); plane-sliced from the warped aux
    dist = jnp.sqrt(sum((pos[..., k] - aux_p[:, k, :]) ** 2
                        for k in range(3)))
    position_miss |= dist > 0.5

    vdist = jnp.sqrt((velocity[..., 0] - aux_p[:, 4, :]) ** 2
                     + (velocity[..., 1] - aux_p[:, 5, :]) ** 2)
    velocity_miss = vdist > 0.00005

    prev_color = jnp.clip(jnp.moveaxis(pc_p, 1, -1), 0.0, 1.0)

    need_clip = boundary_miss | (position_miss & velocity_miss & depth_miss)

    # separable 3x3 moment sums: convert to YCoCg ONCE, then 2+2 shift-adds
    # per moment instead of 9 shifted conversions (taps are an unweighted
    # box, so row-sum-then-column-sum is exact)
    s_mm = rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0))
    s_sq = s_mm * s_mm

    def box3(x):
        r = x + _shift(x, 0, -1) + _shift(x, 0, 1)
        return r + _shift(r, -1, 0) + _shift(r, 1, 0)

    m1 = box3(s_mm)
    m2 = box3(s_sq)
    mean = m1 / 9.0
    var = jnp.sqrt(jnp.maximum(m2 / 9.0 - mean * mean, 0.0))
    clipped = ycocg_to_rgb(clip_towards_aabb_center(
        rgb_to_ycocg(prev_color), s_mm, mean - var, mean + var))
    prev_color = jnp.where(need_clip[..., None], clipped, prev_color)

    out = prev_color + (current_color - prev_color) * (0.1 / frame["upscale_ratio"])
    out = jnp.concatenate([out, alpha], -1)
    return jnp.where(has_content[..., None], out,
                     jnp.broadcast_to(clear_color, out.shape))
