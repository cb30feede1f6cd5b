"""TAA "Jasmine" (taa.wgsl:75-170): velocity dilation via 4-neighbor max
depth, 5-tap Catmull-Rom history resample, disocclusion tests (boundary /
depth-ratio / position-distance / velocity-distance) gating a 3x3 YCoCg
variance clip, then blend mix(prev, curr, 0.1 / upscale_ratio)."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.ops.filters import (
    bilinear_sample,
    catmull_rom5,
    gather4,
    nearest_sample,
)
from hikari_tpu.ops.restir import pixel_uv
from hikari_tpu.utils.math import (
    clip_towards_aabb_center,
    rgb_to_ycocg,
    ycocg_to_rgb,
)


def nearest_velocity(gbuf, uv, texel):
    """Velocity dilation (taa.wgsl:56-73): take velocity from the
    closest-depth pixel of the 4 diagonal neighbors."""
    pos = gbuf["position"]
    d_pp = nearest_sample(pos, uv + jnp.array([texel[0], texel[1]]))[..., 3]
    d_np = nearest_sample(pos, uv + jnp.array([-texel[0], texel[1]]))[..., 3]
    d_pn = nearest_sample(pos, uv + jnp.array([texel[0], -texel[1]]))[..., 3]
    d_nn = nearest_sample(pos, uv + jnp.array([-texel[0], -texel[1]]))[..., 3]
    depths = jnp.stack([d_pp, d_np, d_pn, d_nn], -1)
    max_depth = jnp.max(depths, -1)
    d0 = nearest_sample(pos, uv)[..., 3]
    is_max = depths == max_depth[..., None]
    fx = jnp.sum(is_max * jnp.array([1.0, -1.0, 1.0, -1.0]), -1) * texel[0]
    fy = jnp.sum(is_max * jnp.array([1.0, 1.0, -1.0, -1.0]), -1) * texel[1]
    offset = jnp.where((d0 < max_depth)[..., None], jnp.stack([fx, fy], -1), 0.0)
    return nearest_sample(gbuf["velocity_uv"], uv + offset)[..., :2]


_BIAS_SCALE = 1.5


def taa_jasmine(gbuf, prev_gbuf, prev_taa, current, frame, clear_color, size):
    """current: this frame's input at `size`; prev_taa: last frame's output."""
    h, w = size
    texel = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    uv = pixel_uv(size)

    original = bilinear_sample(current, uv)  # same-size: == nearest
    current_color = original[..., :3]

    velocity = nearest_velocity(gbuf, uv, texel)
    previous_uv = uv - velocity
    boundary_miss = jnp.any(jnp.abs(previous_uv - 0.5) > 0.5, -1)

    cur_pd = nearest_sample(gbuf["position"], uv)
    cur_depth = cur_pd[..., 3]
    has_content = cur_depth > 0.0
    depth_miss = cur_depth == 0.0
    position_miss = cur_depth == 0.0

    biases = [(0.0, 0.0), (_BIAS_SCALE, _BIAS_SCALE), (-_BIAS_SCALE, _BIAS_SCALE),
              (_BIAS_SCALE, -_BIAS_SCALE), (-_BIAS_SCALE, -_BIAS_SCALE)]
    for bx, by in biases:
        buv = previous_uv + jnp.array([bx, by]) * texel
        pdepths = gather4(prev_gbuf["position"][..., 3], buv)
        ratio = jnp.where(pdepths == 0.0, 1.0,
                          cur_depth[..., None] / jnp.where(pdepths == 0.0, 1.0, pdepths))
        has_content |= jnp.any(pdepths > 0.0, -1)
        depth_miss |= jnp.any(ratio < 0.95, -1)
        ppos = nearest_sample(prev_gbuf["position"], buv)[..., :3]
        dist = jnp.sqrt(jnp.sum((cur_pd[..., :3] - ppos) ** 2, -1))
        position_miss |= dist > 0.5

    prev_velocity = nearest_sample(prev_gbuf["velocity_uv"], previous_uv)[..., :2]
    vdist = jnp.sqrt(jnp.sum((velocity - prev_velocity) ** 2, -1))
    velocity_miss = vdist > 0.00005

    prev_color = catmull_rom5(prev_taa[..., :3], previous_uv, size)

    # variance clip on disocclusion
    need_clip = boundary_miss | (position_miss & velocity_miss & depth_miss)

    def samp(du, dv):
        c = nearest_sample(current, uv + jnp.array([du, dv]) * texel)[..., :3]
        return rgb_to_ycocg(jnp.clip(c, 0.0, 1.0))

    s_mm = rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0))
    taps = [samp(-1, 1), samp(0, 1), samp(1, 1), samp(-1, 0), s_mm,
            samp(1, 0), samp(-1, -1), samp(0, -1), samp(1, -1)]
    m1 = sum(taps)
    m2 = sum(t * t for t in taps)
    mean = m1 / 9.0
    var = jnp.sqrt(jnp.maximum(m2 / 9.0 - mean * mean, 0.0))
    clipped = ycocg_to_rgb(clip_towards_aabb_center(
        rgb_to_ycocg(prev_color), s_mm, mean - var, mean + var))
    prev_color = jnp.where(need_clip[..., None], clipped, prev_color)

    out = prev_color + (current_color - prev_color) * (0.1 / frame["upscale_ratio"])
    out = jnp.concatenate([out, original[..., 3:4]], -1)
    return jnp.where(has_content[..., None], out,
                     jnp.broadcast_to(clear_color, out.shape))
