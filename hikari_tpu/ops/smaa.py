"""Filmic SMAA TU4X checkerboard temporal upscaler (smaa.wgsl:81-271).

Renders at half size with alternating diagonal jitter; each frame fills 2 of
the 4 pixels of every output quad (current sample + reprojected history with
clip rejection), and `extrapolate` fills the other diagonal by differential
blending of N/E/S/W luminance gradients.

Dense formulation: instead of per-thread scattered writes to 2 output pixels
(smaa.wgsl:224-228 — SURVEY.md §7 hard part 3), we compute the four quad
planes P00/P11 (pass 1) and P01/P10 (pass 2) as [rh,rw] tensors and
interleave them into the [2rh,2rw] output — scatter-free.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.ops.filters import bilinear_sample, gather4, nearest_sample
from hikari_tpu.ops.restir import pixel_uv
from hikari_tpu.ops.taa import nearest_velocity
from hikari_tpu.utils.math import (
    TAU,
    clip_towards_aabb_center,
    luminance,
    rgb_to_ycocg,
    ycocg_to_rgb,
)

_BIAS = 2.5


def _quad_uv(size_out, parity):
    """uv of output pixels 2c + parity for each input pixel c."""
    oh, ow = size_out
    rh, rw = oh // 2, ow // 2
    x = (2.0 * jnp.arange(rw, dtype=jnp.float32) + parity + 0.5) / ow
    y = (2.0 * jnp.arange(rh, dtype=jnp.float32) + parity + 0.5) / oh
    u, v = jnp.meshgrid(x, y)
    return jnp.stack([u, v], -1)


def smaa_tu4x(gbuf, prev_gbuf, prev_tone, tone, frame, render_size):
    """Pass 1 + 2; returns [2rh, 2rw, 4]."""
    rh, rw = render_size
    out_size = (2 * rh, 2 * rw)
    texel = jnp.array([1.0 / out_size[1], 1.0 / out_size[0]], jnp.float32)
    uv = pixel_uv(render_size)

    cur_j = jnp.where((frame["number"] & 1) == 0, 0.0, 1.0)
    prev_j = 1.0 - cur_j

    current_color = nearest_sample(tone, uv)[..., :3]

    cur_uv = _quad_uv(out_size, cur_j)
    prev_uv_out = _quad_uv(out_size, prev_j)

    velocity = nearest_velocity(gbuf, prev_uv_out,
                                jnp.array([1.0 / gbuf["position"].shape[1],
                                           1.0 / gbuf["position"].shape[0]]))
    prev_reproj = prev_uv_out - velocity
    prev_color = nearest_sample(prev_tone, prev_reproj)[..., :3]

    boundary_miss = jnp.any(jnp.abs(prev_reproj - 0.5) > 0.5, -1)
    cur_instance = nearest_sample(gbuf["instance_material"], prev_uv_out)[..., 0]
    cur_depth = nearest_sample(gbuf["position"], prev_uv_out)[..., 3]
    depth_miss = cur_depth == 0.0
    instance_miss = jnp.zeros_like(depth_miss)

    biases = [(0.0, 0.0), (_BIAS, _BIAS), (-_BIAS, _BIAS),
              (_BIAS, -_BIAS), (-_BIAS, -_BIAS)]
    for bx, by in biases:
        buv = prev_reproj + jnp.array([bx, by]) * texel
        pdep = gather4(prev_gbuf["position"][..., 3], buv)
        ratio = jnp.where(pdep == 0.0, 1.0,
                          cur_depth[..., None] / jnp.where(pdep == 0.0, 1.0, pdep))
        miss_i = jnp.any(ratio < 0.95, -1)
        depth_miss |= miss_i
        pinst = nearest_sample(prev_gbuf["instance_material"], buv)[..., 0]
        instance_miss |= miss_i & (jnp.abs(pinst - cur_instance) > 1.0)

    prev_velocity = nearest_sample(prev_gbuf["velocity_uv"], prev_reproj)[..., :2]
    velocity_miss = jnp.sqrt(jnp.sum((velocity - prev_velocity) ** 2, -1)) > 1e-4
    need_clip = boundary_miss | ((depth_miss | instance_miss) & velocity_miss)

    # pick the bias minimizing current-depth distance, 2x2 variance clip
    min_ds = jnp.full(render_size, 10.0)
    uv_bias = jnp.zeros(render_size + (2,))
    for bx, by in biases:
        b = jnp.array([bx, by]) * texel
        ds = gather4(gbuf["position"][..., 3], prev_uv_out + b)
        dds = jnp.sqrt(jnp.sum((cur_depth[..., None] - ds) ** 2, -1))
        take = dds < min_ds
        uv_bias = jnp.where(take[..., None], b, uv_bias)
        min_ds = jnp.minimum(min_ds, dds)

    guv = prev_uv_out + uv_bias
    cr = gather4(tone[..., 0], guv)
    cg = gather4(tone[..., 1], guv)
    cb = gather4(tone[..., 2], guv)
    taps = [rgb_to_ycocg(jnp.stack([cr[..., i], cg[..., i], cb[..., i]], -1))
            for i in range(4)]
    s_mm = rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0))
    m1 = sum(taps)
    m2 = sum(t * t for t in taps)
    mean = m1 / 4.0
    var = jnp.sqrt(jnp.maximum(m2 / 4.0 - mean * mean, 0.0))
    clipped = ycocg_to_rgb(clip_towards_aabb_center(
        rgb_to_ycocg(prev_color), s_mm, mean - var, mean + var))
    prev_color = jnp.where(need_clip[..., None], clipped, prev_color)

    # sub-pixel velocity differential remix (smaa.wgsl:218-227)
    subpix = jnp.mod(velocity / (2.0 * texel), 1.0)
    blend = jnp.clip(-jnp.cos(jnp.maximum(subpix[..., 0], subpix[..., 1]) * TAU),
                     0.0, 1.0)
    remix = bilinear_sample(tone, prev_uv_out)[..., :3]
    prev_color = prev_color + (remix - prev_color) * blend[..., None]

    one = jnp.ones(render_size + (1,))
    cur4 = jnp.concatenate([current_color, one], -1)
    prev4 = jnp.concatenate([prev_color, one], -1)

    even_frame = (frame["number"] & 1) == 0
    p00 = jnp.where(even_frame, cur4, prev4)
    p11 = jnp.where(even_frame, prev4, cur4)

    # ---- extrapolate pass (smaa.wgsl:239-271)
    def shift(img, dy, dx):
        return jnp.roll(img, (-dy, -dx), axis=(0, 1))

    t_c = p00
    b_c = p11
    n_c = shift(p11, -1, 0)   # out[2c + (1,-1)] = P11 of quad row-1
    e_c = shift(p00, 0, 1)    # out[2c + (2, 0)] = P00 of quad col+1
    s_c = shift(p00, 1, 0)    # out[2c + (0, 2)] = P00 of quad row+1
    w_c = shift(p11, 0, -1)   # out[2c + (-1,1)] = P11 of quad col-1

    dh = jnp.stack([luminance(jnp.abs(w_c[..., :3] - b_c[..., :3])),
                    luminance(jnp.abs(t_c[..., :3] - e_c[..., :3]))], -1)
    dv = jnp.stack([luminance(jnp.abs(t_c[..., :3] - s_c[..., :3])),
                    luminance(jnp.abs(n_c[..., :3] - b_c[..., :3]))], -1)
    factor_x = jnp.maximum(dv[..., 0], 1e-3) * jnp.maximum(dv[..., 1], 1e-3)
    factor_y = jnp.maximum(dh[..., 0], 1e-3) * jnp.maximum(dh[..., 1], 1e-3)
    factor_z = 1.0 / (factor_x + factor_y)

    def diff_blend(t, b, l, r):
        color = (l + r) * factor_x[..., None] + (t + b) * factor_y[..., None]
        return 0.5 * factor_z[..., None] * color

    x_color = diff_blend(t_c, s_c, w_c, b_c)  # at 2c + (0,1)
    y_color = diff_blend(n_c, b_c, t_c, e_c)  # at 2c + (1,0)

    # interleave quads: [rh, rw, 2, 2, 4] -> [2rh, 2rw, 4]
    quad = jnp.stack(
        [jnp.stack([p00, y_color], axis=2),      # row 0: (x even, x odd)
         jnp.stack([x_color, p11], axis=2)], axis=2)  # row 1
    out = quad.transpose(0, 2, 1, 3, 4).reshape(2 * rh, 2 * rw, 4)
    return out
