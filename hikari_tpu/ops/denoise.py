"""SVGF-style edge-aware a-trous denoiser (denoise.wgsl).

Per channel: demodulation (divide out albedo + 3x3 variance prefilter,
denoise.wgsl:135-166) then four a-trous iterations with step sizes 8/4/2/1
(denoise.wgsl:97-116) weighted by normal^16, depth-gradient, instance id and
luminance/variance (denoise.wgsl:43-66); optional firefly clamp; the last
level re-multiplies albedo.

All taps are STATIC shifts of the render-res-resampled G-buffer — pure
stencils XLA fuses, no gathers (the jittered deferred lookup is handled once
by restir.resample_deferred; the denoiser's 0.5-texel jitter resolves to the
same parity slice at the supported ratios).
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.config import ATROUS_KERNEL
from hikari_tpu.ops.restir import resample_deferred
from hikari_tpu.utils.math import F32_EPSILON, F32_MAX, luminance, normalize

_STEPS = (8, 4, 2, 1)


def _shift2d(img, dy, dx):
    """Static shift with validity mask for out-of-image taps."""
    h, w = img.shape[:2]
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    pad = ((pad_y), (pad_x)) + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad)
    out = p[pad_y[0] - dy : pad_y[0] - dy + h, pad_x[0] - dx : pad_x[0] - dx + w]
    valid = jnp.ones((h, w), bool)
    if dy > 0:
        valid = valid & (jnp.arange(h)[:, None] >= dy)
    elif dy < 0:
        valid = valid & (jnp.arange(h)[:, None] < h + dy)
    if dx > 0:
        valid = valid & (jnp.arange(w)[None, :] >= dx)
    elif dx < 0:
        valid = valid & (jnp.arange(w)[None, :] < w + dx)
    return out, valid


def normal_weight(n0, n1):
    d = jnp.maximum(0.0, jnp.sum(n0 * n1, -1))
    return d ** 16


def depth_weight(d0, d1, gradient, offset):
    eps = 0.01
    dg = jnp.abs(gradient[..., 0] * offset[0] + gradient[..., 1] * offset[1])
    return jnp.exp(-jnp.abs(d0 - d1) / (dg + eps))


def luminance_weight(l0, l1, variance):
    return jnp.exp(-jnp.abs(l0 - l1) / (4.0 * jnp.maximum(variance, 0.0) ** 0.25 + 1e-3))


def instance_weight(i0, i1):
    return jnp.maximum(0.0, 1.0 - jnp.abs(i0 - i1))


def demodulate(albedo_r, render, variance, render_size):
    """irradiance = render / albedo; variance 3x3 prefilter
    (denoise.wgsl:135-166)."""
    alb = albedo_r[..., :3]
    irr = jnp.where(alb < 0.01, 0.0, render[..., :3] / jnp.maximum(alb, 1e-6))

    var = jnp.zeros(render_size, jnp.float32)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            v, ok = _shift2d(variance, oy, ox)
            k = float(ATROUS_KERNEL[oy + 1, ox + 1])
            var = var + jnp.where(ok & (v <= F32_MAX), k * jnp.maximum(v, 0.0), 0.0)
    return irr, var


def denoise_channel(g, albedo, render, variance, frame, render_size,
                    ratio: float, firefly: bool):
    """Full demodulate + 4-level a-trous + remodulate for one channel.

    g: render-res resampled G-buffer; albedo: FULL-res albedo texture.
    """
    albedo_r = resample_deferred(albedo, render_size, frame["number"], ratio)
    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON
    normal = normalize(g["normal"])
    gradient = g["depth_gradient"]
    instance = g["instance_material"][..., 0]

    irr, var = demodulate(albedo_r, render, variance, render_size)

    center_k = float(ATROUS_KERNEL[1, 1])
    for step in _STEPS:
        bad_center = ~jnp.all(jnp.isfinite(irr), -1) | jnp.any(irr > F32_MAX, -1)
        c_irr = jnp.where(bad_center[..., None], 0.0, irr)
        sum_irr = c_irr * center_k
        sum_w = jnp.where(bad_center, 0.0, center_k)
        lum0 = jnp.where(bad_center, 0.0, luminance(c_irr))

        ff_m1 = jnp.zeros(render_size)
        ff_m2 = jnp.zeros(render_size)
        ff_cnt = jnp.zeros(render_size)

        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                if oy == 0 and ox == 0:
                    continue
                dy, dx = oy * step, ox * step
                s_irr, ok = _shift2d(irr, dy, dx)
                s_nrm, _ = _shift2d(normal, dy, dx)
                s_dep, _ = _shift2d(depth, dy, dx)
                s_ins, _ = _shift2d(instance, dy, dx)
                finite = jnp.all(jnp.isfinite(s_irr), -1) & ~jnp.any(
                    s_irr > F32_MAX, -1)
                ok = ok & finite
                s_lum = luminance(s_irr)
                w = (
                    normal_weight(normal, normalize(s_nrm))
                    * depth_weight(depth, s_dep, gradient, (ox, oy))
                    * instance_weight(instance, s_ins)
                    * luminance_weight(lum0, s_lum, var)
                )
                w = jnp.clip(w, 0.0, 1.0) * float(ATROUS_KERNEL[oy + 1, ox + 1])
                w = jnp.where(ok, w, 0.0)
                sum_irr = sum_irr + s_irr * w[..., None]
                sum_w = sum_w + w
                if firefly:
                    ff_m1 = ff_m1 + jnp.where(ok, s_lum, 0.0)
                    ff_m2 = ff_m2 + jnp.where(ok, s_lum * s_lum, 0.0)
                    ff_cnt = ff_cnt + ok.astype(jnp.float32)

        new_irr = jnp.where((sum_w < 1e-4)[..., None], 0.0,
                            sum_irr / jnp.maximum(sum_w, 1e-4)[..., None])
        if firefly:
            ff_mean = ff_m1 / jnp.maximum(ff_cnt, 1.0)
            ff_var = ff_m2 / jnp.maximum(ff_cnt, 1.0) - ff_mean * ff_mean
            is_firefly = lum0 > ff_mean + 3.0 * jnp.sqrt(jnp.maximum(ff_var, 0.0))
            new_irr = jnp.where(is_firefly[..., None],
                                (ff_mean / jnp.maximum(lum0, 1e-30))[..., None]
                                * new_irr, new_irr)
        irr = new_irr

    out = jnp.concatenate([irr, jnp.ones(render_size + (1,))], -1) * albedo_r
    return jnp.where(valid[..., None], out, 0.0)
