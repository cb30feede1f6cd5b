"""FXAA 3.11 (console quality): the Bevy FXAA core node slot in the
reference graph (lib.rs:342-365). Off by default, like Bevy cameras without
the Fxaa component."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.ops.filters import bilinear_sample
from hikari_tpu.ops.restir import pixel_uv
from hikari_tpu.utils.math import luminance

EDGE_THRESHOLD_MIN = 0.0312
EDGE_THRESHOLD_MAX = 0.125
SUBPIXEL_QUALITY = 0.75
ITERATIONS = 8


def fxaa(img):
    """Edge-antialias an LDR [H,W,C] image (simplified FXAA 3.11 quality)."""
    h, w = img.shape[:2]
    size = (h, w)
    uv = pixel_uv(size)
    texel = jnp.array([1.0 / w, 1.0 / h], jnp.float32)

    def lum_at(du, dv):
        return luminance(bilinear_sample(img, uv + jnp.array([du, dv]) * texel)[..., :3])

    l_c = luminance(img[..., :3])
    l_d = lum_at(0, 1)
    l_u = lum_at(0, -1)
    l_l = lum_at(-1, 0)
    l_r = lum_at(1, 0)
    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_d, l_u),
                                         jnp.minimum(l_l, l_r)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_d, l_u),
                                         jnp.maximum(l_l, l_r)))
    rng = l_max - l_min
    active = rng >= jnp.maximum(EDGE_THRESHOLD_MIN, l_max * EDGE_THRESHOLD_MAX)

    l_dl = lum_at(-1, 1)
    l_dr = lum_at(1, 1)
    l_ul = lum_at(-1, -1)
    l_ur = lum_at(1, -1)

    edge_h = (jnp.abs(-2 * l_l + l_ul + l_dl) + 2 * jnp.abs(-2 * l_c + l_u + l_d)
              + jnp.abs(-2 * l_r + l_ur + l_dr))
    edge_v = (jnp.abs(-2 * l_u + l_ul + l_ur) + 2 * jnp.abs(-2 * l_c + l_l + l_r)
              + jnp.abs(-2 * l_d + l_dl + l_dr))
    horizontal = edge_h >= edge_v

    l1 = jnp.where(horizontal, l_u, l_l)
    l2 = jnp.where(horizontal, l_d, l_r)
    grad1 = l1 - l_c
    grad2 = l2 - l_c
    steepest1 = jnp.abs(grad1) >= jnp.abs(grad2)
    grad_scaled = 0.25 * jnp.maximum(jnp.abs(grad1), jnp.abs(grad2))
    step_len = jnp.where(horizontal, texel[1], texel[0])
    step_len = jnp.where(steepest1, -step_len, step_len)
    l_local = jnp.where(steepest1, 0.5 * (l1 + l_c), 0.5 * (l2 + l_c))

    # subpixel blend
    l_avg = (2.0 * (l_d + l_u + l_l + l_r) + l_dl + l_dr + l_ul + l_ur) / 12.0
    sub = jnp.clip(jnp.abs(l_avg - l_c) / jnp.maximum(rng, 1e-5), 0.0, 1.0)
    sub = (-2.0 * sub + 3.0) * sub * sub
    blend = sub * sub * SUBPIXEL_QUALITY

    off = jnp.where(horizontal[..., None],
                    jnp.stack([jnp.zeros_like(step_len), step_len * 0.5], -1),
                    jnp.stack([step_len * 0.5, jnp.zeros_like(step_len)], -1))
    final_uv = uv + off * blend[..., None]
    out = bilinear_sample(img, final_uv)
    return jnp.where(active[..., None], out, img)
