"""Texture-sampling helpers on dense [H,W,C] tensors: nearest / bilinear /
gather4 (WGSL textureGather) / 5-tap Catmull-Rom, clamp-to-edge addressing
(the post-process samplers' address mode)."""

from __future__ import annotations

import jax.numpy as jnp


def _clampi(v, n):
    return jnp.clip(v, 0, n - 1)


def nearest_sample(img, uv):
    """uv [...,2] in [0,1]; img [H,W,C] -> [...,C]."""
    h, w = img.shape[:2]
    x = _clampi(jnp.floor(uv[..., 0] * w).astype(jnp.int32), w)
    y = _clampi(jnp.floor(uv[..., 1] * h).astype(jnp.int32), h)
    return img[y, x]


def bilinear_sample(img, uv):
    h, w = img.shape[:2]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    x0i = _clampi(x0.astype(jnp.int32), w)
    y0i = _clampi(y0.astype(jnp.int32), h)
    x1i = _clampi(x0i + 1, w)
    y1i = _clampi(y0i + 1, h)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    return (c00 * (1 - ax) * (1 - ay) + c10 * ax * (1 - ay)
            + c01 * (1 - ax) * ay + c11 * ax * ay)


def gather4(img_channel, uv):
    """WGSL textureGather: the 2x2 texel quad a linear sample at uv would
    read, order (-+, ++, +-, --) -- we return [..., 4] as (x0y1, x1y1, x1y0,
    x0y0) matching WGSL's (w,z,y,x)... order only matters for any/all tests
    here, which are order-invariant."""
    h, w = img_channel.shape[:2]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = _clampi(jnp.floor(fx).astype(jnp.int32), w)
    y0 = _clampi(jnp.floor(fy).astype(jnp.int32), h)
    x1 = _clampi(x0 + 1, w)
    y1 = _clampi(y0 + 1, h)
    return jnp.stack(
        [img_channel[y1, x0], img_channel[y1, x1],
         img_channel[y0, x1], img_channel[y0, x0]], axis=-1)


def catmull_rom5(img, uv, size):
    """5-tap Catmull-Rom history resample (TheRealMJP; taa.wgsl:118-140)."""
    h, w = size
    fsize = jnp.array([w, h], jnp.float32)
    texel = 1.0 / fsize
    sample_pos = uv * fsize
    tp1 = jnp.floor(sample_pos - 0.5) + 0.5
    f = sample_pos - tp1
    w0 = f * (-0.5 + f * (1.0 - 0.5 * f))
    w1 = 1.0 + f * f * (-2.5 + 1.5 * f)
    w2 = f * (0.5 + f * (2.0 - 1.5 * f))
    w3 = f * f * (-0.5 + 0.5 * f)
    w12 = w1 + w2
    offset12 = w2 / jnp.maximum(w1 + w2, 1e-20)
    tp0 = (tp1 - 1.0) * texel
    tp3 = (tp1 + 2.0) * texel
    tp12 = (tp1 + offset12) * texel

    def s(ux, uy):
        return jnp.clip(bilinear_sample(img, jnp.stack([ux, uy], -1)), 0.0, 1.0)

    out = jnp.zeros(uv.shape[:-1] + (img.shape[-1],))
    out += s(tp12[..., 0], tp0[..., 1]) * (w12[..., 0] * w0[..., 1])[..., None]
    out += s(tp0[..., 0], tp12[..., 1]) * (w0[..., 0] * w12[..., 1])[..., None]
    out += s(tp12[..., 0], tp12[..., 1]) * (w12[..., 0] * w12[..., 1])[..., None]
    out += s(tp3[..., 0], tp12[..., 1]) * (w3[..., 0] * w12[..., 1])[..., None]
    out += s(tp12[..., 0], tp3[..., 1]) * (w12[..., 0] * w3[..., 1])[..., None]
    return out


def resize_bilinear(img, out_size):
    """Full-screen-quad style resample (what the overlay draw does when the
    post-chain output size differs from the target)."""
    h, w = out_size
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u, v = jnp.meshgrid(x, y)
    return bilinear_sample(img, jnp.stack([u, v], -1))
