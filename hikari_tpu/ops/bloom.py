"""Bloom: quadratic-threshold prefilter + dual-filter mip pyramid.

Replaces the Bevy BLOOM core node the reference chains after OVERLAY
(lib.rs:342-365; examples/simple.rs adds BloomSettings::default()).
Defaults mirror Bevy 0.9 BloomSettings: threshold 1.0, knee 0.1,
scale 1.0, intensity 0.04. Downsample = 13-tap, upsample = 9-tap tent,
all as dense stride-2 convolutions XLA maps well.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from hikari_tpu.ops.filters import bilinear_sample, resize_bilinear


@dataclasses.dataclass(frozen=True)
class BloomSettings:
    intensity: float = 0.04
    threshold: float = 1.0
    knee: float = 0.1
    scale: float = 1.0


def _quadratic_threshold(color, threshold, knee):
    br = jnp.max(color, axis=-1)
    rq = jnp.clip(br - threshold + knee, 0.0, 2.0 * knee)
    rq = (0.25 / jnp.maximum(knee, 1e-5)) * rq * rq
    gain = jnp.maximum(rq, br - threshold) / jnp.maximum(br, 1e-4)
    return color * gain[..., None]


def _downsample(img):
    """13-tap downsample (Jimenez) to half size."""
    h, w = img.shape[:2]
    oh, ow = max(1, h // 2), max(1, w // 2)
    x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
    y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
    u, v = jnp.meshgrid(x, y)
    uv = jnp.stack([u, v], -1)
    t = jnp.array([1.0 / w, 1.0 / h], jnp.float32)

    def s(dx, dy):
        return bilinear_sample(img, uv + jnp.array([dx, dy]) * t)

    a = s(-2, -2); b = s(0, -2); c = s(2, -2)
    d = s(-2, 0); e = s(0, 0); f = s(2, 0)
    g = s(-2, 2); hh = s(0, 2); i = s(2, 2)
    j = s(-1, -1); k = s(1, -1); l = s(-1, 1); m = s(1, 1)
    out = e * 0.125
    out += (a + c + g + i) * 0.03125
    out += (b + d + f + hh) * 0.0625
    out += (j + k + l + m) * 0.125
    return out


def _upsample_tent(img, out_size, scale=1.0):
    h, w = out_size
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u, v = jnp.meshgrid(x, y)
    uv = jnp.stack([u, v], -1)
    t = jnp.array([scale / img.shape[1], scale / img.shape[0]], jnp.float32)

    def s(dx, dy):
        return bilinear_sample(img, uv + jnp.array([dx, dy]) * t)

    out = s(0, 0) * 4.0
    out += (s(-1, 0) + s(1, 0) + s(0, -1) + s(0, 1)) * 2.0
    out += s(-1, -1) + s(1, -1) + s(-1, 1) + s(1, 1)
    return out / 16.0


def bloom(img, settings: BloomSettings = BloomSettings(), mips: int = 5):
    """img [H,W,C] HDR -> img + bloom."""
    h, w = img.shape[:2]
    mips = min(mips, max(1, min(h, w).bit_length() - 3))
    rgb = img[..., :3]
    pre = _quadratic_threshold(rgb, settings.threshold,
                               settings.knee * settings.threshold)
    chain = [pre]
    for _ in range(mips):
        chain.append(_downsample(chain[-1]))
    up = chain[-1]
    for level in range(mips - 1, -1, -1):
        up = _upsample_tent(up, chain[level].shape[:2],
                            settings.scale) + chain[level]
    out = rgb + up * settings.intensity
    if img.shape[-1] == 4:
        out = jnp.concatenate([out, img[..., 3:4]], -1)
    return out
