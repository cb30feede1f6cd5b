"""Warp sampler vs direct-gather oracles (smooth displacement fields)."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.ops.filters import bilinear_sample, catmull_rom5
from hikari_tpu.ops.warp import build_warp, warp_reduce, warp_sample


def smooth_field(rng, h, w, amp):
    """Smooth per-pixel displacement (like a velocity field). Gradients stay
    within the warp window's intra-group slack (the design contract; pixels
    beyond it clamp to the window edge and are rejected by callers'
    disocclusion tests)."""
    coarse = rng.uniform(-amp, amp, (h // 16 + 2, w // 16 + 2, 2))
    img = jnp.asarray(coarse, jnp.float32)
    from hikari_tpu.ops.filters import resize_bilinear

    return np.asarray(resize_bilinear(img, (h, w)))


def base_coords(h, w):
    y = np.arange(h, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    return y, x


def test_identity_nearest(rng):
    h, w = 32, 64
    src = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    y, x = base_coords(h, w)
    out = np.asarray(warp_sample(src, jnp.asarray(y), jnp.asarray(x), "nearest"))
    assert np.allclose(out, np.asarray(src), atol=1e-6)


def test_large_uniform_displacement(rng):
    """Displacement >> window size: absorbed by the window base index."""
    h, w = 32, 64
    src = jnp.asarray(rng.uniform(0, 1, (h, w, 2)), jnp.float32)
    y, x = base_coords(h, w)
    out = np.asarray(warp_sample(src, jnp.asarray(y - 13), jnp.asarray(x + 27),
                                 "nearest"))
    expect = np.asarray(src)[np.clip(y - 13, 0, h - 1).astype(int),
                             np.clip(x + 27, 0, w - 1).astype(int)]
    assert np.allclose(out, expect, atol=1e-6)


def test_bilinear_matches_filters(rng):
    h, w = 40, 56
    src = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    y, x = base_coords(h, w)
    d = smooth_field(rng, h, w, 1.5)
    sy = np.clip(y + d[..., 0], 1, h - 2)
    sx = np.clip(x + d[..., 1], 1, w - 2)
    out = np.asarray(warp_sample(src, jnp.asarray(sy), jnp.asarray(sx),
                                 "bilinear"))
    uv = jnp.asarray(np.stack([(sx + 0.5) / w, (sy + 0.5) / h], -1), jnp.float32)
    expect = np.asarray(bilinear_sample(src, uv))
    # smoothing kernels reduce in bf16 (f32 accumulate)
    assert np.abs(out - expect).max() < 2e-2


def test_catmull_matches_filters(rng):
    h, w = 40, 56
    src = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    y, x = base_coords(h, w)
    d = smooth_field(rng, h, w, 1.5)
    sy = np.clip(y + d[..., 0], 3, h - 4)
    sx = np.clip(x + d[..., 1], 3, w - 4)
    out = np.asarray(warp_sample(src, jnp.asarray(sy), jnp.asarray(sx),
                                 "catmull"))
    # oracle: full 4x4 Catmull-Rom
    def cr_w(t):
        a = np.abs(t)
        return np.where(a < 1, 1.5 * a**3 - 2.5 * a**2 + 1,
                        np.where(a < 2, -0.5 * a**3 + 2.5 * a**2 - 4 * a + 2, 0.0))
    s = np.asarray(src)
    expect = np.zeros_like(out)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    for dy in range(-1, 3):
        for dx in range(-1, 3):
            wgt = cr_w(sy - (y0 + dy)) * cr_w(sx - (x0 + dx))
            expect += s[np.clip(y0 + dy, 0, h - 1), np.clip(x0 + dx, 0, w - 1)] * wgt[..., None]
    assert np.abs(out - expect).max() < 2e-2  # bf16 reduce


def test_shared_window_multi_reduce(rng):
    h, w = 24, 32
    src = jnp.asarray(rng.uniform(0, 1, (h, w, 4)), jnp.float32)
    y, x = base_coords(h, w)
    ctx = build_warp(src, jnp.asarray(y), jnp.asarray(x))
    a = np.asarray(warp_reduce(ctx, "nearest", channels=(0, 2)))
    b = np.asarray(warp_reduce(ctx, "nearest", offset=(1.0, 0.0), channels=(2, 4)))
    assert np.allclose(a, np.asarray(src)[..., :2], atol=1e-6)
    sy1 = np.clip(y + 1, 0, h - 1).astype(int)
    assert np.allclose(b[:-2], np.asarray(src)[sy1, x.astype(int), 2:][:-2], atol=1e-6)
