"""Post-processing ops: denoiser, tonemap, TAA, SMAA, FSR, bloom, filters."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.ops import filters
from hikari_tpu.ops.bloom import BloomSettings, bloom
from hikari_tpu.ops.fsr import easu, rcas
from hikari_tpu.ops.fxaa import fxaa
from hikari_tpu.ops.tonemap import tone_mapping


def test_bilinear_matches_numpy(rng):
    img = jnp.asarray(rng.uniform(0, 1, (16, 24, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(0.1, 0.9, (8, 8, 2)), jnp.float32)
    out = np.asarray(filters.bilinear_sample(img, uv))
    # numpy oracle
    h, w = 16, 24
    u = np.asarray(uv)
    fx = u[..., 0] * w - 0.5
    fy = u[..., 1] * h - 0.5
    x0 = np.floor(fx).astype(int)
    y0 = np.floor(fy).astype(int)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    i = np.asarray(img)
    ref = (i[y0, x0] * (1 - ax) * (1 - ay) + i[y0, x0 + 1] * ax * (1 - ay)
           + i[y0 + 1, x0] * (1 - ax) * ay + i[y0 + 1, x0 + 1] * ax * ay)
    assert np.allclose(out, ref, atol=1e-5)


def test_catmull_rom_reconstructs_at_texel_centers(rng):
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)), jnp.float32)
    h, w = 16, 16
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u, v = jnp.meshgrid(x, y)
    uv = jnp.stack([u, v], -1)
    out = np.asarray(filters.catmull_rom5(img, uv, (h, w)))
    # at texel centers Catmull-Rom interpolates exactly (inner region)
    assert np.allclose(out[2:-2, 2:-2], np.asarray(img)[2:-2, 2:-2], atol=2e-2)


def test_tone_mapping_background_clear_color():
    z = jnp.zeros((4, 4, 4))
    clear = jnp.asarray([0.1, 0.2, 0.3, 1.0])
    out = np.asarray(tone_mapping(z, z, z, clear))
    assert np.allclose(out, np.broadcast_to([0.1, 0.2, 0.3, 1.0], (4, 4, 4)))


def test_tone_mapping_sums_channels():
    a = jnp.full((2, 2, 4), 0.2).at[..., 3].set(1.0)
    out = np.asarray(tone_mapping(a, a, a, jnp.zeros(4)))
    # rgb = reinhard(0.6) < 0.6
    assert (out[..., :3] < 0.6).all() and (out[..., :3] > 0.3).all()


def test_fsr_identity_scale(rng):
    img = jnp.asarray(rng.uniform(0.2, 0.8, (32, 32, 3)), jnp.float32)
    up = np.asarray(easu(img, (64, 64)))
    assert up.shape == (64, 64, 3)
    assert np.isfinite(up).all()
    # mean preserved approximately
    assert abs(up.mean() - np.asarray(img).mean()) < 0.02
    sharpened = np.asarray(rcas(jnp.asarray(up), 0.2))
    assert np.isfinite(sharpened).all()


def test_bloom_adds_energy_above_threshold():
    img = jnp.zeros((64, 64, 4)).at[32, 32, :3].set(20.0).at[..., 3].set(1.0)
    out = np.asarray(bloom(img, BloomSettings()))
    # energy spreads to neighbors
    assert out[30, 30, :3].sum() > 0.0
    assert np.isfinite(out).all()
    # dark image unchanged (below threshold)
    dark = jnp.full((64, 64, 4), 0.1)
    out2 = np.asarray(bloom(dark, BloomSettings()))
    assert np.allclose(out2[..., :3], 0.1, atol=1e-5)


def test_fxaa_preserves_flat_regions(rng):
    img = jnp.full((32, 32, 4), 0.5)
    out = np.asarray(fxaa(img))
    assert np.allclose(out, 0.5, atol=1e-5)


def test_resize_bilinear_shapes(rng):
    img = jnp.asarray(rng.uniform(0, 1, (30, 40, 4)), jnp.float32)
    out = filters.resize_bilinear(img, (60, 80))
    assert out.shape == (60, 80, 4)
