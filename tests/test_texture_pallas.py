"""Banded Pallas texture sampler vs the exact XLA gather sampler.

In-window coherent fields must match ops/shading.sample_atlas to bf16
window precision (the panel tiles are bf16; texture data is u8-sourced so
2^-9 relative sits below the source quantization). Out-of-window pixels
clamp — the probe tools/probe_texture_window.py quantifies that envelope
on the example scenes; these tests stay in-window by construction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hikari_tpu.models.material import Texture, pack_atlas
from hikari_tpu.ops.shading import sample_atlas
from hikari_tpu.ops.texture_pallas import atlas_to_panels, sample_atlas_coherent


def _scene(textures):
    atlas, rects = pack_atlas(textures)
    return {
        "atlas": jnp.asarray(atlas),
        "tex_rect": jnp.asarray(rects),
        "atlas_panels": jnp.asarray(np.asarray(atlas_to_panels(atlas))),
    }


def _textures(rng):
    t0 = Texture(rng.integers(0, 255, (48, 64, 4), dtype=np.uint8).astype(np.uint8))
    t1 = Texture(rng.integers(0, 255, (32, 32, 4), dtype=np.uint8))
    return [t0, t1]


def test_matches_gather_sampler_smooth_field():
    rng = np.random.default_rng(7)
    scene = _scene(_textures(rng))
    h, w = 48, 160
    ys = (np.arange(h) / h)[:, None] + np.zeros((1, w))
    xs = (np.arange(w) / w)[None, :] + np.zeros((h, 1))
    # smooth magnified field: footprint well inside one window
    uv = jnp.asarray(np.stack([0.3 + 0.25 * xs, 0.2 + 0.3 * ys], -1),
                     jnp.float32)
    tid = jnp.asarray((xs > 0.5).astype(np.int32))  # two textures, split
    ref = sample_atlas(scene, tid, uv)
    out = sample_atlas_coherent(scene, tid, uv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_repeat_addressing_across_seam():
    rng = np.random.default_rng(11)
    scene = _scene(_textures(rng))
    h, w = 32, 32
    xs = np.arange(w)[None, :] / w + np.zeros((h, 1))
    ys = np.arange(h)[:, None] / h + np.zeros((1, w))
    # u crosses 1.0 inside the field -> wrapped taps use the atlas border
    uv = jnp.asarray(np.stack([0.9 + 0.2 * xs, 0.95 + 0.1 * ys], -1),
                     jnp.float32)
    tid = jnp.ones((h, w), jnp.int32)  # 32x32 texture: whole rect < window
    ref = sample_atlas(scene, tid, uv)
    out = sample_atlas_coherent(scene, tid, uv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)


def test_no_texture_pixels_neutral():
    rng = np.random.default_rng(3)
    scene = _scene(_textures(rng))
    h, w = 16, 48
    uv = jnp.full((h, w, 2), 0.4, jnp.float32)
    tid = jnp.full((h, w), -1, jnp.int32)
    tid = tid.at[:, :16].set(0)
    out = np.asarray(sample_atlas_coherent(scene, tid, uv, interpret=True))
    assert np.all(out[:, 16:] == 1.0)
    ref = np.asarray(sample_atlas(scene, jnp.zeros((h, w), jnp.int32), uv))
    np.testing.assert_allclose(out[:, :16], ref[:, :16], rtol=0, atol=2e-2)


def test_wrapped_border_matches_mod():
    """pack_atlas's 1-texel border must equal the mod-addressed texels the
    gather sampler reads (the window sampler's seam-exactness relies on
    it)."""
    rng = np.random.default_rng(5)
    atlas, rects = pack_atlas(_textures(rng))
    for x0, y0, tw, th in rects:
        inner = atlas[y0:y0 + th, x0:x0 + tw]
        np.testing.assert_array_equal(atlas[y0 - 1, x0:x0 + tw], inner[-1])
        np.testing.assert_array_equal(atlas[y0 + th, x0:x0 + tw], inner[0])
        np.testing.assert_array_equal(atlas[y0:y0 + th, x0 - 1], inner[:, -1])
        np.testing.assert_array_equal(atlas[y0:y0 + th, x0 + tw], inner[:, 0])


def test_quad_atlas_matches_four_fetch():
    """The quad-atlas single-gather path (incoherent sites) must match the
    four-fetch mod-addressed path to bf16 storage precision, including
    wrapped footprints."""
    from hikari_tpu.models.scene import _atlas_quad_bf16

    rng = np.random.default_rng(13)
    atlas, rects = pack_atlas(_textures(rng))
    base = {"atlas": jnp.asarray(atlas), "tex_rect": jnp.asarray(rects)}
    quad = dict(base, atlas_quad=jnp.asarray(np.asarray(_atlas_quad_bf16(atlas))))
    n = 512
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (n, 2)), jnp.float32)
    tid = jnp.asarray(rng.integers(-1, 2, (n,)), jnp.int32)
    ref = sample_atlas(base, tid, uv)
    out = sample_atlas(quad, tid, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)
