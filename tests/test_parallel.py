"""Multi-chip sharding: the full frame step partitioned over an 8-device
CPU mesh (SURVEY.md §2.4 — the pixel-grid workgroup analog)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu import Camera, HikariSettings, Taa, Upscale
from hikari_tpu.config import make_frame_uniform
from hikari_tpu.frame import build_render_frame, init_carry, scaled_size
from hikari_tpu.ops.noise import noise_constant
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.parallel.mesh import make_mesh, pixel_sharding, shard_frame


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_frame_matches_single_device():
    from examples.minimal import build_scene

    settings = dataclasses.replace(HikariSettings(), denoise=False,
                                   taa=Taa.NONE, upscale=Upscale.none(),
                                   indirect_bounces=0)
    h, w = 32, 64
    scene_h = build_scene()
    gpu = scene_h.compile()
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=w, height=h)
    tracer = make_tracer(gpu.num_triangles)
    fn = build_render_frame(settings, (h, w), tracer, no_texture=True)
    scene = gpu.as_pytree()
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    frame = make_frame_uniform(settings, 1)
    noise = noise_constant()
    carry = init_carry((h, w), settings)

    img1, alb1, _ = jax.jit(fn)(scene, view, frame, noise, carry)

    mesh = make_mesh(8)
    render_size = scaled_size((h, w), settings.upscale_ratio)
    rows = {h, render_size[0]}
    jfn, args = shard_frame(fn, mesh, scene, view, frame, noise, carry, rows)
    img8, alb8, carry8 = jfn(*args)

    assert np.allclose(np.asarray(img1), np.asarray(img8), atol=1e-4)
    assert np.allclose(np.asarray(alb1), np.asarray(alb8), atol=1e-4)
    # carry shards row-wise
    sh = carry8["direct_temporal"].sharding
    assert sh.is_fully_replicated or sh.spec[0] is not None
