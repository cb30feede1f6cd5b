"""The static no-reuse specialization of the lighting channels must equal
the full reservoir path fed an empty previous reservoir on a
non-validation frame (they are the same algebra: single-sample WRS always
replaces, clamp no-op, finalize w = w_new/lum, variance = 0)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from examples.cornell import build_scene
from hikari_tpu import Camera, HikariSettings
from hikari_tpu.config import make_frame_uniform
from hikari_tpu.ops import reservoir as rsv
from hikari_tpu.ops import restir
from hikari_tpu.ops.noise import noise_constant, sample_blue_noise
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.config import Taa, UpscaleMode


def _stage(size=(40, 64)):
    h, w = size
    gpu = build_scene().compile()
    scene = gpu.as_pytree()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=w, height=h)
    tracer = make_tracer(gpu.num_triangles)
    settings = HikariSettings()
    # frame 7: 7 % 3 != 0 and 7 % 5 != 0 -> no validation branch taken
    frame = make_frame_uniform(settings, 7)
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    gbuf = prepass(scene, tracer, view, view, frame["number"], size,
                   Taa.NONE, UpscaleMode.NONE)
    g = restir.resample_gbuffer(gbuf, size, frame["number"], 1.0)
    rand = sample_blue_noise(noise_constant(), frame["number"], size)
    reproj = restir.reprojection(g, frame, size)
    return scene, tracer, g, view, frame, rand, reproj, size


def test_direct_lit_fastpath_matches_full_path():
    scene, tracer, g, view, frame, rand, reproj, size = _stage()
    prev = rsv.empty_reservoir(size)
    fast = restir.direct_lit(
        scene, tracer, g, view, frame, rand, reproj, prev, None,
        emissive_lit=True, temporal_reuse=False, no_texture=True,
        track_spatial=False, render_size=size)
    full = restir.direct_lit(
        scene, tracer, g, view, frame, rand, reproj, prev, None,
        emissive_lit=True, temporal_reuse=True, no_texture=True,
        track_spatial=False, render_size=size)
    a = np.asarray(fast["render"])
    b = np.asarray(full["render"])
    assert np.allclose(a, b, atol=2e-4, rtol=2e-4), np.abs(a - b).max()
    assert np.allclose(np.asarray(fast["variance"]),
                       np.asarray(full["variance"]), atol=1e-5)


def test_indirect_fastpath_matches_full_path():
    scene, tracer, g, view, frame, rand, reproj, size = _stage()
    prev = rsv.empty_reservoir(size)
    kw = dict(bounces=1, no_texture=True, track_spatial=False,
              render_size=size)
    fast = restir.indirect_lit_ambient(
        scene, tracer, g, view, frame, rand, reproj, prev, None,
        temporal_reuse=False, **kw)
    full = restir.indirect_lit_ambient(
        scene, tracer, g, view, frame, rand, reproj, prev, None,
        temporal_reuse=True, **kw)
    a = np.asarray(fast["render"])
    b = np.asarray(full["render"])
    assert np.allclose(a, b, atol=2e-4, rtol=2e-4), np.abs(a - b).max()
    assert np.allclose(np.asarray(fast["variance"]),
                       np.asarray(full["variance"]), atol=1e-5)
