"""Fused Pallas prepass (ops/prepass_fused.py) vs the modular prepass +
full_screen_albedo — plane-for-plane parity (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from hikari_tpu import Camera
from hikari_tpu.config import Taa, UpscaleMode
from hikari_tpu.ops import restir
from hikari_tpu.ops.prepass import frame_jitter, prepass
from hikari_tpu.ops.prepass_fused import prepass_fused, prepass_fused_eligible
from hikari_tpu.ops.trace import make_tracer
from tests.test_trace import emissive_scene

SIZE = (48, 64)


@pytest.mark.parametrize("frame_number", [0, 5])
def test_prepass_fused_matches_modular(frame_number):
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    # a non-identity previous view exercises the velocity path
    cam2 = Camera.from_look_at((3.1, 2.6, 2.9), (0, 0.5, 0),
                               width=SIZE[1], height=SIZE[0])
    prev_view = {k: jnp.asarray(v) for k, v in cam2.view_uniform().items()}

    assert prepass_fused_eligible(scene, no_texture=True,
                                  tracer_kind="brute_force_pallas")

    fn = jnp.uint32(frame_number)
    ref = prepass(scene, tracer, view, prev_view, fn, SIZE,
                  Taa.JASMINE, UpscaleMode.NONE)
    ref_albedo = restir.full_screen_albedo(scene, ref, view, True)
    jit = frame_jitter(fn, Taa.JASMINE, UpscaleMode.NONE)
    got, got_albedo = prepass_fused(scene, view, prev_view, jit, SIZE,
                                    interpret=True)

    for k in ref:
        a = np.asarray(got[k])
        b = np.asarray(ref[k])
        assert a.shape == b.shape, k
        diff = np.abs(a - b)
        scale = np.maximum(np.abs(b), 1.0)
        frac_bad = (diff / scale > 1e-3).mean()
        assert frac_bad < 0.01, (k, frac_bad, diff.max())
    da = np.abs(np.asarray(got_albedo) - np.asarray(ref_albedo))
    assert (da > 1e-3).mean() < 0.01, da.max()


def test_prepass_fused_not_eligible_with_textures():
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    assert not prepass_fused_eligible(scene, no_texture=False,
                                      tracer_kind="brute_force_pallas")
    assert not prepass_fused_eligible(scene, no_texture=True,
                                      tracer_kind="cull")
