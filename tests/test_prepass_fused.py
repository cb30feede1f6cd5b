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


@pytest.mark.parametrize("frame_number", [0, 1])
def test_prepass_fused_decimated_matches_resample(frame_number):
    """The dec_size pass must reproduce restir.resample_gbuffer's ratio-2
    parity decimation bit-exactly (identical ray math at the decimated
    pixel coords); depth_gradient uses its own step-2 estimator."""
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    cam2 = Camera.from_look_at((3.1, 2.6, 2.9), (0, 0.5, 0),
                               width=SIZE[1], height=SIZE[0])
    prev_view = {k: jnp.asarray(v) for k, v in cam2.view_uniform().items()}

    fn = jnp.uint32(frame_number)
    jit = frame_jitter(fn, Taa.JASMINE, UpscaleMode.SMAA_TU4X)
    dec_size = (SIZE[0] // 2, SIZE[1] // 2)
    gbuf, albedo, g_dec, albedo_dec = prepass_fused(
        scene, view, prev_view, jit, SIZE, dec_size=dec_size,
        dec_parity=fn & 1, interpret=True)

    ref = restir.resample_gbuffer(gbuf, dec_size, fn, 2.0)
    for k in ref:
        if k == "depth_gradient":
            continue
        np.testing.assert_array_equal(np.asarray(g_dec[k]),
                                      np.asarray(ref[k]), err_msg=k)
    ref_alb = restir.resample_deferred(albedo, dec_size, fn, 2.0)
    np.testing.assert_array_equal(np.asarray(albedo_dec),
                                  np.asarray(ref_alb))
    # gradient: step-2 forward difference of the decimated depth
    d = np.asarray(g_dec["position"][..., 3])
    ddx = np.concatenate([d[:, 1:] - d[:, :-1], d[:, -1:] - d[:, -2:-1]],
                         axis=1) * 0.5
    np.testing.assert_allclose(np.asarray(g_dec["depth_gradient"][..., 0]),
                               ddx, rtol=1e-6, atol=1e-7)


def test_prepass_fused_quads_match_gbuf():
    """Each SMAA parity-quad plane must equal the corresponding stride-2
    decimation of the full-res G-buffer (smaa.py _parity_ctx contract)."""
    from hikari_tpu.ops.prepass_fused import prepass_fused_quads

    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    cam2 = Camera.from_look_at((3.1, 2.6, 2.9), (0, 0.5, 0),
                               width=SIZE[1], height=SIZE[0])
    prev_view = {k: jnp.asarray(v) for k, v in cam2.view_uniform().items()}
    fn = jnp.uint32(3)
    jit = frame_jitter(fn, Taa.JASMINE, UpscaleMode.SMAA_TU4X)
    gbuf, _ = prepass_fused(scene, view, prev_view, jit, SIZE,
                            interpret=True)
    dec_size = (SIZE[0] // 2, SIZE[1] // 2)
    quads = prepass_fused_quads(scene, view, prev_view, jit, SIZE, dec_size,
                                interpret=True)
    for (a, b), q in quads.items():
        np.testing.assert_array_equal(
            np.asarray(q["depth"]),
            np.asarray(gbuf["position"][a::2, b::2, 3]), err_msg=f"d{a}{b}")
        np.testing.assert_array_equal(
            np.asarray(q["velocity"]),
            np.asarray(gbuf["velocity_uv"][a::2, b::2, :2]),
            err_msg=f"v{a}{b}")
        np.testing.assert_array_equal(
            np.asarray(q["instance"]),
            np.asarray(gbuf["instance_material"][a::2, b::2, 0]),
            err_msg=f"i{a}{b}")


def test_prepass_fused_not_eligible_with_textures():
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    assert not prepass_fused_eligible(scene, no_texture=False,
                                      tracer_kind="brute_force_pallas")
    assert not prepass_fused_eligible(scene, no_texture=True,
                                      tracer_kind="cull")
