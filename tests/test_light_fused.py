"""Fused lighting mega-kernel (ops/light_fused.py) vs the modular no-reuse
fast paths (ops/restir.py) — channel-for-channel numerical parity.

Both implementations derive from the same light.wgsl contract; the fused
kernel must reproduce the modular pipeline's values (same candidate
selection, pdf, occlusion, shading) up to float-associativity noise.
Runs the kernel in Pallas interpret mode on the CPU test platform.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu import Camera, HikariSettings
from hikari_tpu.config import Taa, UpscaleMode, make_frame_uniform
from hikari_tpu.ops import reservoir as rsv
from hikari_tpu.ops import restir
from hikari_tpu.ops.light_fused import fused_eligible, fused_lighting
from hikari_tpu.ops.noise import noise_constant, sample_blue_noise
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.trace import make_tracer
from tests.test_trace import emissive_scene

SIZE = (48, 64)


def _ctx(gpu, eye, target, frame_number=3, bounces=1):
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)
    cam = Camera.from_look_at(eye, target, width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=False, emissive_spatial_reuse=False,
        indirect_spatial_reuse=False, indirect_bounces=bounces)
    frame = make_frame_uniform(settings, frame_number)
    prev_view = {"view_proj": view["view_proj"],
                 "inverse_view_proj": view["inverse_view_proj"]}
    gbuf = prepass(scene, tracer, view, prev_view, frame["number"], SIZE,
                   Taa.NONE, UpscaleMode.NONE)
    rand = sample_blue_noise(noise_constant(), frame["number"], SIZE)
    return scene, tracer, view, frame, gbuf, rand


def _modular(scene, tracer, view, frame, g, rand, *, has_sun, num_em,
             bounces, no_texture):
    reproj = restir.reprojection(g, frame, SIZE)
    prev = [rsv.empty_reservoir(SIZE) for _ in range(3)]
    out = {}
    if has_sun:
        d = restir.direct_lit(
            scene, tracer, g, view, frame, rand, reproj, prev[0], None,
            emissive_lit=False, temporal_reuse=False, no_texture=no_texture,
            track_spatial=False, render_size=SIZE)
        out["d_render"] = d["render"]
    if num_em > 0:
        e = restir.direct_lit(
            scene, tracer, g, view, frame, rand, reproj, prev[1], None,
            emissive_lit=True, temporal_reuse=False, no_texture=no_texture,
            track_spatial=False, render_size=SIZE)
        out["e_render"] = e["render"]
    if bounces > 0:
        i = restir.indirect_lit_ambient(
            scene, tracer, g, view, frame, rand, reproj, prev[2], None,
            bounces=bounces, temporal_reuse=False, no_texture=no_texture,
            track_spatial=False, render_size=SIZE)
        out["i_render"] = i["render"]
    return out


def _assert_close(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    assert not np.isnan(a).any(), name
    diff = np.abs(a - b)
    scale = np.maximum(np.abs(b), 1.0)
    rel = diff / scale
    frac_bad = (rel > 1e-3).mean()
    # occlusion/pdf decisions at float epsilon may flip on a few isolated
    # pixels between the two formulations; the field must agree everywhere
    # else
    assert frac_bad < 0.01, (name, frac_bad, rel.max())
    assert np.median(diff) < 1e-4, (name, np.median(diff))


@pytest.mark.parametrize("bounces", [1, 2])
def test_fused_matches_modular_emissive_scene(bounces):
    gpu = emissive_scene().compile()
    scene, tracer, view, frame, g, rand = _ctx(
        gpu, (3.0, 2.5, 3.0), (0, 0.5, 0), bounces=bounces)
    has_sun = gpu.has_sun
    num_em = gpu.num_emissives
    assert num_em > 0
    assert fused_eligible(
        scene, no_texture=True, num_emissives=num_em, temporal_reuse=False,
        track_de=False, track_ind=False, tracer_kind="brute_force_pallas",
        has_sun=has_sun, bounces=bounces)

    ref = _modular(scene, tracer, view, frame, g, rand, has_sun=has_sun,
                   num_em=num_em, bounces=bounces, no_texture=True)
    got = fused_lighting(scene, g, view, frame, rand, has_sun=has_sun,
                         num_emissives=num_em, bounces=bounces,
                         render_size=SIZE, interpret=True)
    assert set(got.keys()) == set(ref.keys())
    for k in ref:
        _assert_close(k, got[k], ref[k])


def test_fused_matches_modular_sun_only():
    from examples.minimal import build_scene

    gpu = build_scene().compile()
    scene, tracer, view, frame, g, rand = _ctx(
        gpu, (-2.0, 2.5, 5.0), (0, 0, 0), frame_number=7)
    has_sun = gpu.has_sun
    num_em = gpu.num_emissives
    assert has_sun
    ref = _modular(scene, tracer, view, frame, g, rand, has_sun=has_sun,
                   num_em=num_em, bounces=1, no_texture=True)
    got = fused_lighting(scene, g, view, frame, rand, has_sun=has_sun,
                         num_emissives=num_em, bounces=1,
                         render_size=SIZE, interpret=True)
    for k in ref:
        _assert_close(k, got[k], ref[k])


def test_fused_not_eligible_with_reuse_or_textures():
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    base = dict(no_texture=True, num_emissives=gpu.num_emissives,
                temporal_reuse=False, track_de=False, track_ind=False,
                tracer_kind="brute_force_pallas")
    assert fused_eligible(scene, **base)
    # temporal reuse is now covered in-kernel, EXCEPT under checkerboard
    assert fused_eligible(scene, **{**base, "temporal_reuse": True})
    assert not fused_eligible(scene, **{**base, "temporal_reuse": True,
                                        "ckb": True})
    assert not fused_eligible(scene, **{**base, "track_de": True})
    assert not fused_eligible(scene, **{**base, "no_texture": False})
    assert not fused_eligible(scene, **{**base, "tracer_kind": "cull"})


def test_fused_temporal_matches_modular_over_frames(monkeypatch):
    """In-kernel temporal ReSTIR (gates + WRS + validation + repack) vs the
    modular restir path: full-frame pipeline comparison over 4 frames from
    the same initial carry. WRS replacement decisions are threshold
    comparisons, so float-associativity noise can flip isolated pixels —
    assert near-equality for >=99% of pixels and close renders."""
    import jax

    from hikari_tpu.frame import build_render_frame, init_carry
    from hikari_tpu.ops import light_fused as _lf
    from hikari_tpu.ops.noise import noise_constant

    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)
    # On CPU make_tracer yields kind 'brute_force', which fails
    # build_render_frame's fused gates — stub the kind so the frame
    # really routes through the fused kernels (they auto-interpret on
    # the CPU platform); the modular run still calls the real XLA
    # tracer functions, only the gate sees the stub.
    monkeypatch.setattr(tracer, "kind", "brute_force_pallas",
                        raising=False)
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=False,
        indirect_spatial_reuse=False, denoise=False, taa=Taa.NONE,
        indirect_bounces=1, checkerboard_lighting=False)
    settings = dataclasses.replace(
        settings, upscale=settings.upscale.__class__.none()
        if hasattr(settings.upscale, "none") else settings.upscale)
    from hikari_tpu import Upscale

    settings = dataclasses.replace(settings, upscale=Upscale.none())
    noise = noise_constant()

    assert _lf.fused_eligible(
        scene, no_texture=True, num_emissives=gpu.num_emissives,
        temporal_reuse=True, track_de=False, track_ind=False,
        tracer_kind="brute_force_pallas", has_sun=gpu.has_sun, bounces=1)

    calls = []
    real_fused_lighting = _lf.fused_lighting

    def spy(*a, **k):
        calls.append(k.get("temporal"))
        return real_fused_lighting(*a, **k)

    def run(force_modular):
        # the gates are evaluated at TRACE time (first jitted call), so
        # the stubs must stay active through the whole frame loop
        saved_gate = _lf.fused_eligible
        _lf.fused_lighting = spy
        if force_modular:
            _lf.fused_eligible = lambda *a, **k: False
        try:
            fn = build_render_frame(settings, SIZE, tracer,
                                    no_texture=True,
                                    num_emissives=gpu.num_emissives,
                                    has_sun=gpu.has_sun)
            carry = init_carry(SIZE, settings)
            imgs, carries = [], []
            jfn = jax.jit(fn)
            for i in range(1, 5):
                frame = make_frame_uniform(settings, i)
                img, _, carry = jfn(scene, view, frame, noise, carry)
                imgs.append(np.asarray(img))
                carries.append(jax.tree.map(np.asarray, carry))
            return imgs, carries
        finally:
            _lf.fused_eligible = saved_gate
            _lf.fused_lighting = real_fused_lighting

    imgs_m, carries_m = run(True)
    assert not calls, "modular run must not invoke the fused kernel"
    imgs_f, carries_f = run(False)
    assert calls and calls[0] is True, \
        "fused run must trace fused_lighting(temporal=True)"
    for i, (a, b) in enumerate(zip(imgs_m, imgs_f)):
        close = np.isclose(a, b, atol=5e-3, rtol=1e-2).all(axis=-1)
        assert close.mean() > 0.99, (i, close.mean())
    for key in ("direct_temporal", "emissive_temporal",
                "indirect_temporal"):
        rm = rsv.unpack_reservoir_planes(jnp.asarray(carries_m[-1][key]))
        rf = rsv.unpack_reservoir_planes(jnp.asarray(carries_f[-1][key]))
        for f in ("count", "w_sum", "visible_instance"):
            a = np.asarray(rm[f], np.float32)
            b = np.asarray(rf[f], np.float32)
            close = np.isclose(a, b, atol=1e-2, rtol=1e-2)
            assert close.mean() > 0.98, (key, f, close.mean())
