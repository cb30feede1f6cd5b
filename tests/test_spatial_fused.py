"""Fused spatial-ReSTIR kernel (ops/spatial_fused.py) vs the modular
restir.spatial_reuse — numerical parity in Pallas interpret mode.

Both derive from light.wgsl:1500-1676. The fused kernel receives the
previous spatial reservoir ALREADY reprojection-gathered (the caller's
banded gather); the modular pass gathers internally — the test feeds the
fused kernel exactly what the modular gather produces so the comparison
isolates the tap/merge/shade algebra. WRS replacement decisions are
threshold comparisons, so float-associativity noise can flip isolated
pixels; assert near-equality on >=99% of pixels.
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
from hikari_tpu.ops.noise import noise_constant, sample_blue_noise
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.spatial_fused import spatial_fused
from hikari_tpu.ops.trace import make_tracer
from tests.test_trace import emissive_scene

SIZE = (48, 128)


def _ctx(frame_number=5):
    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=False,
        emissive_spatial_reuse=True, indirect_spatial_reuse=True)
    frame = make_frame_uniform(settings, frame_number)
    prev_view = {"view_proj": view["view_proj"],
                 "inverse_view_proj": view["inverse_view_proj"]}
    gbuf = prepass(scene, tracer, view, prev_view, frame["number"], SIZE,
                   Taa.NONE, UpscaleMode.NONE)
    rand = sample_blue_noise(noise_constant(), frame["number"], SIZE)
    return gpu, scene, tracer, view, frame, gbuf, rand


def _temporal_reservoir(gpu, scene, tracer, view, frame, g, rand,
                        emissive_lit):
    """A realistic 'this frame's temporal' reservoir via the modular
    channel (count=1 fresh samples, real radiance/positions)."""
    reproj = restir.reprojection(g, frame, SIZE)
    prev = rsv.empty_reservoir(SIZE)
    if emissive_lit:
        out = restir.direct_lit(
            scene, tracer, g, view, frame, rand, reproj, prev,
            jnp.zeros(SIZE + (rsv.PACKED_WIDTH,)), emissive_lit=True,
            temporal_reuse=True, no_texture=True, track_spatial=True,
            render_size=SIZE)
    else:
        out = restir.indirect_lit_ambient(
            scene, tracer, g, view, frame, rand, reproj, prev,
            jnp.zeros(SIZE + (rsv.PACKED_WIDTH,)), bounces=1,
            temporal_reuse=True, no_texture=True, track_spatial=True,
            render_size=SIZE)
    return out["temporal"], reproj


def _prev_spatial(temporal_r, shift):
    """A nonzero previous-spatial buffer: the temporal reservoir rolled a
    few pixels (so lifetimes/counts/positions are plausible)."""
    p = rsv.pack_reservoir(temporal_r)
    p = jnp.roll(p, shift, axis=(0, 1))
    return p


def _quantize(r):
    """Round-trip through the packed layout (the fused kernel emits packed
    planes, which quantize radiance/randoms/normals)."""
    return rsv.unpack_reservoir(rsv.pack_reservoir(r))


def _close_frac(a, b, atol=5e-3, rtol=1e-2):
    return np.isclose(np.asarray(a), np.asarray(b), atol=atol,
                      rtol=rtol).mean()


@pytest.mark.parametrize("emissive_lit", [True, False])
@pytest.mark.parametrize("lifetime_gate", [False, True])
def test_spatial_fused_matches_modular(emissive_lit, lifetime_gate):
    gpu, scene, tracer, view, frame, g, rand = _ctx()
    temporal_r, reproj = _temporal_reservoir(
        gpu, scene, tracer, view, frame, g, rand, emissive_lit)
    prev_packed = _prev_spatial(temporal_r, (3, 5))
    if lifetime_gate:
        # force max_reservoir_lifetime so keep_history selects prev
        frame = dict(frame)
        frame["max_reservoir_lifetime"] = jnp.float32(100.0)

    ref = restir.spatial_reuse(
        scene, g, view, frame, temporal_r, prev_packed, reproj,
        emissive_lit=emissive_lit, no_texture=True, render_size=SIZE)

    # what the modular pass's internal gather produced, as channel planes
    prev_gathered = rsv.gather_reservoir_packed(
        prev_packed, reproj["piy"], reproj["pix"], reproj["in_strict"])
    prev_planes = rsv.pack_reservoir_planes(prev_gathered)
    temporal_planes = rsv.pack_reservoir_planes(temporal_r)

    got = spatial_fused(scene, g, view, frame, temporal_planes,
                        prev_planes, emissive_lit=emissive_lit,
                        render_size=SIZE, interpret=True)

    valid = np.asarray(g["position"][..., 3] >= 1.1920929e-7)

    # render parity
    fr = _close_frac(got["render"], ref["render"])
    assert fr > 0.99, ("render", fr)

    # variance parity incl. the NaN coding (NaN where the temporal
    # variance should remain)
    rv = np.asarray(ref["variance"])
    gv = np.asarray(got["variance"])
    assert ((np.isnan(rv) == np.isnan(gv)) | ~valid).mean() > 0.999
    both = ~np.isnan(rv) & ~np.isnan(gv)
    if both.any():
        # w2_sum is quadratically sensitive to WRS replacement flips, and
        # the fused q0 comes from the bf16-packed planes (modular reads
        # the unpacked f32 temporal) -> slightly wider tolerance
        assert np.isclose(rv[both], gv[both], atol=5e-3,
                          rtol=1e-2).mean() > 0.98

    # reservoir carry parity (modular: valid -> reuse result, invalid ->
    # temporal, then frame.py zeroes invalids; compare after the same
    # packing quantization)
    mod = rsv.where_reservoir(jnp.asarray(valid), ref["spatial"],
                              rsv.empty_reservoir(SIZE))
    mod = _quantize(mod)
    fused = rsv.unpack_reservoir_planes(got["spatial_planes"])
    for f in ("count", "w_sum", "w", "lifetime"):
        fr = _close_frac(mod[f], fused[f])
        assert fr > 0.98, (f, fr)
    fr = _close_frac(mod["radiance"], fused["radiance"])
    assert fr > 0.98, ("radiance", fr)


def test_spatial_fused_frame_matches_modular(monkeypatch):
    """Full-frame pipeline with temporal AND spatial reuse: fused
    (mega-kernel + spatial kernel + inline scatter-replaces) vs the
    modular path, 4 frames from the same initial carry. The inline
    replace resolves scatter collisions like the device scatter does
    (arbitrarily), so isolated pixels may differ on validation frames —
    assert >=98% near-equality."""
    import jax

    from hikari_tpu import Upscale
    from hikari_tpu.frame import (build_render_frame, init_carry,
                                  spatial_fused_active)
    from hikari_tpu.ops import light_fused as _lf
    from hikari_tpu.ops.noise import noise_constant

    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)
    monkeypatch.setattr(tracer, "kind", "brute_force_pallas",
                        raising=False)
    cam = Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0),
                              width=SIZE[1], height=SIZE[0])
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=True,
        indirect_spatial_reuse=True, denoise=False, taa=Taa.NONE,
        upscale=Upscale.none(), indirect_bounces=1,
        checkerboard_lighting=False)
    noise = noise_constant()

    assert spatial_fused_active(scene, settings, tracer, True,
                                gpu.num_emissives, gpu.has_sun, SIZE)

    def run(force_modular):
        saved_gate = _lf.fused_eligible
        if force_modular:
            _lf.fused_eligible = lambda *a, **k: False
        try:
            fn = build_render_frame(settings, SIZE, tracer,
                                    no_texture=True,
                                    num_emissives=gpu.num_emissives,
                                    has_sun=gpu.has_sun)
            carry = init_carry(SIZE, settings,
                               spatial_planes=not force_modular)
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

    imgs_m, carries_m = run(True)
    imgs_f, carries_f = run(False)
    for i, (a, b) in enumerate(zip(imgs_m, imgs_f)):
        close = np.isclose(a, b, atol=5e-3, rtol=1e-2).all(axis=-1)
        assert close.mean() > 0.98, (i, close.mean())
    # spatial carries: modular packed [h,w,16] vs fused planes [h,16,w]
    for key in ("spatial_de", "spatial_indirect"):
        rm = rsv.unpack_reservoir(jnp.asarray(carries_m[-1][key]))
        rf = rsv.unpack_reservoir_planes(jnp.asarray(carries_f[-1][key]))
        rm = _quantize(rm)
        for f in ("count", "w_sum"):
            fr = _close_frac(rm[f], rf[f])
            assert fr > 0.97, (key, f, fr)


def test_spatial_fused_empty_prev_matches_modular():
    """Zero previous-spatial carry (first frame) — the lifetime gate keeps
    the temporal reservoir everywhere."""
    gpu, scene, tracer, view, frame, g, rand = _ctx(frame_number=1)
    temporal_r, reproj = _temporal_reservoir(
        gpu, scene, tracer, view, frame, g, rand, True)
    prev_packed = jnp.zeros(SIZE + (rsv.PACKED_WIDTH,))

    ref = restir.spatial_reuse(
        scene, g, view, frame, temporal_r, prev_packed, reproj,
        emissive_lit=True, no_texture=True, render_size=SIZE)
    prev_gathered = rsv.gather_reservoir_packed(
        prev_packed, reproj["piy"], reproj["pix"], reproj["in_strict"])
    got = spatial_fused(scene, g, view, frame,
                        rsv.pack_reservoir_planes(temporal_r),
                        rsv.pack_reservoir_planes(prev_gathered),
                        emissive_lit=True, render_size=SIZE,
                        interpret=True)
    # on the real TPU the Mosaic kernel matches the modular pass on 100%
    # of pixels (verified on-chip); CPU interpret mode diverges on ~1.3%
    # via 1-ulp normalize/rsqrt differences flipping WRS thresholds
    fr = _close_frac(got["render"], ref["render"])
    assert fr > 0.98, fr
