"""API surface parity checks: settings defaults, custom materials,
upscale modes."""

import dataclasses

import numpy as np
import pytest

from hikari_tpu import (
    Camera,
    HikariSettings,
    Renderer,
    StandardMaterial,
    Taa,
    Upscale,
)
from hikari_tpu.config import UpscaleMode


def test_settings_defaults_match_reference():
    """reference src/lib.rs:436-455"""
    s = HikariSettings()
    assert s.direct_validate_interval == 3
    assert s.emissive_validate_interval == 5
    assert s.max_temporal_reuse_count == 50
    assert s.max_spatial_reuse_count == 800
    assert s.max_reservoir_lifetime == 100.0
    assert abs(s.solar_angle - 0.046) < 1e-9
    assert s.indirect_bounces == 1
    assert s.max_indirect_luminance == 10.0
    assert s.clear_color == (0.4, 0.4, 0.4, 1.0)
    assert s.temporal_reuse is True
    assert s.emissive_spatial_reuse is False
    assert s.indirect_spatial_reuse is True
    assert s.denoise is True
    assert s.taa == Taa.JASMINE
    assert s.upscale.mode == UpscaleMode.SMAA_TU4X
    assert s.upscale.clamped_ratio == 2.0


def test_upscale_ratio_clamped():
    assert Upscale.smaa_tu4x(5.0).clamped_ratio == 2.0
    assert Upscale.fsr1(0.5).clamped_ratio == 1.0


def test_custom_material_adapter():
    class Glowy:
        def to_standard_material(self):
            return StandardMaterial(emissive=(1, 0, 0, 1))

    from hikari_tpu.models.scene import Scene

    sc = Scene()
    mid = sc.add_material(Glowy())
    assert sc.materials[mid].emissive == (1, 0, 0, 1)


def test_smaa_ratio1_supersampling():
    """SmaaTu4x ratio 1.0: lighting at full res, SMAA doubles, overlay
    downsamples (the reference's replacement for Upscale::None)."""
    from examples.minimal import build_scene

    st = dataclasses.replace(HikariSettings(),
                             upscale=Upscale.smaa_tu4x(1.0), denoise=False)
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=64, height=40)
    r = Renderer(build_scene(), cam, st)
    img = r.render(frames=3)
    assert img.shape == (40, 64, 4)
    assert np.isfinite(img).all()


def test_smaa_continuous_ratio():
    """Upscale::ratio anywhere in [1,2] (lib.rs:474-513): ratio 1.5 renders
    lighting at size/1.5, SMAA doubles it, overlay resamples to target."""
    from examples.minimal import build_scene

    st = dataclasses.replace(HikariSettings(),
                             upscale=Upscale.smaa_tu4x(1.5), denoise=False)
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=96, height=60)
    r = Renderer(build_scene(), cam, st)
    img = r.render(frames=3)
    assert img.shape == (60, 96, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.05  # actually lit


def test_fsr_continuous_ratio():
    from examples.minimal import build_scene

    st = dataclasses.replace(HikariSettings(),
                             upscale=Upscale.fsr1(1.3), denoise=False)
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=96, height=60)
    r = Renderer(build_scene(), cam, st)
    img = r.render(frames=2)
    assert img.shape == (60, 96, 4)
    assert np.isfinite(img).all()


def test_update_settings_live():
    """Dynamic fields retune without recompilation; static-key changes
    rebuild the pipeline (the reference's inspector + pipeline cache)."""
    from examples.minimal import build_scene

    st = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                             upscale=Upscale.none())
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=64, height=40)
    r = Renderer(build_scene(), cam, st)
    r.render_frame()
    fn_before = r._frame_fn
    r.update_settings(solar_angle=0.1, max_indirect_luminance=5.0)
    assert r._frame_fn is fn_before  # dynamic: no rebuild
    img = np.asarray(r.render_frame())
    assert np.isfinite(img).all()
    r.update_settings(indirect_bounces=2)
    assert r._frame_fn is not fn_before  # static: respecialized
    img = np.asarray(r.render_frame())
    assert np.isfinite(img).all()
