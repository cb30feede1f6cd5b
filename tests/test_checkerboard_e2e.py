"""Checkerboard lighting end-to-end: quality vs full lighting, and
shape/NaN sanity with the full ReSTIR stack (temporal + spatial reuse)."""

import dataclasses

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale
from tests.test_trace import emissive_scene


def _cam(w=96, h=64):
    return Camera.from_look_at((3.0, 2.5, 3.0), (0, 0.5, 0), width=w, height=h)


def test_checkerboard_close_to_full_lighting():
    base = dataclasses.replace(
        HikariSettings(), temporal_reuse=False, emissive_spatial_reuse=False,
        indirect_spatial_reuse=False, denoise=True, indirect_bounces=1,
        taa=Taa.NONE, upscale=Upscale.none())
    cam = _cam()
    imgs = {}
    for ckb in (False, True):
        s = dataclasses.replace(base, checkerboard_lighting=ckb)
        r = Renderer(emissive_scene(), cam, s)
        imgs[ckb] = np.asarray(r.render(4))[..., :3]
    assert not np.isnan(imgs[True]).any()
    rel = np.abs(imgs[True] - imgs[False]).mean() / max(imgs[False].mean(), 1e-9)
    assert rel < 0.05, rel


def test_checkerboard_with_reuse_stack():
    s = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=True,
        indirect_spatial_reuse=True, denoise=True, indirect_bounces=1,
        taa=Taa.JASMINE, upscale=Upscale.smaa_tu4x(2.0),
        checkerboard_lighting=True)
    cam = _cam(128, 64)
    r = Renderer(emissive_scene(), cam, s)
    img = np.asarray(r.render(5))
    assert img.shape == (64, 128, 4)
    assert not np.isnan(img).any()
    assert img[..., :3].mean() > 0.01  # actually lit


def test_spatial_tap_scramble_runs():
    """Per-pixel spiral scrambling (quality flag) produces a sane image and
    differs from the unscrambled spiral (decorrelation actually happens)."""
    base = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=True,
        indirect_spatial_reuse=True, denoise=False, indirect_bounces=1,
        taa=Taa.NONE, upscale=Upscale.none())
    cam = _cam()
    imgs = {}
    for scr in (False, True):
        s = dataclasses.replace(base, spatial_tap_scramble=scr)
        r = Renderer(emissive_scene(), cam, s)
        imgs[scr] = np.asarray(r.render(3))[..., :3]
    assert not np.isnan(imgs[True]).any()
    assert imgs[True].mean() > 0.01
    # same lighting on average, different sample placement
    rel = abs(imgs[True].mean() - imgs[False].mean()) / max(imgs[False].mean(), 1e-9)
    assert rel < 0.15, rel
    assert np.abs(imgs[True] - imgs[False]).max() > 1e-4
