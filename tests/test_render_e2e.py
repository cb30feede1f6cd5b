"""End-to-end frame pipeline smoke + semantic checks on the minimal scene."""

import dataclasses

import numpy as np
import pytest

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale

W, H = 128, 72


def build_minimal():
    from examples.minimal import build_scene

    return build_scene()


@pytest.fixture(scope="module")
def plain_render():
    st = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                             upscale=Upscale.none())
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=W, height=H)
    r = Renderer(build_minimal(), cam, st)
    img = r.render(frames=8)
    return r, img


def test_no_nans_and_in_range(plain_render):
    _, img = plain_render
    assert img.shape == (H, W, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].min() >= 0.0
    assert img[..., :3].max() <= 1.5


def test_background_is_clear_color(plain_render):
    _, img = plain_render
    # top-left corner is sky
    assert np.allclose(img[0, 0, :3], [0.4, 0.4, 0.4], atol=1e-3)


def test_shadow_darker_than_lit(plain_render):
    _, img = plain_render
    # cube casts a shadow left of it; lit plane right side is brighter
    lit = img[int(0.75 * H), int(0.8 * W), :3].mean()
    shadow = img[int(0.45 * H), int(0.30 * W), :3].mean()
    assert lit > shadow * 1.3, (lit, shadow)


def test_full_pipeline_runs():
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=W, height=H)
    r = Renderer(build_minimal(), cam, HikariSettings())
    img = r.render(frames=3)
    assert np.isfinite(img).all()
    assert img.shape == (H, W, 4)


def test_fsr_pipeline_runs():
    st = dataclasses.replace(HikariSettings(), upscale=Upscale.fsr1(2.0),
                             indirect_bounces=2)
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=W, height=H)
    r = Renderer(build_minimal(), cam, st)
    img = r.render(frames=2)
    assert np.isfinite(img).all()
    assert img.shape == (H, W, 4)


def test_deterministic():
    st = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                             upscale=Upscale.none())
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=W, height=H)
    a = Renderer(build_minimal(), cam, st).render(frames=3)
    b = Renderer(build_minimal(), cam, st).render(frames=3)
    assert np.array_equal(a, b)
