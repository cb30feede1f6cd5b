"""City scene: high instance count, per-frame BVH rebuild, SMAA TU4X,
HDR+bloom (reference examples/city.rs; the Low-Poly house glbs aren't
shipped, so the City glTF from the reference assets provides the
instance-heavy content)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import os

import numpy as np

from examples.common import parse_args, run
from hikari_tpu import HikariSettings, Scene, StandardMaterial, Upscale
from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.gltf import load_gltf_scene
from hikari_tpu.models.scene import DirectionalLight, make_transform

ASSETS = os.environ.get("HIKARI_ASSETS", "/root/reference/assets")


def build_scene(max_texture_side=256) -> Scene:
    sc = Scene()
    city = os.path.join(ASSETS, "models/City/scene.gltf")
    loaded = False
    if os.path.exists(city):
        try:
            load_gltf_scene(city, sc, max_texture_side=max_texture_side)
            loaded = True
        except FileNotFoundError:
            # the reference repo ships City/scene.gltf without its scene.bin
            # buffer (LFS-stripped); fall back to procedural content
            pass
    if not loaded:
        # fallback: procedural blocks
        cube = sc.add_mesh(shapes.cube(1.0))
        m = sc.add_material(StandardMaterial.from_color(0.7, 0.7, 0.7))
        rng = np.random.default_rng(0)
        for _ in range(200):
            x, z = rng.uniform(-30, 30, 2)
            h = rng.uniform(1, 8)
            sc.spawn(cube, m, make_transform((x, h / 2, z), scale=(2, h, 2)))
    sc.directional_light = DirectionalLight.from_euler(
        -np.pi / 4, np.pi / 4, 0.0, illuminance=10000.0)
    return sc


if __name__ == "__main__":
    args = parse_args("city: many instances + SMAA TU4X + HDR")
    settings = dataclasses.replace(HikariSettings(),
                                   upscale=Upscale.smaa_tu4x(2.0))
    run(build_scene(), dict(eye=(0.0, 2.5, 20.0), target=(0, 0, 0), hdr=True),
        settings, args, "city")
