"""glTF scene benchmark config: textured model + emissive sphere, 4 indirect
bounces, FSR1 upscale (reference examples/scene.rs; its `models/scene.gltf`
asset isn't shipped, so the FlightHelmet glTF stands in as the textured
scene)."""

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
from hikari_tpu.models.material import Texture
from hikari_tpu.models.scene import DirectionalLight, make_transform

ASSETS = os.environ.get("HIKARI_ASSETS", "/root/reference/assets")


def build_scene() -> Scene:
    sc = Scene()
    helmet = os.path.join(ASSETS, "models/FlightHelmet/FlightHelmet.gltf")
    if os.path.exists(helmet):
        load_gltf_scene(helmet, sc, max_texture_side=512)
        scale = 6.0
        for inst in sc.instances:
            inst.transform = make_transform((0, 0, 0), scale=(scale,) * 3) @ inst.transform
    ground = sc.add_material(StandardMaterial((0.6, 0.6, 0.6, 1.0),
                                              perceptual_roughness=0.9))
    sc.spawn(sc.add_mesh(shapes.plane(40.0)), ground)

    # emissive sphere (scene.rs:85-104)
    sphere = sc.add_mesh(shapes.uv_sphere(0.5))
    em = sc.add_material(StandardMaterial(emissive=(1.0, 1.0, 1.0, 0.5)))
    sc.spawn(sphere, em, make_transform((2.0, 2.0, 0.0)))

    sc.directional_light = DirectionalLight.from_euler(
        -np.pi / 4, np.pi / 4, 0.0, illuminance=100000.0)
    return sc


if __name__ == "__main__":
    args = parse_args("scene: glTF + 4 bounces + FSR1")
    settings = dataclasses.replace(
        HikariSettings(), indirect_bounces=4, upscale=Upscale.fsr1(2.0))
    run(build_scene(), dict(eye=(-4.0, 2.0, 4.0), target=(0, 1.0, 0)),
        settings, args, "scene")
