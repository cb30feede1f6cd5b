"""Box room + two emissive textured Earth spheres + sun
(reference examples/simple.rs:54-266). The extinguisher glb the reference
references is not shipped in its assets; like Bevy with a missing asset, we
skip it."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import numpy as np

from examples.common import parse_args, run
from hikari_tpu import Scene, StandardMaterial
from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.material import Texture
from hikari_tpu.models.scene import DirectionalLight, make_transform

ASSETS = os.environ.get("HIKARI_ASSETS", "/root/reference/assets")


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def build_scene() -> Scene:
    sc = Scene()
    cube = sc.add_mesh(shapes.cube(1.0))
    plane = sc.add_mesh(shapes.plane(1.0))
    sphere = sc.add_mesh(shapes.uv_sphere(0.5))

    def mat(color, rough=0.9, **kw):
        return sc.add_material(StandardMaterial(
            base_color=tuple(color) + (1.0,), perceptual_roughness=rough, **kw))

    ground = mat((0.3, 0.5, 0.3))
    white = mat((1.0, 1.0, 1.0))
    pink = mat((1.0, 0.08, 0.58))  # Color::PINK
    aqua = mat((0.5, 1.0, 0.83))  # Color::AQUAMARINE

    sc.spawn(cube, ground, make_transform((0, -0.5, 0), scale=(8, 1, 8)))
    sc.spawn(plane, white, make_transform((0, -1.0, 0), scale=(400, 1, 400)))
    sc.spawn(cube, pink, make_transform((-3.5, 3, 0), scale=(1, 6, 8)))
    sc.spawn(cube, white, make_transform((3.5, 3, 0), scale=(1, 6, 8)))
    sc.spawn(cube, aqua, make_transform((0, 3, -3.5), scale=(6, 6, 1)))
    sc.spawn(cube, white, make_transform((0, 6.5, 0), scale=(8, 1, 8)))

    # Emissive Earth spheres
    earth_path = os.path.join(ASSETS, "models/Earth/earth_daymap.jpg")
    earth_tex = None
    if os.path.exists(earth_path):
        from PIL import Image

        img = Image.open(earth_path).convert("RGBA")
        img.thumbnail((1024, 1024))
        earth_tex = Texture(np.asarray(img), is_srgb=True)
    for x, alpha in ((2.0, 0.5), (-2.0, 0.1)):
        m = sc.add_material(StandardMaterial(
            base_color_texture=earth_tex,
            emissive=(1.0, 1.0, 1.0, alpha),
            emissive_texture=earth_tex))
        sc.spawn(sphere, m,
                 make_transform((x, 1.0, 0.0), rotation=rot_x(-np.pi / 2)))

    sc.directional_light = DirectionalLight.from_euler(
        -np.pi / 4, np.pi / 4, 0.0, illuminance=10000.0)
    return sc


if __name__ == "__main__":
    from hikari_tpu import HikariSettings

    args = parse_args("simple: ReSTIR reuse + TAA + emissive spheres")
    import dataclasses

    settings = dataclasses.replace(HikariSettings(),
                                   emissive_spatial_reuse=True)
    run(build_scene(), dict(eye=(-10.0, 2.5, 20.0), target=(0, 0, 0)),
        settings, args, "simple")
