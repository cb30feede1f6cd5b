"""Minimal scene: cube + plane + directional sun (reference
examples/minimal.rs:20-66)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from examples.common import parse_args, run
from hikari_tpu import Scene, StandardMaterial
from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.scene import DirectionalLight, make_transform


def build_scene() -> Scene:
    sc = Scene()
    plane = sc.add_mesh(shapes.plane(5.0))
    cube = sc.add_mesh(shapes.cube(1.0))
    green = sc.add_material(StandardMaterial.from_color(0.3, 0.5, 0.3))
    tan = sc.add_material(StandardMaterial.from_color(0.8, 0.7, 0.6))
    sc.spawn(plane, green)
    sc.spawn(cube, tan, make_transform((0.0, 0.5, 0.0)))
    sc.directional_light = DirectionalLight.from_euler(
        -np.pi / 4, np.pi / 4, 0.0, illuminance=10000.0)
    return sc


if __name__ == "__main__":
    from hikari_tpu import HikariSettings

    args = parse_args("minimal: cube + plane + sun")
    run(build_scene(), dict(eye=(-2.0, 2.5, 5.0), target=(0, 0, 0)),
        HikariSettings(), args, "minimal")
