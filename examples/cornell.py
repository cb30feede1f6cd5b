"""Cornell box with emissive area light (reference examples/cornell.rs)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

from examples.common import parse_args, run
from hikari_tpu import Scene
from hikari_tpu.models.gltf import load_gltf_scene
from hikari_tpu.models.scene import DirectionalLight

ASSET = os.environ.get(
    "HIKARI_ASSETS", "/root/reference/assets") + "/models/cornell.glb"


def build_scene() -> Scene:
    sc = Scene()
    load_gltf_scene(ASSET, sc)
    # cornell.rs spawns no sun: emissive quad + ambient only
    sc.directional_light = DirectionalLight(illuminance=0.0)
    return sc


if __name__ == "__main__":
    import dataclasses

    from hikari_tpu import HikariSettings

    args = parse_args("cornell: emissive box via alias-table NEE")
    # cornell.rs:17 inserts ClearColor(Color::BLACK)
    settings = dataclasses.replace(HikariSettings(),
                                   clear_color=(0.0, 0.0, 0.0, 1.0))
    run(build_scene(), dict(eye=(0.0, 1.0, 4.0), target=(0.0, 1.0, 0.0)),
        settings, args, "cornell")
