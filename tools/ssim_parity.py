"""SSIM parity against the reference's shipped screenshots
(/root/reference/assets/screenshots/*.png, from the wgpu renderer).

Renders the matching example scene at the screenshot's resolution with the
reference-default settings and reports SSIM + mean-abs-diff over the lit
region. These are *different renderers* (sample sequences, blue noise,
denoiser precision all differ), so the score is a structural-parity
indicator, not a bit-match: >0.8 means same geometry/lighting/exposure.

Caveats per scene (documented in PERF.md):
- cornell:   full content parity (cornell.glb is shipped).
- simple-1/3: content parity EXCEPT the extinguisher glb, which the
  reference repo does not ship (examples/simple.rs:217 loads
  models/extinguisher.glb; absent from assets/) — the two foreground
  props in the shots are missing from our render.
- simple-2:  user-moved interior camera; pose estimated by eye.
- scene-1..3: the WW2-town gltf (examples/scene.rs:79 models/scene.gltf)
  is NOT shipped; we render the FlightHelmet substitute from the same
  camera — the score only documents the content gap.
- city:      City/scene.gltf ships without its scene.bin buffer; we render
  the procedural-city substitute from the same camera.

Usage: python tools/ssim_parity.py [scene ...] [--frames 64]
Scenes: cornell simple-1 simple-2 simple-3 scene-1 city  (default: all)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import numpy as np
from PIL import Image

SCREENSHOTS = os.environ.get(
    "HIKARI_SCREENSHOTS", "/root/reference/assets/screenshots")


def _settings(**over):
    from hikari_tpu import HikariSettings

    return dataclasses.replace(
        HikariSettings(), **over)


# scene key -> (example module, camera eye/target, screenshot, settings over)
# Cameras are the reference examples' spawn poses (cited) unless noted.
SCENES = {
    # cornell.rs:49 from_xyz(0,1,4).looking_at((0,1,0)); the shot is
    # slightly zoomed vs the spawn (orbit camera) — z estimated from the
    # box's screen extent. cornell.rs:17 inserts ClearColor(BLACK).
    "cornell": ("examples.cornell", (0.0, 1.0, 3.7), (0.0, 1.0, 0.0),
                "cornell.png", dict(clear_color=(0.0, 0.0, 0.0, 1.0))),
    # simple.rs:256 from_xyz(-10,2.5,20).looking_at(ZERO)
    "simple-1": ("examples.simple", (-10.0, 2.5, 20.0), (0.0, 0.0, 0.0),
                 "simple-1.png", dict(emissive_spatial_reuse=True)),
    # interior close-up; pose estimated by eye (user-moved camera)
    "simple-2": ("examples.simple", (0.0, 1.8, 7.5), (0.0, 1.5, 0.0),
                 "simple-2.png", dict(emissive_spatial_reuse=True)),
    # wide 1280x720 shot; pose estimated by eye near the spawn
    "simple-3": ("examples.simple", (-6.0, 2.0, 22.0), (1.0, 0.5, 0.0),
                 "simple-3.png", dict(emissive_spatial_reuse=True)),
    # scene.rs:131 from_xyz(-20,10,20).looking_at(ZERO); helmet substitute
    "scene-1": ("examples.scene", (-20.0, 10.0, 20.0), (0.0, 0.0, 0.0),
                "scene-1.png", dict(indirect_bounces=4)),
    # city.rs:127 from_xyz(0,2.5,20).looking_at(ZERO); procedural substitute
    "city": ("examples.city", (0.0, 2.5, 20.0), (0.0, 0.0, 0.0),
             "city.png", {}),
}


def render(scene_key, size, frames):
    import importlib

    from hikari_tpu import Camera, Renderer

    module, eye, target, shot, over = SCENES[scene_key]
    build = importlib.import_module(module).build_scene
    # reference-default clear color (lib.rs:447) — the light-gray surround
    # in the screenshots IS the clear color
    settings = _settings(**over)
    cam = Camera.from_look_at(width=size[0], height=size[1],
                              eye=eye, target=target)
    r = Renderer(build(), cam, settings)
    img = None
    for _ in range(frames):
        img = r.render_frame()
    return np.asarray(img)[..., :3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*", default=list(SCENES))
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--outdir", default="/tmp")
    args = ap.parse_args()
    scenes = args.scenes or list(SCENES)

    from hikari_tpu.utils.image import ssim

    for key in scenes:
        shot = SCENES[key][3]
        ref = np.asarray(Image.open(
            os.path.join(SCREENSHOTS, shot)).convert("RGB"),
            np.float32) / 255.0
        h, w = ref.shape[:2]
        lin = np.clip(render(key, (w, h), args.frames), 0.0, 1.0)
        # the screenshots are sRGB swapchain captures; encode ours to match
        ours = np.where(lin <= 0.0031308, 12.92 * lin,
                        1.055 * lin ** (1.0 / 2.4) - 0.055)
        score = ssim(ours, ref)
        lit = ref.max(-1) > 0.02
        mad = float(np.abs(ours - ref)[lit].mean())
        out = os.path.join(args.outdir, f"ssim_{key}.png")
        Image.fromarray((ours * 255).astype(np.uint8)).save(out)
        print(f"{key}: SSIM={score:.4f}  mean|diff| lit={mad:.4f} "
              f"({w}x{h}, {args.frames} frames)  saved {out}")


if __name__ == "__main__":
    main()
