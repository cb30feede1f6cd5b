"""Generate golden images for the scene-level regression tests.

Mirrors the reference's use of committed screenshots as visual regression
anchors (assets/screenshots/*). Run on CPU for determinism:
    python tools/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale
from hikari_tpu.utils.image import save_png

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

RAW = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                          upscale=Upscale.none())
DENOISED = dataclasses.replace(HikariSettings(), taa=Taa.NONE,
                               upscale=Upscale.none())
# full reuse: temporal + BOTH spatial-reuse tracks + denoise (the fused
# temporal/spatial Pallas kernels' u32 bit-paths all engage on chip);
# 24 frames so the reservoirs converge through several validation cycles
REUSE = dataclasses.replace(HikariSettings(), taa=Taa.NONE,
                            upscale=Upscale.none(), temporal_reuse=True,
                            emissive_spatial_reuse=True,
                            indirect_spatial_reuse=True)


def configs():
    from examples.cornell import build_scene as cornell
    from examples.minimal import build_scene as minimal
    from examples.simple import build_scene as simple

    return {
        "minimal_raw": (minimal, dict(eye=(-2, 2.5, 5), target=(0, 0, 0)), RAW, 12),
        "cornell_raw": (cornell, dict(eye=(0, 1, 4), target=(0, 1, 0)), RAW, 12),
        "cornell_denoised": (cornell, dict(eye=(0, 1, 4), target=(0, 1, 0)),
                             DENOISED, 12),
        "simple_raw": (simple, dict(eye=(-10, 2.5, 20), target=(0, 0, 0)), RAW, 12),
        "cornell_reuse": (cornell, dict(eye=(0, 1, 4), target=(0, 1, 0)),
                          REUSE, 24),
    }


def render_config(name, size=(96, 160)):
    build, cam_kw, settings, frames = configs()[name]
    cam = Camera.from_look_at(width=size[1], height=size[0], **cam_kw)
    r = Renderer(build(), cam, settings)
    return r.render(frames=frames)


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in configs():
        img = render_config(name)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                            img=img.astype(np.float16))
        save_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("golden:", name, img.shape)
