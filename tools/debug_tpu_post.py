"""On-chip isolation of the post chain: render minimal at a small size
under several configs (raw / taa-only / smaa-only / default) and save each
PNG. Bisects Mosaic-vs-interpret issues in the banded warp path.

Usage: python tools/debug_tpu_post.py [cfg ...]   (default: all)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("DBG_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from examples.minimal import build_scene
from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale

CFGS = {
    "raw": dataclasses.replace(HikariSettings(), temporal_reuse=False,
                               emissive_spatial_reuse=False,
                               indirect_spatial_reuse=False,
                               denoise=False, taa=Taa.NONE,
                               upscale=Upscale.none()),
    "denoised": dataclasses.replace(HikariSettings(), temporal_reuse=False,
                                    emissive_spatial_reuse=False,
                                    indirect_spatial_reuse=False,
                                    taa=Taa.NONE, upscale=Upscale.none()),
    "taa": dataclasses.replace(HikariSettings(), temporal_reuse=False,
                               emissive_spatial_reuse=False,
                               indirect_spatial_reuse=False,
                               taa=Taa.JASMINE, upscale=Upscale.none()),
    "smaa": dataclasses.replace(HikariSettings(), temporal_reuse=False,
                                emissive_spatial_reuse=False,
                                indirect_spatial_reuse=False,
                                taa=Taa.NONE,
                                upscale=Upscale.smaa_tu4x(2.0)),
    "smaa_taa": dataclasses.replace(HikariSettings(), temporal_reuse=False,
                                    emissive_spatial_reuse=False,
                                    indirect_spatial_reuse=False,
                                    taa=Taa.JASMINE,
                                    upscale=Upscale.smaa_tu4x(2.0)),
    "default": HikariSettings(),
}


def main():
    names = sys.argv[1:] or list(CFGS)
    scene = build_scene()
    for name in names:
        s = CFGS[name]
        cam = Camera.from_look_at((-4, 3, 6), (0, 0.5, 0),
                                  width=320, height=180)
        r = Renderer(scene, cam, s)
        t0 = time.perf_counter()
        img = None
        for f in range(6):
            img = r.render_frame()
        jax.block_until_ready(img)
        a = np.asarray(img)
        print(f"{name}: {time.perf_counter() - t0:.1f}s  "
              f"range [{np.nanmin(a):.3f},{np.nanmax(a):.3f}] "
              f"nan={np.isnan(a).sum()}")
        from PIL import Image

        sfx = "_cpu" if os.environ.get("DBG_CPU") == "1" else ""
        Image.fromarray(
            (np.clip(a[..., :3], 0, 1) * 255).astype(np.uint8)).save(
            f"/tmp/dbg_{name}{sfx}.png")
        np.save(f"/tmp/dbg_{name}{sfx}.npy", a)


if __name__ == "__main__":
    main()
