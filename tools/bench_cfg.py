"""Quick on-chip timing of one or more named settings configs.

Usage: python tools/bench_cfg.py smaa2 default reuse spatial ckb_reuse
(any subset; no args = smaa2 + default). Same measurement discipline as
bench.py (best-of-reps, warm compile excluded).
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from examples.cornell import build_scene  # noqa: E402
from hikari_tpu import (  # noqa: E402
    Camera,
    HikariSettings,
    Renderer,
    Taa,
    Upscale,
)


def configs():
    flagship = dataclasses.replace(
        HikariSettings(),
        temporal_reuse=False, denoise=True, indirect_bounces=1,
        taa=Taa.NONE, upscale=Upscale.none(),
        emissive_spatial_reuse=False, indirect_spatial_reuse=False,
        checkerboard_lighting=False)
    return {
        "flagship": flagship,
        "ckb": dataclasses.replace(flagship, checkerboard_lighting=True),
        "smaa2": dataclasses.replace(flagship, taa=Taa.JASMINE,
                                     upscale=Upscale.smaa_tu4x(2.0)),
        "default": HikariSettings(),
        "reuse": dataclasses.replace(flagship, temporal_reuse=True),
        "spatial": dataclasses.replace(flagship, temporal_reuse=True,
                                       emissive_spatial_reuse=True,
                                       indirect_spatial_reuse=True),
        "ckb_reuse": dataclasses.replace(flagship, temporal_reuse=True,
                                         checkerboard_lighting=True),
    }


def main():
    names = sys.argv[1:] or ["smaa2", "default"]
    scene = build_scene()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=1920, height=1080)
    cfgs = configs()
    for name in names:
        r = Renderer(scene, cam, cfgs[name])
        jax.block_until_ready(r.render_frame())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                img = r.render_frame()
            jax.block_until_ready(img)
            best = min(best, (time.perf_counter() - t0) / 15)
        print(f"{name}: {best * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
