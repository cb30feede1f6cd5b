"""City-only on-chip timing (same measurement as bench.py's city block).

Usage: python tools/bench_city.py [width height]
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from examples.city import build_scene as build_city
from examples.city import rotate_sphere
from hikari_tpu import Camera, HikariSettings, Renderer, Upscale


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    city_settings = dataclasses.replace(
        HikariSettings(), upscale=Upscale.smaa_tu4x(2.0))
    cam = Camera.from_look_at((0.0, 2.5, 20.0), (0, 0, 0), width=width,
                              height=height, hdr=True)
    city_scene = build_city()
    rc = Renderer(city_scene, cam, city_settings)
    rc.update_scene(rotate_sphere(city_scene, 0.001), fast=True)
    jax.block_until_ready(rc.render_frame())
    refit_ms, total = [], []
    for rep in range(3):
        t0 = time.perf_counter()
        for f in range(8):
            ta = time.perf_counter()
            rc.update_scene(rotate_sphere(city_scene, 0.2 * (f + 1) / 60.0),
                            fast=True)
            refit_ms.append((time.perf_counter() - ta) * 1e3)
            img = rc.render_frame()
        jax.block_until_ready(img)
        total.append((time.perf_counter() - t0) / 8)
    print(f"city frame: {min(total) * 1e3:.1f} ms  "
          f"refit median {np.median(refit_ms):.2f} ms")


if __name__ == "__main__":
    main()
