"""Spatial-tap scramble A/B (VERDICT r2 item 6, light.wgsl:1566-1572).

The reference scrambles the spatial-reuse Fibonacci spiral per pixel; the
repo's default rotates it once per frame (shared across pixels), with a
blue-noise 4-rotation variant behind HikariSettings.spatial_tap_scramble.
This tool renders cornell + simple with spatial reuse on, scramble
OFF vs ON, and reports:

  * flicker: mean |frame_t - frame_{t-1}| over the last 8 of 24 frames
    (temporal stability of the converged image);
  * noise: mean total variation of the final frame (structured-artifact
    proxy: correlated taps show up as coherent low-frequency blotches
    that raise TV less than they raise flicker);
  * SSIM between the two finals (how much the default choice matters).

Frame-cost comparison runs on the TPU via
  BENCH_SCRAMBLE=1 python bench.py  (vs default).
CPU run: python tools/scramble_ab.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale
from hikari_tpu.utils.image import ssim


def tv(img):
    d = np.asarray(img, np.float32)[..., :3]
    return float(np.abs(np.diff(d, axis=0)).mean()
                 + np.abs(np.diff(d, axis=1)).mean())


def run(build, cam_kw, scramble, frames=24):
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=True,
        indirect_spatial_reuse=True, denoise=True, taa=Taa.NONE,
        upscale=Upscale.none(), checkerboard_lighting=False,
        spatial_tap_scramble=scramble)
    cam = Camera.from_look_at(width=256, height=192, **cam_kw)
    r = Renderer(build(), cam, settings)
    tail = []
    for i in range(frames):
        img = np.asarray(r.render_frame())
        if i >= frames - 8:
            tail.append(np.clip(img[..., :3], 0, 1))
    flick = float(np.mean([np.abs(tail[i + 1] - tail[i]).mean()
                           for i in range(len(tail) - 1)]))
    return tail[-1], flick


def main():
    from examples.cornell import build_scene as cornell
    from examples.simple import build_scene as simple

    for name, build, cam_kw in (
            ("cornell", cornell, dict(eye=(0.0, 1.0, 3.2),
                                      target=(0, 1, 0))),
            ("simple", simple, dict(eye=(-10.0, 2.5, 20.0),
                                    target=(0, 0, 0)))):
        img_off, fl_off = run(build, cam_kw, False)
        img_on, fl_on = run(build, cam_kw, True)
        s = ssim(img_off, img_on)
        print(f"== {name} (spatial reuse on, 24 frames, 256x192) ==")
        print(f"  scramble OFF: flicker {fl_off:.5f}  tv {tv(img_off):.4f}")
        print(f"  scramble ON : flicker {fl_on:.5f}  tv {tv(img_on):.4f}")
        print(f"  SSIM(off, on) = {s:.4f}")


if __name__ == "__main__":
    main()
