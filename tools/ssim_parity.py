"""SSIM parity against the reference's shipped screenshots
(/root/reference/assets/screenshots/*.png, from the wgpu renderer).

Renders the matching example scene at the screenshot's resolution with the
reference-default settings and reports SSIM + mean-abs-diff over the lit
region. These are *different renderers* (sample sequences, blue noise,
denoiser precision all differ), so the score is a structural-parity
indicator, not a bit-match: >0.8 means same geometry/lighting/exposure.

Usage: python tools/ssim_parity.py [cornell] [--frames 64]
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


def render_cornell(size, frames, post=True, bounces=None):
    from examples.cornell import build_scene
    from hikari_tpu import Camera, HikariSettings, Renderer

    settings = dataclasses.replace(
        HikariSettings(), clear_color=(0.0, 0.0, 0.0, 1.0))
    if not post:
        from hikari_tpu.config import Taa, Upscale
        settings = dataclasses.replace(settings, taa=Taa.NONE,
                                       upscale=Upscale.none())
    if bounces is not None:
        settings = dataclasses.replace(settings, indirect_bounces=bounces)
    cam = Camera.from_look_at(width=size[0], height=size[1],
                              eye=(0.0, 1.0, 4.0), target=(0.0, 1.0, 0.0))
    r = Renderer(build_scene(), cam, settings)
    img = None
    for _ in range(frames):
        img = r.render_frame()
    return np.asarray(img)[..., :3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="cornell",
                    choices=["cornell"])
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--out", default="/tmp/ssim_parity.png")
    ap.add_argument("--no-post", action="store_true",
                    help="disable TAA/upscale to isolate the lighting")
    ap.add_argument("--bounces", type=int, default=None)
    args = ap.parse_args()

    from hikari_tpu.utils.image import ssim

    ref = np.asarray(Image.open(
        os.path.join(SCREENSHOTS, f"{args.scene}.png")).convert("RGB"),
        np.float32) / 255.0
    h, w = ref.shape[:2]
    ours = np.clip(render_cornell((w, h), args.frames, post=not args.no_post,
                                  bounces=args.bounces), 0.0, 1.0)

    score = ssim(ours, ref)
    # lit region = where the reference isn't the black surround
    lit = ref.max(-1) > 0.02
    mad = float(np.abs(ours - ref)[lit].mean())
    Image.fromarray((ours * 255).astype(np.uint8)).save(args.out)
    print(f"{args.scene}: SSIM={score:.4f}  mean|diff| over lit region="
          f"{mad:.4f}  ({w}x{h}, {args.frames} frames)  saved {args.out}")


if __name__ == "__main__":
    main()
