"""Shared CLI driver for the example scenes (the analog of the reference's
5 example binaries, examples/*.rs)."""

from __future__ import annotations

import argparse
import time

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale


def parse_args(description: str, width=1280, height=720):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--width", type=int, default=width)
    p.add_argument("--height", type=int, default=height)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--denoise", action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--taa", choices=["jasmine", "none"], default=None)
    p.add_argument("--upscale", choices=["smaa2", "smaa1", "fsr", "none"], default=None)
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--temporal-reuse", action=argparse.BooleanOptionalAction, default=None)
    p.add_argument("--dump-passes", type=str, default=None,
                   help="directory to dump per-pass dissection images")
    return p.parse_args()


def apply_overrides(settings: HikariSettings, args) -> HikariSettings:
    import dataclasses

    kw = {}
    if args.denoise is not None:
        kw["denoise"] = args.denoise
    if args.taa is not None:
        kw["taa"] = Taa.JASMINE if args.taa == "jasmine" else Taa.NONE
    if args.upscale is not None:
        kw["upscale"] = {
            "smaa2": Upscale.smaa_tu4x(2.0),
            "smaa1": Upscale.smaa_tu4x(1.0),
            "fsr": Upscale.fsr1(2.0),
            "none": Upscale.none(),
        }[args.upscale]
    if args.bounces is not None:
        kw["indirect_bounces"] = args.bounces
    if args.temporal_reuse is not None:
        kw["temporal_reuse"] = args.temporal_reuse
    return dataclasses.replace(settings, **kw)


def run(scene, camera_kwargs, settings, args, name: str):
    cam = Camera.from_look_at(width=args.width, height=args.height,
                              **camera_kwargs)
    settings = apply_overrides(settings, args)
    r = Renderer(scene, cam, settings)

    t0 = time.perf_counter()
    img = r.render_frame()
    img.block_until_ready()
    compile_s = time.perf_counter() - t0
    print(f"[{name}] first frame (compile+run): {compile_s:.1f}s")

    t0 = time.perf_counter()
    for _ in range(max(args.frames - 1, 0)):
        img = r.render_frame()
    img.block_until_ready()
    n = max(args.frames - 1, 1)
    dt = (time.perf_counter() - t0) / n
    print(f"[{name}] steady-state: {dt * 1e3:.2f} ms/frame "
          f"({args.width}x{args.height}, {n} frames)")

    out = args.out or f"/tmp/{name}.png"
    r.save_png(out, np.asarray(img))
    print(f"[{name}] saved {out}")

    if args.dump_passes:
        r.render_dissection(args.dump_passes)
        print(f"[{name}] per-pass dissection dumped to {args.dump_passes}")
    return r, img
