"""Measure the banded texture sampler's window contract on real scenes.

For each textured example scene, renders the primary-ray G-buffer, computes
the per-pixel atlas texel coordinates the primary surface samples, and
reports (a) the fraction of textured pixels whose bilinear footprint lies
fully inside their group's window (the exact-result envelope of
ops/texture_pallas.py) and (b) the actual max/mean |pallas - gather| error
over the frame. Usage: python tools/probe_texture_window.py [scene ...]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hikari_tpu import Camera, HikariSettings, Renderer
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.shading import sample_atlas
from hikari_tpu.ops.texture_pallas import BLK, GROUP, WCB, WR, sample_atlas_coherent
from hikari_tpu.utils.math import table_gather


def probe(name, scene, cam):
    r = Renderer(scene, cam, HikariSettings())
    view = r._views()
    gbuf = prepass(r.scene_dev, r.tracer, view, view, jnp.int32(0),
                   r.full_size, r.settings.taa, r.settings.upscale.mode)
    uv = gbuf["velocity_uv"][..., 2:4]
    material = gbuf["instance_material"][..., 1].astype(jnp.int32)
    row = table_gather(r.scene_dev["mat_packed"], jnp.maximum(material, 0))
    tids = jnp.round(row[..., 11:15]).astype(jnp.int32)

    for slot, label in enumerate(("base_color", "emissive", "metal_rough",
                                  "occlusion")):
        tid = tids[..., slot]
        n_tex = int(jnp.sum(tid >= 0))
        if n_tex == 0:
            continue
        rect = table_gather(r.scene_dev["tex_rect"],
                            jnp.maximum(tid, 0)).astype(jnp.float32)
        u = uv[..., 0] - jnp.floor(uv[..., 0])
        v = uv[..., 1] - jnp.floor(uv[..., 1])
        fx = rect[..., 0] + u * jnp.maximum(rect[..., 2], 1.0) - 0.5
        fy = rect[..., 1] + v * jnp.maximum(rect[..., 3], 1.0) - 0.5
        h, w = tid.shape
        hh = -(-h // GROUP) * GROUP
        ww = -(-w // GROUP) * GROUP
        pad = ((0, hh - h), (0, ww - w))
        fyp = jnp.pad(fy, pad, mode="edge")
        fxp = jnp.pad(fx, pad, mode="edge")
        vp = jnp.pad(tid >= 0, pad, mode="edge")
        gy, gx = hh // GROUP, ww // GROUP
        fy_g = fyp.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
        fx_g = fxp.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
        v_g = vp.reshape(gy, GROUP, gx, GROUP).transpose(0, 2, 1, 3)
        nv = jnp.maximum(v_g.sum(axis=(2, 3)), 1)
        ym = (fy_g * v_g).sum(axis=(2, 3)) / nv
        xm = (fx_g * v_g).sum(axis=(2, 3)) / nv
        ly = fy_g - (jnp.round((ym - WR / 2) / 8) * 8)[:, :, None, None]
        lx = fx_g - (jnp.round((xm - WCB * BLK / 2) / BLK)
                     * BLK)[:, :, None, None]
        in_w = ((ly >= 0) & (ly <= WR - 1)
                & (lx >= 0) & (lx <= WCB * BLK - 1) & v_g)
        frac = float(jnp.sum(in_w)) / max(int(jnp.sum(v_g)), 1)

        ref = sample_atlas(r.scene_dev, tid, uv)
        out = sample_atlas_coherent(r.scene_dev, tid, uv)
        err = jnp.abs(out - ref)
        print(f"{name:8s} {label:12s} textured px {n_tex:8d}  "
              f"in-window {100 * frac:6.2f}%  "
              f"max|err| {float(err.max()):.4f}  "
              f"mean|err| {float(err.mean()):.5f}")


def main():
    names = sys.argv[1:] or ["simple"]
    for name in names:
        if name == "simple":
            from examples.simple import build_scene

            cam = Camera.from_look_at((0.0, 2.5, 9.0), (0.0, 1.0, 0.0),
                                      width=1920, height=1080)
        elif name == "scene":
            from examples.scene import build_scene

            cam = Camera.from_look_at((6.0, 4.0, 8.0), (0.0, 1.0, 0.0),
                                      width=1280, height=720)
        elif name == "city":
            from examples.city import build_scene

            cam = Camera.from_look_at((0.0, 2.5, 20.0), (0.0, 0.0, 0.0),
                                      width=1920, height=1080, hdr=True)
        else:
            raise SystemExit(f"unknown scene {name}")
        probe(name, build_scene(), cam)


if __name__ == "__main__":
    main()
