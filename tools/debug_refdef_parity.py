"""Repro for the sharded reference-default parity failure (frame 3):
print per-frame max image delta + row/col histogram of the divergence.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/debug_refdef_parity.py [frames]
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_fl = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _fl:
    os.environ["XLA_FLAGS"] = (
        _fl + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize forces jax_platforms="axon,cpu" over the env var
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from examples.minimal import build_scene
from hikari_tpu import Camera, HikariSettings, Taa, Upscale
from hikari_tpu.config import make_frame_uniform
from hikari_tpu.frame import (
    build_render_frame,
    init_carry,
    scaled_size,
    spatial_fused_active,
    _post_size,
)
from hikari_tpu.ops.noise import noise_constant
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.parallel.mesh import make_mesh, pixel_sharding, shard_frame


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 32, 64
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=True, emissive_spatial_reuse=True,
        indirect_spatial_reuse=True, denoise=True, taa=Taa.JASMINE,
        upscale=Upscale.smaa_tu4x(2.0), checkerboard_lighting=False)

    gpu = build_scene().compile()
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=w, height=h)
    tracer = make_tracer(gpu.num_triangles)
    if "--stub-kind" in sys.argv:
        tracer.kind = "brute_force_pallas"
    print("tracer.kind =", tracer.kind)
    fn = build_render_frame(settings, (h, w), tracer, no_texture=True,
                            num_emissives=gpu.num_emissives,
                            has_sun=gpu.has_sun)
    scene = gpu.as_pytree()
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    noise = noise_constant()
    carry1 = init_carry((h, w), settings,
                        spatial_planes=spatial_fused_active(
                            scene, settings, tracer, True,
                            gpu.num_emissives, gpu.has_sun, (h, w)))

    mesh = make_mesh(8)
    render_size = scaled_size((h, w), settings.upscale_ratio)
    rows = {h, render_size[0], _post_size(settings, render_size)[0]}

    jfn, args = shard_frame(fn, mesh, scene, view,
                            make_frame_uniform(settings, 1), noise, carry1,
                            rows)
    scene_s, view_s, _, noise_s, carry8 = args
    carry_sh = pixel_sharding(mesh, carry1, rows)
    fn1 = jax.jit(fn)
    from hikari_tpu.ops import reservoir as rsv

    for i in range(1, 1 + frames):
        frame = make_frame_uniform(settings, i)
        img1, _, carry1 = fn1(scene, view, frame, noise, carry1)
        carry8 = jax.tree.map(jax.device_put, carry8, carry_sh)
        img8, _, carry8 = jfn(scene_s, view_s, frame, noise_s, carry8)
        a, b = np.asarray(img1), np.asarray(img8)
        d = np.abs(a - b).max(axis=(1, 2)) if a.ndim == 3 else np.abs(a - b)
        print(f"frame {i}: img max delta {np.abs(a - b).max():.3e} "
              f"rows>{1e-4}: {np.nonzero(d > 1e-4)[0].tolist()[:20]}")
        # carry deltas (leaf-wise over the pytree)
        flat1 = jax.tree_util.tree_flatten_with_path(carry1)[0]
        flat8 = jax.tree_util.tree_flatten_with_path(
            jax.device_get(carry8))[0]
        for (p1, v1), (_, v8) in zip(flat1, flat8):
            name = jax.tree_util.keystr(p1)
            a1 = np.asarray(v1, np.float32)
            a8 = np.asarray(v8, np.float32)
            if a1.shape != a8.shape:
                print(f"  {name}: SHAPE {a1.shape} vs {a8.shape}")
                continue
            dd = np.abs(a1 - a8).max()
            if dd > 1e-4:
                rows_bad = []
                if a1.ndim >= 2:
                    ax = tuple(range(1, a1.ndim))
                    rows_bad = np.nonzero(
                        np.abs(a1 - a8).max(axis=ax) > 1e-4)[0].tolist()[:16]
                print(f"  carry{name} max delta {dd:.3e} rows {rows_bad}")


if __name__ == "__main__":
    main()
