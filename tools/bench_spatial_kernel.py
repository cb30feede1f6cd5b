"""Standalone on-chip timing of the fused spatial-reuse kernel (both
channels) at 1080p with synthetic inputs — isolates kernel cost from the
frame (A/B for winner-plane epilogue work).

Usage: python tools/bench_spatial_kernel.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from examples.cornell import build_scene
from hikari_tpu.camera import Camera
from hikari_tpu.config import HikariSettings, make_frame_uniform
from hikari_tpu.ops.spatial_fused import spatial_fused


def main():
    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    gpu = build_scene().compile()
    scene = gpu.as_pytree()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=w, height=h)
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    frame = make_frame_uniform(HikariSettings(), 3)

    g = {
        "position": jnp.asarray(
            rng.uniform(-3, 3, (h, w, 4)).astype(np.float32)),
        "normal": jnp.asarray(
            rng.normal(size=(h, w, 3)).astype(np.float32)),
        "instance_material": jnp.asarray(
            np.stack([rng.integers(0, 5, (h, w)),
                      rng.integers(0, 5, (h, w))], -1).astype(np.float32)),
        "velocity_uv": jnp.zeros((h, w, 4), jnp.float32),
    }
    tp = jnp.asarray(rng.uniform(0, 1, (h, 16, w)).astype(np.float32))
    pp = jnp.asarray(rng.uniform(0, 1, (h, 16, w)).astype(np.float32))

    ITERS = 10
    for emissive in (True, False):
        def step(carry, _, em=emissive):
            t, p = carry
            out = spatial_fused(scene, g, view, frame, t, p,
                                emissive_lit=em, render_size=(h, w))
            # feed the output back so every iteration is a fresh dispatch
            return (out["spatial_planes"], t), None

        @jax.jit
        def run(t, p, em=emissive):
            (t2, p2), _ = jax.lax.scan(step, (t, p), None, length=ITERS)
            return t2

        out = run(tp, pp)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(tp, pp))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        name = "emissive(8 taps)" if emissive else "indirect(16 taps)"
        print(f"{name}: {best * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
