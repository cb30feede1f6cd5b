"""Measure the cull engine on the FlightHelmet scene (96k tris) on TPU.

Compares primary-ray cost at 720p: tile-cull engine vs the lockstep BVH,
plus per-phase isolation (cull phase vs Pallas intersect) with the
scan-in-jit evolving-input methodology from PERF.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from examples.scene import build_scene
from hikari_tpu.ops.trace_cull import cull_trace, cull_phase, _prep_rays
from hikari_tpu.ops.trace import traverse_bvh
from hikari_tpu.camera import Camera
from hikari_tpu.ops.prepass import camera_rays


def bench(fn, *args, iters=10, **kw):  # long kernels: keep iters*time < ~30s (tunnel exec timeout)
    @jax.jit
    def run(ro, rest):
        def step(carry, _):
            ro = carry
            out = fn(ro, *rest)
            return ro + 1e-4 + 1e-7 * jnp.mean(
                jnp.clip(out, -1e3, 1e3)), out.reshape(-1)[0]
        _, outs = jax.lax.scan(step, ro, None, length=iters)
        return outs
    o = run(args[0], args[1:])
    o.block_until_ready()
    t0 = time.perf_counter()
    o = run(args[0], args[1:])
    o.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    sc = build_scene()
    gpu = sc.compile()
    scene = gpu.as_pytree()
    print("tris:", gpu.num_triangles,
          "clusters:", scene["cl_aabb"].shape[0],
          "packed rows:", scene["cl_tri_packed"].shape)

    h, w = 720, 1280
    cam = Camera.from_look_at((2.0, 2.0, 6.0), (0.0, 1.0, 0.0),
                              width=w, height=h)
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    ro, rd = camera_rays(view, (h, w), (0.0, 0.0))
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    n = h * w
    mt = jnp.full((n,), 3.4e38, jnp.float32)

    # hit ratio sanity
    out = cull_trace(scene, ro, rd, mt, mode="hit", shape2d=(h, w))
    hits = (np.asarray(out["instance"]) >= 0).mean()
    print(f"hit ratio: {hits:.3f}")

    # cull stats
    ray9, ro_t, rd_t, mt_t, _ = _prep_rays(ro, rd, mt, None, None, (h, w))
    lists, counts, _enter, _ea = cull_phase(scene["cl_aabb"], ro_t, rd_t, mt_t)
    c = np.asarray(counts)
    print(f"clusters/tile: mean {c[c>=0].mean():.1f} max {c.max()} "
          f"overflow tiles {(c<0).sum()}/{len(c)}")

    # full trace timing (phase1 + phase2, with_info contract)
    def full(ro):
        return cull_trace(scene, ro, rd, mt, mode="full",
                          shape2d=(h, w))["t"]
    dt = bench(full, ro)
    print(f"cull full: {dt*1e3:.2f} ms  ({dt/n*1e9:.1f} ns/ray)")

    def hitf(ro):
        return cull_trace(scene, ro, rd, mt, mode="hit", shape2d=(h, w))["t"]
    dt = bench(hitf, ro)
    print(f"cull hit:  {dt*1e3:.2f} ms  ({dt/n*1e9:.1f} ns/ray)")

    def shad(ro):
        return cull_trace(scene, ro, rd, mt, mode="shadow",
                          shape2d=(h, w))["t"]
    dt = bench(shad, ro)
    print(f"cull shadow: {dt*1e3:.2f} ms  ({dt/n*1e9:.1f} ns/ray)")

    def cullonly(ro):
        ray9, ro_t, rd_t, mt_t, _ = _prep_rays(ro, rd, mt, None, None, (h, w))
        lists, counts, _enter, _ea = cull_phase(scene["cl_aabb"], ro_t, rd_t, mt_t)
        return counts.astype(jnp.float32)
    dt = bench(cullonly, ro)
    print(f"cull phase only: {dt*1e3:.2f} ms")

    # incoherent rays (bounce-like): random directions from visible points
    rng = np.random.default_rng(0)
    rd2 = rng.normal(size=(n, 3)).astype(np.float32)
    rd2 /= np.linalg.norm(rd2, axis=1, keepdims=True)
    rd2 = jnp.asarray(rd2)
    def incoh(ro):
        return cull_trace(scene, ro, rd2, mt, mode="hit",
                          shape2d=(h, w), incoherent=True)["t"]
    dt = bench(incoh, ro, iters=2)
    print(f"cull incoherent: {dt*1e3:.2f} ms  ({dt/n*1e9:.1f} ns/ray)")

    # lockstep BVH baseline at reduced res (would take ~minutes at 720p)
    hs, ws = 180, 320
    ros = ro.reshape(h, w, 3)[::4, ::4].reshape(-1, 3)
    rds = rd.reshape(h, w, 3)[::4, ::4].reshape(-1, 3)
    mts = jnp.full((hs * ws,), 3.4e38, jnp.float32)
    def bvh(ro_):
        return traverse_bvh(scene, ro_, rds, mts)["t"]
    dt = bench(bvh, ros, iters=3)
    print(f"lockstep bvh @320x180: {dt*1e3:.2f} ms "
          f"({dt/(hs*ws)*1e9:.1f} ns/ray)")


if __name__ == "__main__":
    main()
