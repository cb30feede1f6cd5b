"""Realistic divergent-ray probe: surface origins from a real primary
trace + cosine-hemisphere bounce directions (the honest incoherent set —
the random-direction probe's shared origin makes packets unrealistically
tight; round-4 measured 204 vs 817 ns/ray between the two).

Reports the cull-phase statistics that decide the engine design:
survivors per packet (mean/p50/p90/max), overflow fraction (packets whose
cluster list exceeds CAP and fall into full sweeps), and on-chip timing.

Usage: python tools/probe_cull_realistic.py [scene|city]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.camera import Camera
from hikari_tpu.ops.prepass import camera_rays
from hikari_tpu.ops.trace_cull import (
    CAP,
    _octant_order,
    _prep_rays,
    cull_phase,
    cull_trace,
)


def bench(fn, *args, iters=4):
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


def cosine_dirs(n3, rng):
    """Cosine-hemisphere directions around per-ray normals n3 [N,3]."""
    u1 = rng.uniform(size=len(n3)).astype(np.float32)
    u2 = rng.uniform(size=len(n3)).astype(np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx, ly = r * np.cos(phi), r * np.sin(phi)
    lz = np.sqrt(np.maximum(0.0, 1.0 - u1))
    up = np.where(np.abs(n3[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    t1 = np.cross(up, n3)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-9)
    t2 = np.cross(n3, t1)
    return (t1 * lx[:, None] + t2 * ly[:, None]
            + n3 * lz[:, None]).astype(np.float32)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "scene"
    if which == "city":
        from examples.city import build_scene

        sc = build_scene()
        cam = Camera.from_look_at((0.0, 2.5, 20.0), (0, 0, 0),
                                  width=1280, height=720)
    else:
        from examples.scene import build_scene

        sc = build_scene()
        cam = Camera.from_look_at((2.0, 2.0, 6.0), (0.0, 1.0, 0.0),
                                  width=1280, height=720)
    gpu = sc.compile()
    scene = gpu.as_pytree()
    h, w = 720, 1280
    n = h * w
    print(f"{which}: tris {gpu.num_triangles} "
          f"clusters {scene['cl_aabb'].shape[0]}")

    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    ro, rd = camera_rays(view, (h, w), (0.0, 0.0))
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    mt = jnp.full((n,), 3.4e38, jnp.float32)
    pri = cull_trace(scene, ro, rd, mt, mode="full", shape2d=(h, w))
    hit = np.asarray(pri["instance"]) >= 0
    print(f"primary hit ratio {hit.mean():.3f}")

    t_np = np.asarray(pri["t"])
    nrm = np.asarray(pri["normal"])
    ro_np = np.asarray(ro)
    rd_np = np.asarray(rd)
    org = ro_np + rd_np * np.where(hit, t_np, 1.0)[:, None]
    nn = np.where(np.linalg.norm(nrm, axis=1, keepdims=True) > 1e-6, nrm,
                  [0, 0, 1.0])
    nn /= np.maximum(np.linalg.norm(nn, axis=1, keepdims=True), 1e-9)
    rng = np.random.default_rng(3)
    bdir = cosine_dirs(nn, rng)
    org = org + nn * 1e-3

    ro2 = jnp.asarray(org)
    rd2 = jnp.asarray(bdir)

    # cull statistics on the SORTED incoherent packets (replicates
    # cull_trace's incoherent path: cone+Morton sort, scene-box max_t)
    sb_min = jnp.min(scene["cl_aabb"][:, 0:3], axis=0)
    sb_max = jnp.max(scene["cl_aabb"][:, 3:6], axis=0)
    order, _ = _octant_order(rd2, n, None, None, ro=ro2,
                             sb_min=sb_min, sb_max=sb_max)
    ro_s = jnp.take(ro2, order, axis=0)
    rd_s = jnp.take(rd2, order, axis=0)
    safe = jnp.where(jnp.abs(rd_s) < 1e-20, 1e-20, rd_s)
    t1 = (sb_min - ro_s) / safe
    t2 = (sb_max - ro_s) / safe
    t_ex = jnp.min(jnp.maximum(t1, t2), axis=-1)
    mt_s = jnp.minimum(mt, jnp.maximum(t_ex * 1.0001 + 1e-4, 0.0))
    ray9, ro_t, rd_t, mt_t, _ = _prep_rays(ro_s, rd_s, mt_s, None, None,
                                           None)
    lists, counts, enter, key = cull_phase(scene["cl_aabb"], ro_t, rd_t,
                                           mt_t)
    c = np.asarray(counts)
    surv = np.where(c < 0, np.asarray((key < 3.4e38).sum(axis=1)), c)
    print(f"survivors/packet: mean {surv.mean():.1f} p50 "
          f"{np.percentile(surv, 50):.0f} p90 {np.percentile(surv, 90):.0f}"
          f" max {surv.max()}  overflow(> {CAP}): "
          f"{(c < 0).mean() * 100:.1f}% of {len(c)} packets")

    def incoh(ro_):
        return cull_trace(scene, ro_, rd2, mt, mode="hit",
                          incoherent=True)["t"]

    dt = bench(incoh, ro2, iters=2)
    print(f"realistic bounce trace: {dt * 1e3:.1f} ms "
          f"({dt / n * 1e9:.0f} ns/ray)")


if __name__ == "__main__":
    main()
