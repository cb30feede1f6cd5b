"""Engine crossover study: 8-packed brute force vs tile-cull across
triangle counts (VERDICT item 4 — the measured decision for make_tracer's
brute_force_max threshold).

The PERF.md MXU all-pairs design assumed the VPU brute force ran at
~13 ns/pair; the 8-packed kernel's measured ~0.05 ns/pair and the cull
engine's per-ray costs change the conclusion — this probe provides the
real crossover.

Usage: python tools/probe_crossover.py [T ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hikari_tpu import Scene, StandardMaterial  # noqa: E402
from hikari_tpu.models import mesh as shapes  # noqa: E402
from hikari_tpu.models.clusters import build_cluster_tables  # noqa: E402
from hikari_tpu.models.scene import make_transform  # noqa: E402
from hikari_tpu.ops.trace_cull import cull_trace  # noqa: E402
from hikari_tpu.ops.trace_pallas import pallas_brute_force  # noqa: E402

W, H = 1280, 720
STEPS = 10


def build(num_tris):
    sc = Scene()
    cube = sc.add_mesh(shapes.cube(1.0))
    m = sc.add_material(StandardMaterial.from_color(0.7, 0.7, 0.7))
    n_inst = max(1, num_tris // 12)
    rng = np.random.default_rng(0)
    for _ in range(n_inst):
        x, z = rng.uniform(-20, 20, 2)
        y = rng.uniform(0, 6)
        s = rng.uniform(0.5, 2.0)
        sc.spawn(cube, m, make_transform((x, y, z), scale=(s, s, s)))
    gpu = sc.compile()
    a = dict(gpu.arrays)
    if "cl_tri_packed" not in a:
        a.update(build_cluster_tables(gpu.bvh, a["tri_pos_flat"],
                                      a["tri_attr"]))
    scene = {k: jnp.asarray(v) for k, v in a.items()}
    return scene, gpu.num_triangles


def rays():
    rng = np.random.default_rng(1)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = (xs + 0.5) / W * 2 - 1
    v = (ys + 0.5) / H * 2 - 1
    d = np.stack([u * 1.2, v * 0.675, -np.ones_like(u)], -1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([0.0, 3.0, 30.0]), d.shape)
    return (jnp.asarray(o.astype(np.float32)),
            jnp.asarray(d.astype(np.float32)))


def bench(fn, ro, rd, name):
    n = ro.shape[0]
    maxt = jnp.full((n,), 3.0e38)
    excl = jnp.full((n,), -1, jnp.int32)
    incl = jnp.full((n,), -1, jnp.int32)

    @jax.jit
    def run(ro, rd):
        def body(c, i):
            h = fn(ro + c, rd, maxt, excl, incl)
            return c + 1e-3, jnp.sum(jnp.minimum(h["t"][::1111], 100.0))
        return jax.lax.scan(body, 0.0, jnp.arange(STEPS))[1]

    s = jax.block_until_ready(run(ro, rd))
    assert len(set(np.asarray(s).tolist())) > 1, "identical!"
    t0 = time.perf_counter()
    jax.block_until_ready(run(ro, rd))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"  {name}: {dt*1e3:7.2f} ms  ({dt/n*1e9:6.1f} ns/ray)")
    return dt


def main():
    ts = [int(a) for a in sys.argv[1:]] or [240, 504, 1032, 2052, 4092, 8196]
    ro, rd = rays()
    for t in ts:
        scene, real_t = build(t)
        print(f"T={real_t}:")
        bench(lambda o, d, m, e, i: pallas_brute_force(
            scene["tri_pos_flat"], o, d, m, e, i), ro, rd, "brute8 ")
        bench(lambda o, d, m, e, i: cull_trace(
            scene, o, d, m, e, i, mode="hit", shape2d=(H, W)),
            ro, rd, "cull   ")


if __name__ == "__main__":
    main()
