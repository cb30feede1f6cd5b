"""Sub-stage probes of the emissive lighting channel on the real cornell
scene at 1080p (what dissect_flagship stage c showed costing ~35 ms).

Each probe is one jitted lax.scan with per-step perturbed inputs
(measurement traps 1-3 in PERF.md).

Usage: python tools/probe_channel.py [s1 s2 ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from examples.cornell import build_scene  # noqa: E402
from hikari_tpu import Camera, HikariSettings  # noqa: E402
from hikari_tpu.config import make_frame_uniform  # noqa: E402
from hikari_tpu.ops.sampling import select_light_candidate  # noqa: E402
from hikari_tpu.ops.trace import make_tracer  # noqa: E402
from hikari_tpu.utils.math import table_gather  # noqa: E402

N = 1920 * 1080
STEPS = 10


def scan_bench(fn, x0, name):
    @jax.jit
    def run(x):
        def body(c, i):
            return c + 1e-3 * (i + 1.0), fn(c)
        _, css = jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.float32))
        return css

    css = jax.block_until_ready(run(x0))
    assert len(set(np.asarray(css).tolist())) > 1, f"{name}: identical!"
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name}: {dt*1e3:.2f} ms")


def main():
    which = set(sys.argv[1:]) or {"s1", "s2", "s3", "s4", "s5", "s6", "s7",
                                  "s8"}
    gpu = build_scene().compile()
    scene = gpu.as_pytree()
    settings = HikariSettings()
    frame = make_frame_uniform(settings, 7)
    tracer = make_tracer(gpu.num_triangles)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    pos = pos.at[:, 1].add(1.0)
    nrm = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    rand = jnp.asarray(rng.uniform(0, 1, (N, 4)).astype(np.float32))
    inst = jnp.zeros((N,), jnp.int32)

    if "s1" in which:
        def f(p):
            cand, info = select_light_candidate(
                scene, tracer, rand + 1e-4 * p[:, :1], p, nrm, inst,
                frame["solar_angle"], sample_emissive=True)
            return jnp.sum(cand["p"]) + jnp.sum(info["position"])
        scan_bench(f, pos, "s1 select_light_candidate(emissive) [2M]")

    if "s2" in which:
        maxt = jnp.full((N,), 10.0)
        def f(p):
            h = tracer.shadow(scene, p, nrm, maxt)
            return jnp.sum(jnp.where(h["instance"] >= 0, h["t"], 0.0))
        scan_bench(f, pos, "s2 shadow trace [2M x 40t]")

    if "s3" in which:
        from hikari_tpu.ops.sampling import empty_hit_info, occlude_hit_info
        from hikari_tpu.ops.shading import input_radiance
        maxt = jnp.full((N,), 10.0)
        def f(p):
            h = tracer.shadow(scene, p, nrm, maxt)
            info = occlude_hit_info(p, nrm, h, empty_hit_info(p, nrm))
            rad = input_radiance(scene, nrm, info["instance"],
                                 info["material"], info["uv"],
                                 sample_directional=False, sample_emissive=inst,
                                 sample_ambient=False,
                                 solar_angle=frame["solar_angle"],
                                 no_texture=True)
            return jnp.sum(rad)
        scan_bench(f, pos, "s3 shadow + occlude + input_radiance [2M]")

    if "s4" in which:
        from hikari_tpu.ops.shading import retrieve_surface, shading
        mat = jnp.zeros((N,), jnp.int32)
        uv = rand[:, :2]
        def f(p):
            surf = retrieve_surface(scene, mat, uv + 1e-4 * p[:, :2], True)
            out = shading(scene, nrm, nrm, nrm, surf,
                          jnp.concatenate([p, p[:, :1]], -1))
            return jnp.sum(out)
        scan_bench(f, pos, "s4 retrieve_surface + shading [2M]")

    if "s5" in which:
        prim = jnp.asarray(rng.integers(0, 40, N).astype(np.int32))
        def f(p):
            pr = (prim + (p[:, 0] * 1e3).astype(jnp.int32)) % 40
            v = table_gather(scene["tri_pos_flat"], pr)
            return jnp.sum(v)
        scan_bench(f, pos, "s5 table_gather tri_pos_flat[40] at [2M]")

    if "s6" in which:
        from hikari_tpu.ops import reservoir as rsv
        r0 = rsv.empty_reservoir((1080, 1920))
        def f(p):
            s = rsv.make_sample(
                radiance=jnp.concatenate([p, p[:, :1]], -1).reshape(1080, 1920, 4),
                random=rand.reshape(1080, 1920, 4),
                visible_position=jnp.concatenate([p, p[:, :1]], -1).reshape(1080, 1920, 4),
                visible_normal=nrm.reshape(1080, 1920, 3),
                visible_instance=inst.reshape(1080, 1920),
                sample_position=jnp.concatenate([p, p[:, :1]], -1).reshape(1080, 1920, 4),
                sample_normal=nrm.reshape(1080, 1920, 3))
            w = p[:, 0].reshape(1080, 1920)
            r = rsv.temporal_restir(r0, s, w, frame["max_temporal_reuse_count"])
            r = rsv.finalize_w(r, w)
            return jnp.sum(rsv.pack_reservoir(r))
        scan_bench(f, pos, "s6 temporal_restir + pack [1080p]")

    if "s7" in which:
        maxt = jnp.full((N,), 3.4e38)
        def f(p):
            h = tracer.with_info(scene, p, nrm, maxt)
            return jnp.sum(h["position"]) + jnp.sum(h["normal"])
        scan_bench(f, pos, "s7 with_info full trace [2M x 40t]")

    if "s8" in which:
        from hikari_tpu.ops.prepass import prepass
        from hikari_tpu.config import Taa, UpscaleMode
        cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                                  width=1920, height=1080)
        view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
        def f(p):
            v2 = dict(view)
            v2["world_position"] = view["world_position"] + p[0, :3] * 1e-3
            g = prepass(scene, tracer, v2, view, frame["number"],
                        (1080, 1920), Taa.NONE, UpscaleMode.NONE)
            return jnp.sum(g["position"]) + jnp.sum(g["velocity_uv"])
        scan_bench(f, pos, "s8 prepass (varying view) [1080p]")


if __name__ == "__main__":
    main()
