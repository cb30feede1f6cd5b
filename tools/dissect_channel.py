"""Intra-channel timing of the flagship emissive channel (no-reuse fast
path): stage-truncated programs, deltas attribute cost. Serial only.

Stages:
  s0  prepass + resample + noise (baseline)
  s1  + candidate select WITHOUT probe trace (walk + alias + barycentric)
  s2  + probe trace (pallas_brute_force_full over the emissive-only table)
  s3  + shadow trace (pallas_shadow over the full table)
  s4  + input_radiance
  s5  + shading epilogue (full channel output)
  s6  + emissive_surface_channel + tone_mapping (stage-f suspects)

Usage: python tools/dissect_channel.py [stage...]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from examples.cornell import build_scene  # noqa: E402
from hikari_tpu import Camera, HikariSettings, Taa, Upscale  # noqa: E402
from hikari_tpu.config import make_frame_uniform  # noqa: E402
from hikari_tpu.frame import init_carry, scaled_size  # noqa: E402
from hikari_tpu.ops import restir  # noqa: E402
from hikari_tpu.ops.noise import noise_constant, sample_blue_noise  # noqa: E402
from hikari_tpu.ops.prepass import prepass  # noqa: E402
from hikari_tpu.ops.sampling import (  # noqa: E402
    RAY_BIAS,
    occlude_hit_info,
    select_light_candidate,
)
from hikari_tpu.ops.shading import (  # noqa: E402
    calculate_view,
    compute_emissive_radiance,
    input_radiance,
    retrieve_surface,
    shading,
)
from hikari_tpu.ops.trace import make_tracer  # noqa: E402
from hikari_tpu.utils.math import F32_EPSILON, dot3, luminance, normalize  # noqa: E402

W, H = 1920, 1080
FRAMES = 15


def build(stage: str):
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=False, emissive_spatial_reuse=False,
        indirect_spatial_reuse=False, denoise=False, indirect_bounces=0,
        taa=Taa.NONE, upscale=Upscale.none())
    scene = build_scene()
    gpu = scene.compile()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=W, height=H)
    tracer = make_tracer(gpu.num_triangles)
    full_size = (H, W)
    render_size = scaled_size(full_size, settings.upscale_ratio)
    no_texture = gpu.num_textures == 0

    def fn(scene_d, view, frame, noise, carry):
        prev_view = {"view_proj": carry["prev_view_proj"],
                     "inverse_view_proj": carry["prev_inverse_view_proj"]}
        gbuf = prepass(scene_d, tracer, view, prev_view, frame["number"],
                       full_size, settings.taa, settings.upscale.mode)
        g = restir.resample_gbuffer(gbuf, render_size, frame["number"],
                                    settings.upscale_ratio)
        rand = sample_blue_noise(noise, frame["number"], render_size)
        depth = g["position"][..., 3]
        valid = depth >= F32_EPSILON
        s_vis_pos = g["position"][..., :3]
        s_vis_nrm = g["normal"]
        s_inst = g["instance_material"][..., 0].astype(jnp.int32)
        pos_f = s_vis_pos.reshape(-1, 3)
        nrm_f = s_vis_nrm.reshape(-1, 3)
        rand_f = rand.reshape(-1, 4)
        inst_f = s_inst.reshape(-1)
        outs = [gbuf["position"], g["velocity_uv"], rand]

        if stage >= "s1":
            # candidate WITHOUT the probe trace: patch tracer.probe_info to
            # an empty-hit stub so everything else compiles identically
            class _Stub:
                with_info = None

                @staticmethod
                def probe_info(scene, ro, rd, max_t, excl, incl):
                    from hikari_tpu.ops.sampling import empty_hit_info
                    info = empty_hit_info(ro, rd)
                    info["t"] = jnp.full(ro.shape[:1], 1.0)
                    info["prim"] = jnp.zeros(ro.shape[:1], jnp.int32)
                    # pretend every probe hits the emitter so downstream
                    # masks match the real shape of work
                    info["instance"] = incl
                    info["material"] = jnp.zeros_like(incl)
                    return info

            probe_tr = _Stub if stage == "s1" else tracer
            cand, info = select_light_candidate(
                scene_d, probe_tr, rand_f, pos_f, nrm_f, inst_f,
                frame["solar_angle"], sample_emissive=True)
            outs.append(cand["direction"].reshape(render_size + (3,)))
            outs.append(cand["p"].reshape(render_size))
        if stage >= "s3":
            ro = pos_f + nrm_f * RAY_BIAS
            rd = cand["direction"]
            trace_ok = ((dot3(rd, nrm_f) > 0.0) & (cand["p"] > 0.0)
                        & (cand["emissive_instance"] >= 0))
            hit = tracer.shadow(scene_d, ro, rd, cand["max_distance"],
                                cand["emissive_instance"], None,
                                cand["min_distance"], shape2d=render_size)
            outs.append(hit["t"].reshape(render_size))
        if stage >= "s4":
            info = occlude_hit_info(ro, rd, hit, info)
            rad = input_radiance(
                scene_d, rd, info["instance"], info["material"], info["uv"],
                sample_directional=False,
                sample_emissive=cand["emissive_instance"],
                sample_ambient=False, solar_angle=frame["solar_angle"],
                no_texture=no_texture)
            rad = jnp.where(trace_ok[:, None], rad, 0.0)
            outs.append(rad.reshape(render_size + (4,)))
        if stage >= "s5":
            lum = luminance(rad[:, :3])
            w_new = jnp.where(cand["p"] > 0.0,
                              lum / jnp.maximum(cand["p"], 1e-30), 0.0)
            w_f = jnp.where(lum > 0.0, w_new / jnp.maximum(lum, 1e-30), 0.0)
            w2d = jnp.where(valid, w_f.reshape(render_size), 0.0)
            material = g["instance_material"][..., 1].astype(jnp.int32)
            mesh_uv = g["velocity_uv"][..., 2:4]
            surface = retrieve_surface(scene_d, material, mesh_uv, no_texture)
            view_dir = calculate_view(view, g["position"][..., :3])
            sample_pos = info["position"].reshape(render_size + (4,))
            l_dir = normalize(sample_pos[..., :3] - s_vis_pos)
            out = shading(scene_d, view_dir, s_vis_nrm, l_dir, surface,
                          rad.reshape(render_size + (4,))) * w2d[..., None]
            e_render = jnp.where(
                valid[..., None],
                jnp.concatenate([out, jnp.ones_like(depth)[..., None]], -1),
                0.0)
            outs.append(e_render)
        if stage >= "s6":
            d = restir.emissive_surface_channel(scene_d, g, no_texture,
                                                render_size)
            from hikari_tpu.ops.tonemap import tone_mapping

            zero = jnp.zeros(render_size + (4,))
            tone = tone_mapping(d["render"], e_render, zero,
                                frame["clear_color"])
            outs.append(tone)

        carry2 = dict(carry)
        carry2["prev_view_proj"] = view["view_proj"]
        carry2["prev_inverse_view_proj"] = view["inverse_view_proj"]
        carry2["frame_number"] = frame["number"] + 1
        carry2["prev_tone"] = carry["prev_tone"] + 1e-3 * outs[-1][..., :1]
        return outs[-1], carry2

    jfn = jax.jit(fn, donate_argnums=(4,))
    scene_d = gpu.as_pytree()
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    noise = noise_constant()
    carry = jax.tree.map(lambda a: a + jnp.zeros_like(a),
                         init_carry(full_size, settings))
    return jfn, scene_d, view, noise, carry, settings


def run(stage: str):
    jfn, scene_d, view, noise, carry, settings = build(stage)
    out, carry = jfn(scene_d, view, make_frame_uniform(settings, 0), noise,
                     carry)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, FRAMES + 1):
        out, carry = jfn(scene_d, view, make_frame_uniform(settings, i),
                         noise, carry)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / FRAMES * 1e3
    print(f"stage {stage}: {dt:.2f} ms")
    return dt


if __name__ == "__main__":
    stages = sys.argv[1:] or ["s0", "s1", "s2", "s3", "s4", "s5", "s6"]
    for s in stages:
        run(s)
