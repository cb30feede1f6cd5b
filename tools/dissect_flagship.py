"""Per-stage timing of the flagship frame by compiling stage-truncated
programs (each includes everything up to stage k; deltas attribute cost).

Measurement: each truncated program runs in a host loop with the carry
threaded (evolving state => no identical-dispatch caching), 15 frames,
steady state after the first. Serial only.

Usage: python tools/dissect_flagship.py [stage...]
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
from hikari_tpu.ops import reservoir as rsv  # noqa: E402
from hikari_tpu.ops import restir  # noqa: E402
from hikari_tpu.ops.noise import noise_constant, sample_blue_noise  # noqa: E402
from hikari_tpu.ops.prepass import prepass  # noqa: E402
from hikari_tpu.ops.tonemap import tone_mapping  # noqa: E402
from hikari_tpu.ops.trace import make_tracer  # noqa: E402

W, H = 1920, 1080
FRAMES = 15


def build(stage: str):
    settings = dataclasses.replace(
        HikariSettings(), temporal_reuse=False, emissive_spatial_reuse=False,
        indirect_spatial_reuse=False, denoise=True, indirect_bounces=1,
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
        outs = [gbuf["position"], gbuf["velocity_uv"]]
        if stage >= "b":
            albedo = restir.full_screen_albedo(scene_d, gbuf, view, no_texture)
            outs.append(albedo)
        if stage >= "c":
            g = restir.resample_gbuffer(gbuf, render_size, frame["number"],
                                        settings.upscale_ratio)
            rand = sample_blue_noise(noise, frame["number"], render_size)
            reproj = restir.reprojection(g, frame, render_size)
            prev_r = rsv.empty_reservoir(render_size)
            e = restir.direct_lit(
                scene_d, tracer, g, view, frame, rand, reproj, prev_r, None,
                emissive_lit=True, temporal_reuse=False, no_texture=no_texture,
                track_spatial=False, render_size=render_size)
            outs.append(e["render"])
        if stage >= "d":
            i = restir.indirect_lit_ambient(
                scene_d, tracer, g, view, frame, rand, reproj,
                rsv.empty_reservoir(render_size), None, bounces=1,
                temporal_reuse=False, no_texture=no_texture,
                track_spatial=False, render_size=render_size)
            outs.append(i["render"])
        if stage >= "e":
            from hikari_tpu.ops.denoise import denoise_channel

            e_r = denoise_channel(g, albedo, e["render"], e["variance"],
                                  frame, render_size, settings.upscale_ratio,
                                  firefly=True)
            i_r = denoise_channel(g, albedo, i["render"], i["variance"],
                                  frame, render_size, settings.upscale_ratio,
                                  firefly=True)
            outs.append(e_r)
            outs.append(i_r)
        if stage >= "f":
            d_r = restir.emissive_surface_channel(
                scene_d, g, no_texture, render_size)["render"]
            tone = tone_mapping(d_r, e_r, i_r, frame["clear_color"])
            outs.append(tone)
        # thread a cheap evolving perturbation through the carry
        carry2 = dict(carry)
        carry2["prev_view_proj"] = view["view_proj"]
        carry2["prev_inverse_view_proj"] = view["inverse_view_proj"]
        carry2["frame_number"] = frame["number"] + 1
        carry2["prev_tone"] = carry["prev_tone"] + 1e-3 * outs[-1][..., :4]
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
    stages = sys.argv[1:] or ["a", "b", "c", "d", "e", "f"]
    for s in stages:
        run(s)
