"""Frame pipeline: one jit-compiled function per (scene shape, settings, size).

The reference records PREPASS -> LIGHT -> POST_PROCESS -> OVERLAY each frame
into one command encoder (lib.rs:332-365). Here the same sequence is ONE
traced XLA program: `render_frame(scene, view, frame, noise, carry) ->
(image, carry)` with every pass a pure tensor op and all persistent state
(reservoirs, G-buffer history, post-process history) threaded through the
functional `carry` — zero host round-trips inside a frame.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from hikari_tpu.config import HikariSettings, Taa, UpscaleMode
from hikari_tpu.ops import reservoir as rsv
from hikari_tpu.ops import restir
from hikari_tpu.ops.noise import sample_blue_noise
from hikari_tpu.ops.prepass import prepass
from hikari_tpu.ops.tonemap import tone_mapping


def scaled_size(full_size: Tuple[int, int], ratio: float) -> Tuple[int, int]:
    """ceil(size / ratio) — post_process.rs:1172-1174."""
    import math

    h, w = full_size
    return (max(1, math.ceil(h / ratio)), max(1, math.ceil(w / ratio)))


def init_carry(full_size, settings: HikariSettings):
    """Persistent frame state (the functional replacement for the
    reference's ping-pong buffers and history textures)."""
    render_size = scaled_size(full_size, settings.upscale_ratio)
    h, w = full_size
    rh, rw = render_size
    zeros4 = lambda s: jnp.zeros(s + (4,), jnp.float32)
    return {
        "frame_number": jnp.uint32(0),
        "direct_temporal": rsv.empty_reservoir(render_size),
        "emissive_temporal": rsv.empty_reservoir(render_size),
        "indirect_temporal": rsv.empty_reservoir(render_size),
        "spatial_de": rsv.empty_reservoir(render_size),
        "spatial_indirect": rsv.empty_reservoir(render_size),
        # previous G-buffer (prepass.rs:286-307 previous_* textures)
        "prev_gbuffer": {
            "position": zeros4((h, w)),
            "normal": jnp.zeros((h, w, 3), jnp.float32),
            "instance_material": jnp.zeros((h, w, 2), jnp.float32),
            "velocity_uv": zeros4((h, w)),
        },
        "prev_view_proj": jnp.eye(4, dtype=jnp.float32),
        "prev_inverse_view_proj": jnp.eye(4, dtype=jnp.float32),
        # post-process history (tone history feeds SMAA; TAA history is at
        # the post-SMAA working size — post_process.rs:716-745)
        "prev_tone": zeros4(render_size),
        "prev_taa": zeros4(_post_size(settings, render_size)),
        "prev_upscale": zeros4((h, w)),
    }


def _post_size(settings: HikariSettings, render_size):
    if settings.upscale.mode == UpscaleMode.SMAA_TU4X:
        return (2 * render_size[0], 2 * render_size[1])
    return render_size


def build_render_frame(settings: HikariSettings, full_size, tracer,
                       no_texture: bool):
    """Returns render_frame(scene, view, frame_uniform, noise, carry) ->
    (image [H,W,4], albedo [H,W,4], carry). Specialized on static settings."""
    render_size = scaled_size(full_size, settings.upscale_ratio)
    taa = settings.taa
    upscale = settings.upscale

    def render_frame(scene, view, frame, noise, carry):
        prev_view = {"view_proj": carry["prev_view_proj"],
                     "inverse_view_proj": carry["prev_inverse_view_proj"]}

        gbuf = prepass(scene, tracer, view, prev_view, frame["number"],
                       full_size, taa, upscale.mode)

        albedo = restir.full_screen_albedo(scene, gbuf, view, no_texture)

        rand = sample_blue_noise(noise, frame["number"], render_size)

        # --- direct channel (RENDER_EMISSIVE)
        spatial_de = carry["spatial_de"]
        d = restir.direct_lit(
            scene, tracer, gbuf, view, frame, rand,
            carry["direct_temporal"], spatial_de,
            emissive_lit=False, temporal_reuse=settings.temporal_reuse,
            no_texture=no_texture, render_size=render_size)
        spatial_de = d["prev_spatial"]

        # --- emissive channel (EMISSIVE_LIT)
        e = restir.direct_lit(
            scene, tracer, gbuf, view, frame, rand,
            carry["emissive_temporal"], spatial_de,
            emissive_lit=True, temporal_reuse=settings.temporal_reuse,
            no_texture=no_texture, render_size=render_size)
        spatial_de = e["prev_spatial"]
        e_render, e_var = e["render"], e["variance"]
        if settings.emissive_spatial_reuse:
            sp = restir.spatial_reuse(
                scene, gbuf, view, frame, e["reservoir"], spatial_de,
                e, emissive_lit=True, no_texture=no_texture,
                render_size=render_size)
            spatial_de = sp["spatial"]
            e_render = sp["render"]
            e_var = jnp.where(jnp.isnan(sp["variance"]), e_var, sp["variance"])

        # --- indirect channel
        spatial_ind = carry["spatial_indirect"]
        i = restir.indirect_lit_ambient(
            scene, tracer, gbuf, view, frame, rand,
            carry["indirect_temporal"], spatial_ind,
            bounces=settings.indirect_bounces,
            temporal_reuse=settings.temporal_reuse,
            no_texture=no_texture, render_size=render_size)
        spatial_ind = i["prev_spatial"]
        i_render, i_var = i["render"], i["variance"]
        if settings.indirect_spatial_reuse and settings.indirect_bounces > 0:
            sp = restir.spatial_reuse(
                scene, gbuf, view, frame, i["reservoir"], spatial_ind,
                i, emissive_lit=False, no_texture=no_texture,
                render_size=render_size)
            spatial_ind = sp["spatial"]
            i_render = sp["render"]
            i_var = jnp.where(jnp.isnan(sp["variance"]), i_var, sp["variance"])

        d_render, d_var = d["render"], d["variance"]

        # --- post process
        if settings.denoise:
            from hikari_tpu.ops.denoise import denoise_channel

            # firefly filtering: off for direct, on for emissive/indirect
            # (post_process.rs:773-784, 1192-1196)
            d_render = denoise_channel(gbuf, albedo, d_render, d_var, frame,
                                       render_size, firefly=False)
            e_render = denoise_channel(gbuf, albedo, e_render, e_var, frame,
                                       render_size, firefly=True)
            if settings.indirect_bounces > 0:
                i_render = denoise_channel(gbuf, albedo, i_render, i_var,
                                           frame, render_size, firefly=True)

        tone = tone_mapping(d_render, e_render, i_render, frame["clear_color"])

        # --- TAA / upscaling chain
        from hikari_tpu.ops import post

        image, post_carry = post.post_chain(
            gbuf, carry, tone, frame, settings, full_size, render_size)

        new_carry = {
            "frame_number": frame["number"] + 1,
            "direct_temporal": d["temporal"],
            "emissive_temporal": e["temporal"],
            "indirect_temporal": i["temporal"],
            "spatial_de": spatial_de,
            "spatial_indirect": spatial_ind,
            "prev_gbuffer": {
                "position": gbuf["position"],
                "normal": gbuf["normal"],
                "instance_material": gbuf["instance_material"],
                "velocity_uv": gbuf["velocity_uv"],
            },
            "prev_view_proj": view["view_proj"],
            "prev_inverse_view_proj": view["inverse_view_proj"],
            **post_carry,
        }
        return image, albedo, new_carry

    return render_frame
