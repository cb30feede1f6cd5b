"""Post-process routing: SMAA -> TAA -> FSR per settings, then overlay.

Replicates PostProcessNode::run's texture routing
(post_process.rs:1140-1312, 930-1060): SMAA reads tone-mapping history and
doubles the working size; TAA reads the SMAA output (or tone output) plus its
own history; FSR reads the TAA output (or tone output) and emits full size.
The overlay picks its input by (upscale, taa) (overlay.rs:227-231) and
resamples to the camera target; NaN pixels fall back to albedo
(overlay.wgsl:36-47).
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.config import HikariSettings, Taa, UpscaleMode
from hikari_tpu.ops.filters import resize_bilinear
from hikari_tpu.ops.fsr import easu, rcas
from hikari_tpu.ops.smaa import smaa_tu4x
from hikari_tpu.ops.taa import taa_jasmine
from hikari_tpu.utils.math import inverse_reinhard_luminance


def post_sizes(settings: HikariSettings, full_size, render_size):
    """Static sizes of the TAA stage input/history."""
    if settings.upscale.mode == UpscaleMode.SMAA_TU4X:
        return (2 * render_size[0], 2 * render_size[1])
    return render_size


def post_chain(gbuf, carry, tone, frame, settings: HikariSettings,
               full_size, render_size, smaa_quads=None):
    """Returns (final [H,W,4] at full_size, post_carry dict).

    smaa_quads: optional precomputed SMAA parity-quad planes
    (ops/prepass_fused.prepass_fused_quads) replacing the XLA quad
    decimation of the full-res G-buffer."""
    import os

    prev_gbuf = carry["prev_gbuffer"]
    cur = tone
    cur_size = render_size

    bypass = os.environ.get("HIKARI_POST_BYPASS")
    if bypass:  # perf-isolation debug switches
        def up(img):
            if img.shape[:2] == full_size:
                return img
            ry = full_size[0] // img.shape[0]
            rx = full_size[1] // img.shape[1]
            return jnp.repeat(jnp.repeat(img, ry, 0), rx, 1)

        if bypass == "all":
            image = up(tone)
            return image, {"prev_tone": tone, "prev_taa": carry["prev_taa"],
                           "prev_upscale": image}
        if bypass == "taa_only":
            # run TAA at the size its history was allocated for
            # (post_sizes: render_size unless SMAA doubles it)
            tsize = carry["prev_taa"].shape[:2]

            def up_to(img, size):
                if img.shape[:2] == size:
                    return img
                ry = size[0] // img.shape[0]
                rx = size[1] // img.shape[1]
                return jnp.repeat(jnp.repeat(img, ry, 0), rx, 1)

            cur = up_to(tone, tsize)
            taa_out = taa_jasmine(gbuf, prev_gbuf, carry["prev_taa"], cur,
                                  frame, frame["clear_color"], tsize)
            image = up_to(taa_out, full_size)
            return image, {"prev_tone": tone, "prev_taa": taa_out,
                           "prev_upscale": image}
        if bypass == "smaa_only":
            s = smaa_tu4x(gbuf, prev_gbuf, carry["prev_tone"], tone, frame,
                          render_size)
            return s, {"prev_tone": tone, "prev_taa": carry["prev_taa"],
                       "prev_upscale": s}

    smaa_out = None
    if settings.upscale.mode == UpscaleMode.SMAA_TU4X:
        smaa_out = smaa_tu4x(gbuf, prev_gbuf, carry["prev_tone"], tone,
                             frame, render_size, quads=smaa_quads)
        cur = smaa_out
        cur_size = (2 * render_size[0], 2 * render_size[1])

    taa_out = None
    if settings.taa == Taa.JASMINE:
        taa_out = taa_jasmine(gbuf, prev_gbuf, carry["prev_taa"], cur, frame,
                              frame["clear_color"], cur_size)
        cur = taa_out

    if settings.upscale.mode == UpscaleMode.FSR1:
        up = easu(cur, full_size)
        up = rcas(jnp.concatenate([up, jnp.ones(full_size + (1,))], -1),
                  settings.upscale.sharpness)
        cur = up
        cur_size = full_size

    # overlay: resample to target
    if cur_size != full_size:
        image = resize_bilinear(cur, full_size)
    else:
        image = cur

    post_carry = {
        "prev_tone": tone,
        "prev_taa": taa_out if taa_out is not None else carry["prev_taa"],
        "prev_upscale": resize_bilinear(cur, full_size)
        if cur_size != full_size else cur,
    }
    return image, post_carry


def overlay_compose(image, albedo, hdr: bool):
    """NaN fallback + optional inverse Reinhard for the HDR path
    (overlay.wgsl:36-47)."""
    bad = ~jnp.all(jnp.isfinite(image), axis=-1, keepdims=True)
    out = jnp.where(bad, albedo, image)
    if hdr:
        rgb = inverse_reinhard_luminance(out[..., :3])
        out = jnp.concatenate([rgb, out[..., 3:4]], -1)
    return out
