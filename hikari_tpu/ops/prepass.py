"""G-buffer prepass: primary rays replacing the reference's rasterizer.

The reference rasterizes the scene into 5 MRTs (prepass.wgsl fragment,
src/prepass.rs:214-240): POSITION (world xyz + ndc depth), NORMAL,
DEPTH_GRADIENT (dpdx/dpdy of depth), INSTANCE_MATERIAL (ids + 0.5),
VELOCITY_UV (uv velocity + mesh uv). On TPU the exact same contract is
produced by tracing one jittered primary ray per pixel — exact visibility,
no raster. Depth gradients use screen-space forward differences in place of
quad derivatives.

Jitter semantics (prepass.wgsl `frame_jitter` + vertex): under TAA the
camera is offset by the 16-entry Halton sequence, indexed by frame number
(halved rate under SMAA TU4X since each output quad takes 2 frames).
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.config import HALTON_JITTER, Taa, UpscaleMode
from hikari_tpu.utils.math import clip_to_uv, dot3


def frame_jitter(frame_number, taa: Taa, upscale_mode: UpscaleMode):
    """Sub-pixel jitter in pixels for this frame ([2] f32)."""
    table = jnp.asarray(HALTON_JITTER)
    if upscale_mode == UpscaleMode.SMAA_TU4X:
        index = (frame_number >> 1) & 15
    else:
        index = frame_number & 15
    j = table[index]
    if taa == Taa.JASMINE:
        return j
    return jnp.zeros_like(j)


def camera_rays(view, size, jitter_pixels):
    """Device-side primary rays for every pixel.

    view: dict of jnp arrays (see Camera.view_uniform). size=(H, W) static.
    Returns (origins [H,W,3], directions [H,W,3] normalized).
    """
    h, w = size
    inv_vp = view["inverse_view_proj"]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 + jitter_pixels[0]) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 + jitter_pixels[1]) / h
    u, v = jnp.meshgrid(xs, ys)
    ndc = jnp.stack([u * 2.0 - 1.0, (1.0 - v) * 2.0 - 1.0], axis=-1)
    ones = jnp.ones_like(ndc[..., :1])
    # two points on the ray (reverse-Z: any two ndc depths)
    pa = jnp.concatenate([ndc, 0.9 * ones, ones], axis=-1) @ inv_vp.T
    pb = jnp.concatenate([ndc, 0.1 * ones, ones], axis=-1) @ inv_vp.T
    a = pa[..., :3] / pa[..., 3:4]
    b = pb[..., :3] / pb[..., 3:4]
    d = b - a
    d = d / jnp.sqrt(jnp.maximum(dot3(d, d), 1e-30))[..., None]
    o = jnp.broadcast_to(view["world_position"], d.shape)
    return o, d


def ndc_depth(view_proj, world_pos):
    clip = jnp.einsum("ij,...j->...i",
                      view_proj,
                      jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1))
    return clip[..., 2] / clip[..., 3]


def _forward_diff_x(img):
    d = img[:, 1:] - img[:, :-1]
    return jnp.concatenate([d, d[:, -1:]], axis=1)


def _forward_diff_y(img):
    d = img[1:, :] - img[:-1, :]
    return jnp.concatenate([d, d[-1:, :]], axis=0)


def prepass(scene, tracer, view, prev_view, frame_number, size,
            taa: Taa, upscale_mode: UpscaleMode):
    """Render the 5-channel G-buffer at full resolution.

    Returns dict of [H,W,*] arrays: position (xyz + ndc depth; depth 0 ==
    background), normal [H,W,3], depth_gradient [H,W,2],
    instance_material [H,W,2] (ids + 0.5; background keeps id -1 + 0.5),
    velocity_uv [H,W,4].
    """
    h, w = size
    jit = frame_jitter(frame_number, taa, upscale_mode)
    ro, rd = camera_rays(view, size, jit)
    ro_f = ro.reshape(-1, 3)
    rd_f = rd.reshape(-1, 3)
    info = tracer.with_info(scene, ro_f, rd_f,
                            jnp.full((h * w,), 3.4e38, jnp.float32),
                            shape2d=(h, w))
    mask = (info["instance"] >= 0).reshape(h, w)
    wpos = info["position"][..., :3].reshape(h, w, 3)
    normal = info["normal"].reshape(h, w, 3)
    uv = info["uv"].reshape(h, w, 2)
    inst = info["instance"].reshape(h, w)
    mat = info["material"].reshape(h, w)

    depth = jnp.where(mask, ndc_depth(view["view_proj"], wpos), 0.0)
    position = jnp.concatenate([jnp.where(mask[..., None], wpos, 0.0),
                                depth[..., None]], axis=-1)

    depth_gradient = jnp.stack([_forward_diff_x(depth), _forward_diff_y(depth)], axis=-1)

    instance_material = jnp.stack(
        [inst.astype(jnp.float32) + 0.5, mat.astype(jnp.float32) + 0.5], axis=-1
    )

    # velocity: uv(now) - uv(prev) with previous per-instance transform
    # (prepass.wgsl fragment: clip_to_uv(view_proj*P) - clip_to_uv(prev_view_proj*P_prev));
    # inst_motion = prev_model @ inv(model), precomputed per instance
    from hikari_tpu.utils.math import table_gather

    inst_safe = jnp.maximum(inst, 0)
    motion = table_gather(scene["inst_motion"], inst_safe)  # [h,w,16] rows
    # explicit affine transform (per-pixel batched 4x4 einsums are slow)
    px, py, pz = wpos[..., 0], wpos[..., 1], wpos[..., 2]

    def mrow(r):
        return (motion[..., 4 * r + 0] * px + motion[..., 4 * r + 1] * py
                + motion[..., 4 * r + 2] * pz + motion[..., 4 * r + 3])

    prev_wpos = jnp.stack([mrow(0), mrow(1), mrow(2)], -1) / mrow(3)[..., None]

    uv_now = clip_to_uv(jnp.einsum("ij,hwj->hwi", view["view_proj"],
                                   jnp.concatenate([wpos, jnp.ones_like(wpos[..., :1])], -1)))
    uv_prev = clip_to_uv(jnp.einsum("ij,hwj->hwi", prev_view["view_proj"],
                                    jnp.concatenate([prev_wpos, jnp.ones_like(wpos[..., :1])], -1)))
    velocity = jnp.where(mask[..., None], uv_now - uv_prev, 0.0)
    velocity_uv = jnp.concatenate([velocity, uv], axis=-1)

    return {
        "position": position,
        "normal": jnp.where(mask[..., None], normal, 0.0),
        "depth_gradient": depth_gradient,
        "instance_material": instance_material,
        "velocity_uv": velocity_uv,
    }
