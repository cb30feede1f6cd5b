"""Lighting channels: direct / emissive / indirect + spatial reuse.

Re-derivation of light.wgsl's four compute kernels as dense [h,w] tensor
passes:

* `full_screen_albedo` (light.wgsl:1020-1042) — env-BRDF albedo at full res.
* `direct_lit` (light.wgsl:1045-1261) — one kernel, two specializations:
  direct sun channel (RENDER_EMISSIVE) and emissive channel (EMISSIVE_LIT);
  NEE candidate + shadow ray + temporal ReSTIR + validation frames.
* `indirect_lit_ambient` (light.wgsl:1264-1498) — cosine-hemisphere bounce
  with per-bounce NEE, static bounce-count loop, radiance clamp, temporal
  ReSTIR.
* `spatial_reuse` (light.wgsl:1503-1684) — Fibonacci-spiral taps with
  depth/normal/hemisphere gates, screen-space depth ray-march occlusion and
  GRIS Jacobian reweighting.

TPU performance architecture (arbitrary per-pixel gathers cost ~24ns/ROW on
TPU regardless of width — measured):

* The jittered G-buffer lookup (light.wgsl:1007-1017) is an AFFINE map, so
  for upscale ratios 1 and 2 it compiles to parity-selected strided slices,
  not gathers (`resample_deferred`).
* Temporal reprojection is ONE packed row-gather for all three channels
  combined (done by the caller in frame.py); reservoirs travel packed
  [h,w,28] (reservoir.pack_reservoir).
* Spatial-reuse taps use per-frame (not per-pixel) random spiral rotations —
  offsets become traced scalars, so neighbor loads are `jnp.roll`s instead
  of gathers. The reference scrambles the spiral per pixel
  (light.wgsl:1566-1572); with 8-16 taps + the per-frame rotation +
  denoiser this is visually equivalent and orders of magnitude faster here.
* Scalar per-frame branches (validation frames) compile as `lax.cond`;
  per-pixel branches are masks. The reference's cross-pixel scatter
  invalidation of previous spatial reservoirs is a single packed row-scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.ops import reservoir as rsv
from hikari_tpu.ops.sampling import (
    RAY_BIAS,
    occlude_hit_info,
    select_light_candidate,
)
from hikari_tpu.ops.shading import (
    calculate_view,
    compute_emissive_radiance,
    env_brdf,
    input_radiance,
    retrieve_surface,
    shading,
)
from hikari_tpu.utils.math import (
    F32_EPSILON,
    F32_MAX,
    GOLDEN_RATIO,
    TAU,
    dot3,
    luminance,
    normalize,
    random_float,
    sample_cosine_hemisphere,
    apply_normal_basis,
)

VALIDATION_COUNT_THRESHOLD = 4.0
SPATIAL_VARIANCE_SAMPLE_THRESHOLD = 4.0


# ---------------------------------------------------------------------------
# G-buffer addressing
# ---------------------------------------------------------------------------

def pixel_uv(size):
    h, w = size
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    u, v = jnp.meshgrid(x, y)
    return jnp.stack([u, v], axis=-1)  # [h,w,2]


def jittered_deferred_uv(uv, deferred_size, frame_number, upscale_ratio,
                         amount=0.25):
    """light.wgsl:1007-1011 (0.25) / denoise.wgsl:37-41 (0.5)."""
    dh, dw = deferred_size
    texel = jnp.array([1.0 / dw, 1.0 / dh], jnp.float32)
    sign = jnp.where((frame_number & 1) == 0, -amount, amount)
    return uv + sign * texel * (upscale_ratio - 1.0)


def resample_deferred(img, render_size, frame_number, ratio: float):
    """Jittered-deferred lookup of a full-res [H,W,...] buffer at render res.

    The index map floor((x_r + 0.5) * ratio + sign*amount) is affine, so:
    ratio 1 -> identity; ratio 2 -> parity-selected stride-2 slice (same
    result for the light passes' 0.25 and the denoiser's 0.5 jitter
    amounts). Other ratios fall back to separable axis takes.
    """
    h, w = render_size
    H, W = img.shape[:2]
    if ratio == 1.0 and (H, W) == (h, w):
        return img
    if ratio == 2.0 and H >= 2 * h and W >= 2 * w:
        # reshape-pair decimation: jnp's `img[0::2, 0::2]` lowers to a full
        # 2-D GATHER in this jax (~4 ms per plane at 1080p), and a
        # lane-strided lax.slice costs 3-5x a reshape + static slice
        # (tools/probe_compress.py)
        tail = img.shape[2:]
        quads = img[:2 * h, :2 * w].reshape((h, 2, w, 2) + tail)
        even = quads[:, 0, :, 0]
        odd = quads[:, 1, :, 1]
        sel = (frame_number & 1) == 0
        return jnp.where(sel, even, odd)
    # generic separable fallback
    sign = jnp.where((frame_number & 1) == 0, -0.25, 0.25)
    xs = jnp.clip((( (jnp.arange(w) + 0.5) * ratio) + sign).astype(jnp.int32), 0, W - 1)
    ys = jnp.clip((( (jnp.arange(h) + 0.5) * ratio) + sign).astype(jnp.int32), 0, H - 1)
    return jnp.take(jnp.take(img, ys, axis=0), xs, axis=1)


def resample_gbuffer(gbuf, render_size, frame_number, ratio: float):
    """Decimate every G-buffer plane in ONE pass: the parity decimation's
    reshape is a real layout pass per tensor, so concatenate the planes
    (15 channels) and run it once (~3x fewer 1080p passes at ratio 2)."""
    keys = sorted(gbuf.keys())
    widths = [gbuf[k].shape[-1] for k in keys]
    cat = jnp.concatenate([gbuf[k] for k in keys], axis=-1)
    dec = resample_deferred(cat, render_size, frame_number, ratio)
    out = {}
    o = 0
    for k, n in zip(keys, widths):
        out[k] = dec[..., o:o + n]
        o += n
    return out


def uv_to_coords(uv, size):
    h, w = size
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return y, x


def in_unit_box(uv, strict=True):
    d = jnp.abs(uv - 0.5)
    return jnp.all(d < 0.5, -1) if strict else jnp.all(d <= 0.5, -1)


def roll2d(img, dy, dx):
    """Shift so out[p] = img[p + (dy,dx)] with traced integer offsets."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


# ---------------------------------------------------------------------------
# full-screen albedo (light.wgsl:1020-1042)
# ---------------------------------------------------------------------------

def primary_surface(scene, g, no_texture: bool):
    """The G-buffer pixel's material+texture surface (light.wgsl:729-781).

    Computed ONCE per frame per G-buffer domain and shared by every
    primary-surface consumer (albedo, channel shading, spatial reuse) —
    each atlas bilinear tap is a [npix] row gather (~18 ms per tap at
    1080p measured), and the reference's one-kernel design reads the
    textures once per pixel too (light.wgsl:749-793)."""
    material = g["instance_material"][..., 1].astype(jnp.int32)
    mesh_uv = g["velocity_uv"][..., 2:4]
    return retrieve_surface(scene, material, mesh_uv, no_texture,
                            coherent=True)


def full_screen_albedo(scene, gbuf, view, no_texture: bool, surface=None):
    depth = gbuf["position"][..., 3]
    valid = depth >= F32_EPSILON
    normal = gbuf["normal"]
    if surface is None:
        surface = primary_surface(scene, gbuf, no_texture)
    v = calculate_view(view, gbuf["position"][..., :3])
    albedo = env_brdf(surface, v, normal)
    a = jnp.concatenate([albedo, jnp.ones_like(depth)[..., None]], -1)
    return jnp.where(valid[..., None], a, 0.0)


# ---------------------------------------------------------------------------
# shared per-frame reprojection info (computed once for all channels)
# ---------------------------------------------------------------------------

def reprojection(g, frame, render_size):
    """previous_uv / coords / bounds shared by every channel.

    g: render-res resampled G-buffer.
    """
    uv = pixel_uv(render_size)
    # the jitter constant cancels out of bounds checks at the precision that
    # matters; previous_uv matches light.wgsl:1089 with the same resampling
    deferred_size = render_size  # uv math happens in unit space
    velocity = g["velocity_uv"][..., :2]
    previous_uv = uv - velocity
    piy, pix = uv_to_coords(previous_uv, render_size)
    return {
        "uv": uv,
        "previous_uv": previous_uv,
        "piy": piy,
        "pix": pix,
        "in_strict": in_unit_box(previous_uv, strict=True),
        "in_loose": in_unit_box(previous_uv, strict=False),
    }


def reprojection_ckb(g_c, frame, render_size, par):
    """`reprojection` for the compressed checkerboard domain: uv are the
    TRUE pixel centers of this frame's active pixels; piy/pix index the
    FULL-resolution reservoir carry."""
    from hikari_tpu.ops import checkerboard as ckb

    uv = ckb.pixel_uv(render_size, par)
    velocity = g_c["velocity_uv"][..., :2]
    previous_uv = uv - velocity
    piy, pix = uv_to_coords(previous_uv, render_size)
    return {
        "uv": uv,
        "previous_uv": previous_uv,
        "piy": piy,
        "pix": pix,
        "in_strict": in_unit_box(previous_uv, strict=True),
        "in_loose": in_unit_box(previous_uv, strict=False),
    }


def make_sample_from_gbuffer(g, noise_rand, render_size):
    h, w = render_size
    depth = g["position"][..., 3]
    return rsv.make_sample(
        radiance=jnp.zeros((h, w, 4)),
        random=noise_rand,
        visible_position=jnp.concatenate(
            [g["position"][..., :3], depth[..., None]], -1),
        visible_normal=g["normal"],
        visible_instance=g["instance_material"][..., 0].astype(jnp.int32),
        sample_position=jnp.zeros((h, w, 4)),
        sample_normal=jnp.zeros((h, w, 3)),
    )


def _flat(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflat(x, size):
    return x.reshape(size + x.shape[1:])


# ---------------------------------------------------------------------------
# direct / emissive channel (light.wgsl:1045-1261)
# ---------------------------------------------------------------------------

def direct_lit(scene, tracer, g, view, frame, noise_rand, reproj, prev_r,
               prev_spatial_packed, *,
               emissive_lit: bool, temporal_reuse: bool, no_texture: bool,
               track_spatial: bool, render_size, surface=None):
    """One lighting channel.

    g: render-res G-buffer sample. prev_r: previous temporal reservoir
    already gathered at reproj coords (dict). prev_spatial_packed: packed
    previous-spatial tensor (or None when no spatial consumer exists —
    track_spatial=False skips the reference's dead invalidation scatters).
    Returns dict(render, variance, temporal, prev_spatial_packed, reservoir,
    surface, view_dir, valid).
    """
    h, w = render_size
    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON

    s = make_sample_from_gbuffer(g, noise_rand, render_size)
    if surface is None:
        surface = primary_surface(scene, g, no_texture)

    r, reproj_ok = rsv.check_previous_reservoir(prev_r, s)
    if track_spatial:
        # cross-pixel invalidation scatter (light.wgsl:1092-1095)
        prev_spatial_packed = rsv.scatter_reservoir_packed(
            prev_spatial_packed, reproj["piy"], reproj["pix"], r,
            (~reproj_ok) & reproj["in_loose"] & valid)

    validate_interval = (frame["emissive_validate_interval"] if emissive_lit
                         else frame["direct_validate_interval"])
    is_validation = (frame["number"] % jnp.maximum(validate_interval, 1)) == 0

    pos_f = _flat(s["visible_position"][..., :3])
    nrm_f = _flat(s["visible_normal"])
    rand_f = _flat(s["random"])
    inst_f = _flat(s["visible_instance"])

    def sample_branch(r):
        cand, info = select_light_candidate(
            scene, tracer, rand_f, pos_f, nrm_f, inst_f,
            frame["solar_angle"], sample_emissive=emissive_lit)
        ro = pos_f + nrm_f * RAY_BIAS
        rd = cand["direction"]
        trace_ok = (dot3(rd, nrm_f) > 0.0) & (cand["p"] > 0.0)
        if emissive_lit:
            trace_ok &= cand["emissive_instance"] >= 0
        shadow_trace = getattr(tracer, "shadow", tracer)
        hit = shadow_trace(scene, ro, rd, cand["max_distance"],
                           cand["emissive_instance"], None,
                           cand["min_distance"], shape2d=render_size)
        info = occlude_hit_info(ro, rd, hit, info)
        rad = input_radiance(
            scene, rd, info["instance"], info["material"], info["uv"],
            sample_directional=not emissive_lit,
            sample_emissive=cand["emissive_instance"],
            sample_ambient=False, solar_angle=frame["solar_angle"],
            no_texture=no_texture)
        rad = jnp.where(trace_ok[:, None], rad, 0.0)

        s2 = dict(s)
        s2["radiance"] = _unflat(rad, render_size)
        s2["sample_position"] = _unflat(info["position"], render_size)
        s2["sample_normal"] = _unflat(info["normal"], render_size)
        w_new = jnp.where(cand["p"] > 0.0,
                          luminance(rad[:, :3]) / jnp.maximum(cand["p"], 1e-30),
                          0.0)
        w_new = _unflat(w_new, render_size)
        gate = jnp.where(is_validation, r["count"] < VALIDATION_COUNT_THRESHOLD,
                         True) & valid
        r2 = rsv.temporal_restir(r, s2, w_new, frame["max_temporal_reuse_count"],
                                 gate)
        return r2, s2

    if not temporal_reuse and not track_spatial:
        # Static no-reuse specialization (the flagship BASELINE config):
        # with an EMPTY previous reservoir the WRS update always replaces
        # (count 0 -> 1 at rand < w/w), the temporal clamp is a no-op,
        # finalize gives w = w_new / lum(rad), and the stored variance
        # (w2/c - (w/c)^2 at c=1) is identically ZERO — so the whole
        # reservoir algebra reduces to plain NEE with the SAME values,
        # skipping ~15 full-res passes per channel.
        cand, info = select_light_candidate(
            scene, tracer, rand_f, pos_f, nrm_f, inst_f,
            frame["solar_angle"], sample_emissive=emissive_lit)
        ro = pos_f + nrm_f * RAY_BIAS
        rd = cand["direction"]
        trace_ok = (dot3(rd, nrm_f) > 0.0) & (cand["p"] > 0.0)
        if emissive_lit:
            trace_ok &= cand["emissive_instance"] >= 0
        shadow_trace = getattr(tracer, "shadow", tracer)
        hit = shadow_trace(scene, ro, rd, cand["max_distance"],
                           cand["emissive_instance"], None,
                           cand["min_distance"], shape2d=render_size)
        info = occlude_hit_info(ro, rd, hit, info)
        rad = input_radiance(
            scene, rd, info["instance"], info["material"], info["uv"],
            sample_directional=not emissive_lit,
            sample_emissive=cand["emissive_instance"],
            sample_ambient=False, solar_angle=frame["solar_angle"],
            no_texture=no_texture)
        rad = jnp.where(trace_ok[:, None], rad, 0.0)
        lum = luminance(rad[:, :3])
        w_new = jnp.where(cand["p"] > 0.0,
                          lum / jnp.maximum(cand["p"], 1e-30), 0.0)
        w_f = jnp.where(lum > 0.0, w_new / jnp.maximum(lum, 1e-30), 0.0)
        w2d = jnp.where(valid, _unflat(w_f, render_size), 0.0)

        view_dir = calculate_view(view, g["position"][..., :3])
        sample_pos = _unflat(info["position"], render_size)
        l_dir = normalize(sample_pos[..., :3]
                          - s["visible_position"][..., :3])
        out = shading(scene, view_dir, s["visible_normal"], l_dir, surface,
                      _unflat(rad, render_size)) * w2d[..., None]
        if not emissive_lit:
            out = out + compute_emissive_radiance(surface["emissive"])
        render = jnp.where(
            valid[..., None],
            jnp.concatenate([out, jnp.ones_like(depth)[..., None]], -1), 0.0)
        zero = jnp.zeros((h, w))
        empty = rsv.empty_reservoir(render_size)
        return {"render": render, "variance": zero, "temporal": empty,
                "prev_spatial_packed": prev_spatial_packed,
                "reservoir": empty, "surface": surface,
                "view_dir": view_dir, "valid": valid}

    r, s = sample_branch(r)

    def validation_branch(args):
        r, s, prev_spatial_packed = args
        r_rand = _flat(r["random"])
        r_pos = _flat(r["visible_position"][..., :3])
        r_nrm = _flat(r["visible_normal"])
        cand, info = select_light_candidate(
            scene, tracer, r_rand, r_pos, r_nrm, inst_f,
            frame["solar_angle"], sample_emissive=emissive_lit)
        ro = pos_f + nrm_f * RAY_BIAS
        rd = normalize(_flat(r["sample_position"][..., :3]) - pos_f)
        trace_ok = (dot3(cand["direction"], r_nrm) > 0.0) & (cand["p"] > 0.0)
        if emissive_lit:
            trace_ok &= cand["emissive_instance"] >= 0
        shadow_trace = getattr(tracer, "shadow", tracer)
        hit = shadow_trace(scene, ro, rd, cand["max_distance"],
                           cand["emissive_instance"], None,
                           cand["min_distance"], shape2d=render_size)
        info = occlude_hit_info(ro, rd, hit, info)
        vrad = input_radiance(
            scene, rd, info["instance"], info["material"], info["uv"],
            sample_directional=not emissive_lit,
            sample_emissive=cand["emissive_instance"],
            sample_ambient=False, solar_angle=frame["solar_angle"],
            no_texture=no_texture)
        vrad = jnp.where(trace_ok[:, None], vrad, 0.0)
        vrad2 = _unflat(vrad, render_size)

        reuse_validate = r["count"] >= VALIDATION_COUNT_THRESHOLD
        s2 = dict(s)
        for key, val in (("random", r["random"]),
                         ("sample_position", _unflat(info["position"], render_size)),
                         ("sample_normal", _unflat(info["normal"], render_size)),
                         ("radiance", vrad2)):
            m = reuse_validate[..., None] if s2[key].ndim == 3 else reuse_validate
            s2[key] = jnp.where(m, val, s2[key])

        lum_ratio = luminance(vrad2[..., :3]) / jnp.maximum(
            luminance(r["radiance"][..., :3]), 1e-4)
        lum_miss = ((lum_ratio > 1.25) | (lum_ratio < 0.8)) & valid

        if track_spatial:
            prev_spatial_packed = rsv.scatter_reservoir_packed(
                prev_spatial_packed, reproj["piy"], reproj["pix"], r,
                lum_miss & reproj["in_loose"])
        w_new = jnp.where(_unflat(cand["p"], render_size) > 0.0,
                          luminance(s2["radiance"][..., :3])
                          / jnp.maximum(_unflat(cand["p"], render_size), 1e-30),
                          0.0)
        r2 = rsv.where_reservoir(lum_miss, rsv.set_reservoir(s2, w_new), r)
        return r2, s2, prev_spatial_packed

    # With temporal reuse off the reservoir only ever holds THIS frame's
    # fresh sample, so the validation re-trace (light.wgsl:1156-1213, which
    # guards stale *carried* reservoirs) would re-trace the identical sample
    # and change nothing — skip it statically (pipeline-key specialization,
    # like the reference's shader-def variants).
    if not temporal_reuse:
        pass
    elif prev_spatial_packed is None:
        dummy = jnp.zeros((1, 1, rsv.PACKED_WIDTH))
        r, s, _ = jax.lax.cond(
            is_validation,
            lambda a: validation_branch((a[0], a[1], None))[:2] + (a[2],),
            lambda a: a, (r, s, dummy))
    else:
        r, s, prev_spatial_packed = jax.lax.cond(
            is_validation, validation_branch, lambda a: a,
            (r, s, prev_spatial_packed))

    r = rsv.finalize_w(r, luminance(r["radiance"][..., :3]))
    r["visible_position"] = s["visible_position"]
    r["visible_normal"] = s["visible_normal"]
    r["lifetime"] = r["lifetime"] + 1.0

    variance = jnp.where(valid, rsv.reservoir_variance(r), 0.0)
    r = rsv.zero_where(~valid, r)

    # shade (light.wgsl:1233-1259)
    view_dir = calculate_view(view, g["position"][..., :3])
    l_dir = normalize(r["sample_position"][..., :3] - r["visible_position"][..., :3])
    out = shading(scene, view_dir, r["visible_normal"], l_dir, surface,
                  r["radiance"]) * r["w"][..., None]
    if not emissive_lit:  # RENDER_EMISSIVE: the direct channel adds emission
        out = out + compute_emissive_radiance(surface["emissive"])
    render = jnp.where(valid[..., None],
                       jnp.concatenate([out, jnp.ones_like(depth)[..., None]], -1),
                       0.0)
    return {"render": render, "variance": variance, "temporal": r,
            "prev_spatial_packed": prev_spatial_packed, "reservoir": r,
            "surface": surface, "view_dir": view_dir, "valid": valid}


def emissive_surface_channel(scene, g, no_texture: bool, render_size,
                             surface=None):
    """Direct channel specialization for scenes with NO directional light
    (e.g. cornell.rs spawns no sun): the solar NEE term is identically zero,
    so only RENDER_EMISSIVE's surface-emission add remains
    (light.wgsl:1237-1247) — zero rays, zero reservoir state. The reference
    still dispatches direct_lit in this case; skipping it statically is a
    pure win (one full-scene shadow trace per frame)."""
    h, w = render_size
    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON
    if surface is None:
        surface = primary_surface(scene, g, no_texture)
    out = compute_emissive_radiance(surface["emissive"])
    render = jnp.where(valid[..., None],
                       jnp.concatenate([out, jnp.ones_like(depth)[..., None]],
                                       -1), 0.0)
    return {"render": render, "variance": jnp.zeros((h, w)),
            "temporal": rsv.empty_reservoir(render_size),
            "prev_spatial_packed": None, "reservoir": None,
            "surface": surface, "view_dir": None, "valid": valid}


# ---------------------------------------------------------------------------
# indirect channel (light.wgsl:1264-1498)
# ---------------------------------------------------------------------------

def indirect_lit_ambient(scene, tracer, g, view, frame, noise_rand, reproj,
                         prev_r, prev_spatial_packed, *,
                         bounces: int, temporal_reuse: bool, no_texture: bool,
                         track_spatial: bool, render_size, surface=None):
    h, w = render_size
    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON

    if bounces == 0:
        zeroes = rsv.empty_reservoir(render_size)
        return {"render": jnp.zeros((h, w, 4)),
                "variance": jnp.zeros((h, w)),
                "temporal": zeroes,
                "prev_spatial_packed": prev_spatial_packed,
                "reservoir": zeroes, "valid": valid,
                "surface": None, "view_dir": None}

    normal = normalize(g["normal"])
    s = make_sample_from_gbuffer(g, noise_rand, render_size)
    s["visible_normal"] = normal

    n_pix = h * w
    b_pos = _flat(s["visible_position"][..., :3])
    b_nrm = _flat(normal)
    b_rand = _flat(noise_rand)
    transport = jnp.ones((n_pix, 3))
    total_rad = jnp.zeros((n_pix, 4))
    first_sample_pos = jnp.zeros((n_pix, 4))
    first_sample_nrm = jnp.zeros((n_pix, 3))
    pdf = jnp.zeros((n_pix,))
    alive = jnp.ones((n_pix,), bool)

    for n in range(bounces):
        local, bounce_pdf = sample_cosine_hemisphere(b_rand[:, :2])
        rd = apply_normal_basis(b_nrm, local)
        ro = b_pos + b_nrm * RAY_BIAS
        info = tracer.with_info(scene, ro, rd, jnp.full((n_pix,), F32_MAX),
                                shape2d=render_size, incoherent=True)
        hit_ok = info["instance"] >= 0

        if n == 0:
            first_sample_pos = info["position"]
            first_sample_nrm = info["normal"]
            pdf = bounce_pdf

        # bounce-hit surface (secondary, data-dependent uv — stays on the
        # XLA gather path; named b_surface so it cannot shadow the shared
        # primary `surface` argument)
        b_surface = retrieve_surface(scene, info["material"], info["uv"],
                                     no_texture)
        b_surface = dict(b_surface)
        b_surface["roughness"] = jnp.ones_like(b_surface["roughness"])

        cand, cinfo = select_light_candidate(
            scene, tracer, b_rand, info["position"][..., :3], info["normal"],
            info["instance"], frame["solar_angle"], sample_emissive=True)
        sample_directional = cand["emissive_instance"] < 0
        bounce_view = normalize(b_pos - info["position"][..., :3])

        nee_ok = (dot3(cand["direction"], info["normal"]) > 0.0) & (cand["p"] > 0.0)
        ro2 = info["position"][..., :3] + info["normal"] * RAY_BIAS
        shadow_trace = getattr(tracer, "shadow", tracer)
        hit2 = shadow_trace(scene, ro2, cand["direction"],
                            cand["max_distance"], cand["emissive_instance"],
                            None, cand["min_distance"], shape2d=render_size,
                            incoherent=True)
        cinfo = occlude_hit_info(ro2, cand["direction"], hit2, cinfo)
        in_rad = input_radiance(
            scene, cand["direction"], cinfo["instance"], cinfo["material"],
            cinfo["uv"], sample_directional=True,
            sample_emissive=cand["emissive_instance"], sample_ambient=False,
            solar_angle=frame["solar_angle"], no_texture=no_texture)
        in_rad = jnp.where(
            sample_directional[:, None]
            | (cinfo["instance"] == cand["emissive_instance"])[:, None],
            in_rad,
            jnp.concatenate([jnp.zeros((n_pix, 3)), in_rad[:, 3:4]], -1))
        out_rad = shading(scene, bounce_view, info["normal"],
                          cand["direction"], b_surface, in_rad)
        out_rad = out_rad / jnp.maximum(cand["p"][:, None], 1e-30)
        if n > 0:
            out_rad = jnp.where(bounce_pdf[:, None] < 0.01, 0.0,
                                out_rad / jnp.maximum(bounce_pdf[:, None], 1e-30))
        lum = luminance(out_rad)
        scale = jnp.where(lum > frame["max_indirect_luminance"],
                          frame["max_indirect_luminance"] / jnp.maximum(lum, 1e-30),
                          1.0)
        out_rad = out_rad * scale[:, None]
        add_hit = jnp.where((alive & hit_ok & nee_ok)[:, None],
                            transport * out_rad, 0.0)
        total_rad = total_rad + jnp.concatenate(
            [add_hit, (alive & hit_ok & nee_ok).astype(jnp.float32)[:, None]], -1)

        amb = scene["ambient_color"][:3]
        add_miss = jnp.where((alive & ~hit_ok)[:, None], transport * amb, 0.0)
        total_rad = total_rad + jnp.concatenate(
            [add_miss, jnp.zeros((n_pix, 1))], -1)

        transport = jnp.where(
            (alive & hit_ok)[:, None],
            transport * env_brdf(b_surface, bounce_view, info["normal"]),
            transport)
        alive = alive & hit_ok & jnp.any(transport > 0.01, axis=-1)
        b_rand = jnp.mod(b_rand + frame["number"].astype(jnp.float32) * GOLDEN_RATIO, 1.0)
        b_pos = jnp.where(hit_ok[:, None], info["position"][..., :3], b_pos)
        b_nrm = jnp.where(hit_ok[:, None], info["normal"], b_nrm)

    s["radiance"] = _unflat(total_rad, render_size)
    s["radiance"] = s["radiance"].at[..., 3].set(
        jnp.minimum(s["radiance"][..., 3], 1.0))
    s["sample_position"] = _unflat(first_sample_pos, render_size)
    s["sample_normal"] = _unflat(first_sample_nrm, render_size)

    # temporal ReSTIR (light.wgsl:1452-1497)
    if surface is None:
        surface = primary_surface(scene, g, no_texture)
    view_dir = calculate_view(view, g["position"][..., :3])
    sample_rad = shading(
        scene, view_dir, s["visible_normal"],
        normalize(s["sample_position"][..., :3] - s["visible_position"][..., :3]),
        surface, s["radiance"])
    pdf2 = _unflat(pdf, render_size)
    lum_s = luminance(sample_rad)
    w_new = jnp.where(pdf2 > 0.0,
                      lum_s / jnp.maximum(pdf2, 1e-30), 0.0)

    if not temporal_reuse and not track_spatial:
        # static no-reuse specialization: the single-sample reservoir
        # algebra reduces to sample_rad / pdf with zero stored variance
        # (see direct_lit's fast path for the derivation)
        w2d = jnp.where(valid & (lum_s > 0.0),
                        w_new / jnp.maximum(lum_s, 1e-30), 0.0)
        render = jnp.where(valid[..., None], jnp.concatenate(
            [sample_rad * w2d[..., None], jnp.ones((h, w, 1))], -1), 0.0)
        empty = rsv.empty_reservoir(render_size)
        return {"render": render, "variance": jnp.zeros((h, w)),
                "temporal": empty, "prev_spatial_packed": prev_spatial_packed,
                "reservoir": empty, "surface": surface,
                "view_dir": view_dir, "valid": valid}

    r, reproj_ok = rsv.check_previous_reservoir(prev_r, s)
    if track_spatial:
        prev_spatial_packed = rsv.scatter_reservoir_packed(
            prev_spatial_packed, reproj["piy"], reproj["pix"], r,
            (~reproj_ok) & reproj["in_loose"] & valid)
    r = rsv.temporal_restir(r, s, w_new, frame["max_temporal_reuse_count"], valid)

    out_rad = shading(
        scene, view_dir, r["visible_normal"],
        normalize(r["sample_position"][..., :3] - r["visible_position"][..., :3]),
        surface, r["radiance"])
    r = rsv.finalize_w(r, luminance(out_rad))
    r["visible_position"] = s["visible_position"]
    r["visible_normal"] = s["visible_normal"]
    r["lifetime"] = r["lifetime"] + 1.0

    variance = jnp.where(valid, rsv.reservoir_variance(r), 0.0)
    r = rsv.zero_where(~valid, r)

    render = jnp.where(valid[..., None], jnp.concatenate(
        [out_rad * r["w"][..., None], jnp.ones((h, w, 1))], -1), 0.0)
    return {"render": render, "variance": variance, "temporal": r,
            "prev_spatial_packed": prev_spatial_packed, "reservoir": r,
            "surface": surface, "view_dir": view_dir, "valid": valid}


# ---------------------------------------------------------------------------
# spatial reuse (light.wgsl:1503-1684)
# ---------------------------------------------------------------------------

def compute_jacobian(q_s, s):
    """GRIS Jacobian (light.wgsl:985-1004): q = neighbor, s = current."""
    n = q_s["sample_normal"]
    to_r = normalize(s["visible_position"][..., :3] - q_s["sample_position"][..., :3])
    to_q = normalize(q_s["visible_position"][..., :3] - q_s["sample_position"][..., :3])
    cos1 = jnp.abs(dot3(to_r, n))
    cos2 = jnp.abs(dot3(to_q, n))
    term1 = cos1 / jnp.maximum(cos2, 1e-4)
    num = jnp.sum((q_s["visible_position"][..., :3]
                   - q_s["sample_position"][..., :3]) ** 2, -1)
    den = jnp.sum((s["visible_position"][..., :3]
                   - q_s["sample_position"][..., :3]) ** 2, -1)
    term2 = num / jnp.maximum(den, 1e-4)
    return jnp.clip(term1 * term2, 1.0, 50.0)


def spatial_reuse(scene, g, view, frame, temporal_r, prev_spatial_packed,
                  reproj, *, emissive_lit: bool, no_texture: bool,
                  render_size, scramble_bits=None, surface=None):
    """Spatial ReSTIR pass for the emissive / indirect channels.

    temporal_r: this frame's temporal reservoirs. Neighbor taps are rolls of
    the packed temporal tensor (per-frame-correlated spiral, see module
    docstring). scramble_bits (optional [h,w] int32 in 0..3, blue-noise):
    per-pixel decorrelation of the spiral — each pixel picks one of the four
    90-degree rotations of the frame's spiral, so neighbor taps are no
    longer identically offset across the image (the gather-free analog of
    the reference's per-pixel spiral scramble, light.wgsl:1566-1572; enabled
    by HikariSettings.spatial_tap_scramble). Returns dict(render,
    variance(NaN where untouched), spatial (dict), valid).
    """
    h, w = render_size
    count_taps = 8 if emissive_lit else 16
    reuse_range = 10.0 if emissive_lit else 20.0
    spatial_taps = 4

    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON
    if surface is None:
        surface = primary_surface(scene, g, no_texture)
    view_dir = calculate_view(view, g["position"][..., :3])

    q0 = temporal_r
    s = {k: q0[k] for k in ("radiance", "random", "visible_position",
                            "visible_normal", "visible_instance",
                            "sample_position", "sample_normal")}
    use_spatial_variance = q0["count"] <= SPATIAL_VARIANCE_SAMPLE_THRESHOLD

    prev_sp = rsv.gather_reservoir_packed(
        prev_spatial_packed, reproj["piy"], reproj["pix"], reproj["in_strict"])

    max_life = jnp.where(frame["max_reservoir_lifetime"] <= 1.0, F32_MAX,
                         frame["max_reservoir_lifetime"])
    keep_history = q0["lifetime"] <= max_life
    r = rsv.where_reservoir(keep_history, prev_sp, q0)

    if emissive_lit:
        merge_w0 = luminance(q0["radiance"][..., :3])
    else:
        merge_w0 = luminance(shading(
            scene, view_dir, s["visible_normal"],
            normalize(s["sample_position"][..., :3]
                      - s["visible_position"][..., :3]),
            surface, s["radiance"]))
    r = rsv.merge_reservoir(r, q0, merge_w0, valid)
    r["visible_position"] = s["visible_position"]
    r["visible_normal"] = s["visible_normal"]

    temporal_packed = rsv.pack_reservoir(temporal_r)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    frame_rand = random_float(frame["number"][None])[0]

    def tap_body(i, r):
        fi = i.astype(jnp.float32)
        # per-frame-rotated Fibonacci spiral (light.wgsl:1566-1572, with the
        # per-pixel scramble traded for rolls — see module docstring)
        angle = TAU * jnp.mod(fi * GOLDEN_RATIO + frame_rand, 1.0)
        radius = jnp.sqrt(fi / count_taps) * reuse_range
        off_x = radius * jnp.cos(angle)
        off_y = radius * jnp.sin(angle)

        # with scrambling: evaluate the tap at all four 90° rotations of the
        # spiral (cheap rolls) and let each pixel pick one by blue noise
        variants = [(off_y, off_x)]
        if scramble_bits is not None:
            variants = [(off_y, off_x), (off_x, -off_y),
                        (-off_y, -off_x), (-off_x, off_y)]

        tap_interval = jnp.maximum(1.0, radius / (spatial_taps + 1))
        tap_count = (radius / tap_interval).astype(jnp.int32)
        inv_len = 1.0 / jnp.maximum(radius, 1e-5)

        q_packs, s_depths, in_bs, occs = [], [], [], []
        for off_y_v, off_x_v in variants:
            oy = jnp.round(off_y_v).astype(jnp.int32)
            ox = jnp.round(off_x_v).astype(jnp.int32)
            q_packs.append(roll2d(temporal_packed, oy, ox))
            sdep = roll2d(depth, oy, ox)
            s_depths.append(sdep)
            in_bs.append(((ys + oy) >= 0) & ((ys + oy) < h)
                         & ((xs + ox) >= 0) & ((xs + ox) < w))
            # screen-space depth ray-march occlusion (light.wgsl:1608-1628)
            occluded = jnp.zeros((h, w), bool)
            for j in range(1, spatial_taps + 2):
                tap_on = j <= tap_count
                tdist = j * tap_interval
                toy = jnp.round(tdist * off_y_v * inv_len).astype(jnp.int32)
                tox = jnp.round(tdist * off_x_v * inv_len).astype(jnp.int32)
                tap_depth = roll2d(depth, toy, tox)
                ref_depth = depth + (sdep - depth) * (
                    j / (tap_count.astype(jnp.float32) + 1.0))
                occluded |= tap_on & (tap_depth > ref_depth + 1e-5)
            occs.append(occluded)

        if len(variants) == 1:
            q_pack, sample_depth, in_b, occluded = (
                q_packs[0], s_depths[0], in_bs[0], occs[0])
        else:
            def pick(vals, nd):
                out = vals[0]
                for k in range(1, 4):
                    m = scramble_bits == k
                    out = jnp.where(m[..., None] if nd == 3 else m,
                                    vals[k], out)
                return out

            q_pack = pick(q_packs, 3)
            sample_depth = pick(s_depths, 2)
            in_b = pick(in_bs, 2)
            occluded = pick(occs, 2)

        q = rsv.unpack_reservoir(q_pack)
        depth_ratio = depth / jnp.where(sample_depth == 0.0, 1e-30, sample_depth)
        ok = in_b & (depth_ratio >= 0.9) & (depth_ratio <= 1.1)
        ok &= q["count"] >= F32_EPSILON
        ok &= dot3(s["visible_normal"], q["visible_normal"]) >= 0.866
        sample_dir = normalize(q["sample_position"][..., :3]
                               - s["visible_position"][..., :3])
        ok &= dot3(sample_dir, s["visible_normal"]) >= 0.0
        ok &= ~occluded

        jac = jnp.where(q["sample_position"][..., 3] > 0.5,
                        compute_jacobian(q, s), 1.0)
        if emissive_lit:
            mw = luminance(q["radiance"][..., :3]) / jac
        else:
            mw = luminance(shading(scene, view_dir, s["visible_normal"],
                                   sample_dir, surface, q["radiance"])) / jac
        return rsv.merge_reservoir(r, q, mw, ok & valid)

    r = jax.lax.fori_loop(1, count_taps + 1, tap_body, r)

    r = rsv.clamp_reservoir(r, frame["max_spatial_reuse_count"])

    out_rad = shading(scene, view_dir, s["visible_normal"],
                      normalize(r["sample_position"][..., :3]
                                - s["visible_position"][..., :3]),
                      surface, r["radiance"])
    target_lum = (luminance(r["radiance"][..., :3]) if emissive_lit
                  else luminance(out_rad))
    r = rsv.finalize_w(r, target_lum)
    r["lifetime"] = r["lifetime"] + 1.0

    variance = jnp.where(valid & use_spatial_variance,
                         rsv.reservoir_variance(r), jnp.nan)

    r = rsv.where_reservoir(valid, r, q0)  # background stores temporal r
    render = jnp.where(valid[..., None], jnp.concatenate(
        [r["w"][..., None] * out_rad, jnp.ones((h, w, 1))], -1), 0.0)
    return {"render": render, "variance": variance, "spatial": r,
            "valid": valid}
