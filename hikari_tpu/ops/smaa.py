"""Filmic SMAA TU4X checkerboard temporal upscaler (smaa.wgsl:81-271).

Renders at half size with alternating diagonal jitter; each frame fills 2 of
the 4 pixels of every output quad (current sample + reprojected history with
clip rejection), and `extrapolate` fills the other diagonal by differential
blending of N/E/S/W luminance gradients.

TPU formulation (scatter- and gather-free where possible):
* writes to the 2 diagonal output pixels (smaa.wgsl:224-228) become quad
  planes P00/P11/P01/P10 interleaved at the end — no scatters;
* all taps at `previous_output_uv` (+static biases) are AFFINE maps of the
  pixel grid -> parity-selected slices/shifts;
* only the velocity-reprojected history taps need real warps — one warp
  window over the previous tone output, one over the previous G-buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.ops.warp2 import warp_multi
from hikari_tpu.ops.warp_band import warp_band
from hikari_tpu.utils.math import (
    TAU,
    clip_towards_aabb_center,
    luminance,
    rgb_to_ycocg,
    ycocg_to_rgb,
)

_BIAS = 2.5


def np_floor(x: float) -> int:
    import math

    return int(math.floor(x))



def _shift(img, dy, dx):
    """Static shift with clamp-to-edge via pad + static slice (int-array
    indexing lowers to slow XLA column gathers)."""
    h, w = img.shape[:2]
    p = jnp.pad(img, ((abs(dy), abs(dy)), (abs(dx), abs(dx)))
                + ((0, 0),) * (img.ndim - 2), mode="edge")
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(p, abs(dy) + dy, abs(dy) + dy + h, axis=0),
        abs(dx) + dx, abs(dx) + dx + w, axis=1)


def _parity_ctx(full, render_size):
    """Shared decimation context: out = full[2c + parity + k] for ANY
    integer bias k becomes a cheap static shift of one of FOUR stride-2
    decimations (built from ONE reshape — stride-2 reads cost ~20x a
    static slice on this TPU; ~29 per-offset strided samples collapsed to
    12 plane passes)."""
    h, w = render_size
    H, W = full.shape[:2]
    if H < 2 * h or W < 2 * w:
        return ("direct", full)
    q = full[:2 * h, :2 * w].reshape(h, 2, w, 2, full.shape[-1])
    return ("quad", {(a, b): q[:, a, :, b] for a in (0, 1) for b in (0, 1)})


def _parity_sample_ctx(ctx, parity, render_size, ky: int = 0, kx: int = 0):
    kind, data = ctx
    if kind == "direct":
        return _parity_sample(data, parity, render_size, ky, kx)

    def pick(jy, jx):
        a, sy = jy % 2, jy // 2
        b, sx = jx % 2, jx // 2
        return _shift(data[(a, b)], sy, sx)

    return jnp.where(parity == 0, pick(ky, kx), pick(ky + 1, kx + 1))


def _parity_sample_generic(full, parity, render_size, ky: int = 0,
                           kx: int = 0):
    """Arbitrary-ratio path (Upscale::ratio anywhere in [1,2],
    lib.rs:474-513): the output grid is 2x render_size, the G-buffer is at
    window size — nearest-sample it at output coords via separable axis
    takes (correctness path; the ratio-1/2 fast paths use static slices)."""
    h, w = render_size
    H, W = full.shape[:2]
    oh, ow = 2 * h, 2 * w

    def take(j):
        ys = jnp.clip(jnp.floor(
            (2.0 * jnp.arange(h) + j + ky + 0.5) * (H / oh)
        ).astype(jnp.int32), 0, H - 1)
        xs = jnp.clip(jnp.floor(
            (2.0 * jnp.arange(w) + j + kx + 0.5) * (W / ow)
        ).astype(jnp.int32), 0, W - 1)
        return jnp.take(jnp.take(full, ys, axis=0), xs, axis=1)

    return jnp.where(parity == 0, take(0), take(1))


def _parity_sample(full, parity, render_size, ky: int = 0, kx: int = 0):
    """`full` [H2,W2,C] sampled (nearest) at output coords (2c + parity + k)
    for each render-res pixel c, where the output grid is 2x render_size.

    The index map is strided-affine (stride H2/(2*rh), static offset per
    parity), so this compiles to parity-selected STATIC strided slices of an
    edge-padded copy — int-array indexing here lowered to XLA column
    gathers, which cost ~100x more (measured). Supports full == output size
    (ratio 2) and full == render size (ratio-1 supersampling)."""
    import math

    h2, w2 = full.shape[:2]
    rh, rw = render_size
    if h2 not in (rh, 2 * rh) or w2 not in (rw, 2 * rw):
        return _parity_sample_generic(full, parity, render_size, ky, kx)
    stride_y = 2 if h2 == 2 * rh else 1
    stride_x = 2 if w2 == 2 * rw else 1
    pad = 8
    fp = jnp.pad(full, ((pad, pad), (pad, pad), (0, 0)), mode="edge")

    def sl(j):
        oy = int(math.floor((j + ky + 0.5) * (h2 / (2.0 * rh)) - 0.5 + 0.5))
        ox = int(math.floor((j + kx + 0.5) * (w2 / (2.0 * rw)) - 0.5 + 0.5))
        return jax.lax.slice(
            fp,
            (pad + oy, pad + ox, 0),
            (pad + oy + stride_y * (rh - 1) + 1,
             pad + ox + stride_x * (rw - 1) + 1, fp.shape[2]),
            (stride_y, stride_x, 1))

    return jnp.where(parity == 0, sl(0), sl(1))


def smaa_tu4x(gbuf, prev_gbuf, prev_tone, tone, frame, render_size,
              quads=None):
    """Pass 1 + 2; returns [2rh, 2rw, 4]. gbuf/prev_gbuf at output (full)
    res; tone/prev_tone at render res."""
    rh, rw = render_size
    oh, ow = 2 * rh, 2 * rw
    texel = jnp.array([1.0 / ow, 1.0 / oh], jnp.float32)

    cur_j = jnp.where((frame["number"] & 1) == 0, 0, 1).astype(jnp.int32)
    prev_j = 1 - cur_j

    current_color = tone[..., :3]

    # ---- velocity at previous_output_uv with 4-diagonal max-depth dilation
    # (all affine: shared parity-decimation ctx + static shifts). Only the
    # channels SMAA actually reads ride the ctx: depth (position.w),
    # velocity.xy, instance — 4 decimated channels instead of 10.
    if quads is None:
        pos_ctx = _parity_ctx(gbuf["position"][..., 3:4], render_size)
        vel_ctx = _parity_ctx(gbuf["velocity_uv"][..., :2], render_size)
        inst_ctx = _parity_ctx(gbuf["instance_material"][..., 0:1],
                               render_size)
    else:
        # precomputed parity-quad planes (prepass_fused_quads): identical
        # values to the quad decimation above, no relayout passes
        pos_ctx = ("quad", {k: q["depth"][..., None]
                            for k, q in quads.items()})
        vel_ctx = ("quad", {k: q["velocity"] for k, q in quads.items()})
        inst_ctx = ("quad", {k: q["instance"][..., None]
                             for k, q in quads.items()})

    def pos_at(ky, kx):
        return _parity_sample_ctx(pos_ctx, prev_j, render_size, ky, kx)

    depth0 = pos_at(0, 0)[..., 0]
    d_pp = pos_at(1, 1)[..., 0]
    d_np = pos_at(1, -1)[..., 0]
    d_pn = pos_at(-1, 1)[..., 0]
    d_nn = pos_at(-1, -1)[..., 0]
    depths = jnp.stack([d_pp, d_np, d_pn, d_nn], -1)
    max_depth = jnp.max(depths, -1)
    is_max = depths == max_depth[..., None]
    ox = jnp.sum(is_max * jnp.array([1.0, -1.0, 1.0, -1.0]), -1).astype(jnp.int32)
    oy = jnp.sum(is_max * jnp.array([1.0, 1.0, -1.0, -1.0]), -1).astype(jnp.int32)
    dilate = depth0 < max_depth
    vel = _parity_sample_ctx(vel_ctx, prev_j, render_size)[..., :2]
    for sy_ in (-1, 1):
        for sx_ in (-1, 1):
            cand = _parity_sample_ctx(vel_ctx, prev_j, render_size,
                                      sy_, sx_)[..., :2]
            take = dilate & (oy == sy_) & (ox == sx_)
            vel = jnp.where(take[..., None], cand, vel)
    velocity = vel

    # previous_output_uv (output space) and reprojected source coords
    cy = (2.0 * jnp.arange(rh, dtype=jnp.float32)[:, None].repeat(rw, 1)
          + prev_j.astype(jnp.float32) + 0.5)
    cx = (2.0 * jnp.arange(rw, dtype=jnp.float32)[None, :].repeat(rh, 0)
          + prev_j.astype(jnp.float32) + 0.5)
    reproj_uy = cy / oh - velocity[..., 1]
    reproj_ux = cx / ow - velocity[..., 0]
    boundary_miss = ((reproj_ux < 0.0) | (reproj_ux > 1.0)
                     | (reproj_uy < 0.0) | (reproj_uy > 1.0))

    # warp windows: previous tone (render res; banded channel-plane warp —
    # same row grid as the output) and previous G-buffer (full res; v2 warp
    # — its 2:1 source/output row ratio stays on the proportional-shard
    # pack path)
    from hikari_tpu.parallel import shard as _sh

    tone_sy = reproj_uy * rh - 0.5
    tone_sx = reproj_ux * rw - 0.5
    pc_p, = warp_band([jnp.moveaxis(prev_tone[..., :3], -1, 1)],
                      ("nearest",), tone_sy, tone_sx,
                      mesh=_sh.active_mesh())
    prev_color = jnp.moveaxis(pc_p, 1, -1)

    # footprint MAX of previous depth replaces the 5-bias x 4-corner probes
    # (smaa.wgsl:147-155 — ANY-over-footprint; see taa.py for the identity)
    pdepth_full = prev_gbuf["position"][..., 3]
    # separable max-pool (square footprint): 2r passes instead of (2r+1)^2-1
    pooled_y = pdepth_full
    for dy in (-3, -2, -1, 1, 2, 3):
        pooled_y = jnp.maximum(pooled_y, _shift(pdepth_full, dy, 0))
    pooled = pooled_y
    for dx in (-3, -2, -1, 1, 2, 3):
        pooled = jnp.maximum(pooled, _shift(pooled_y, 0, dx))

    # instance ids ride the bf16 window as id mod 256 — exactly
    # representable in bf16 for ANY instance count (ids > 256 would
    # otherwise collide with bf16's 8-bit mantissa); the comparison below
    # wraps both sides, so only ids exactly 256 apart alias (and those are
    # still gated by depth/velocity)
    pg = jnp.concatenate([pooled[..., None],
                          jnp.mod(prev_gbuf["instance_material"][..., 0:1],
                                  256.0),
                          prev_gbuf["velocity_uv"][..., :2]], -1)

    cur_instance = jnp.mod(
        _parity_sample_ctx(inst_ctx, prev_j, render_size)[..., 0], 256.0)
    cur_depth = depth0

    # bf16 window: exact for depth-ratio (5% threshold), velocity (1e-4
    # threshold) and the mod-256 instance ids
    aux, = warp_multi(pg, reproj_uy * oh - 0.5, reproj_ux * ow - 0.5,
                      [("nearest", (0.0, 0.0), (0, 4))],
                      dtype=jnp.bfloat16)
    pmax = aux[..., 0]
    pinst = aux[..., 1]
    pvel = aux[..., 2:4]

    depth_miss = (cur_depth == 0.0) | (
        (pmax > 0.0) & (cur_depth / jnp.maximum(pmax, 1e-30) < 0.95))
    instance_miss = depth_miss & (jnp.abs(pinst - cur_instance) > 1.0)
    velocity_miss = jnp.sqrt(jnp.sum((velocity - pvel) ** 2, -1)) > 1e-4
    need_clip = boundary_miss | ((depth_miss | instance_miss) & velocity_miss)

    # pick the bias minimizing current-depth distance (current buffer =
    # affine taps), then 2x2 YCoCg variance clip from the current tone
    biases = [(0.0, 0.0), (_BIAS, _BIAS), (-_BIAS, _BIAS),
              (_BIAS, -_BIAS), (-_BIAS, -_BIAS)]
    min_ds = jnp.full(render_size, 10.0)
    best_bias = jnp.zeros(render_size, jnp.int32)
    for bi, (bx, by) in enumerate(biases):
        dds = jnp.zeros(render_size)
        for ky in (0, 1):
            for kx in (0, 1):
                # gather4 corners of position.w at output coords 2c+prev_j+bias
                iy = np_floor(by - 0.5) + ky
                ix = np_floor(bx - 0.5) + kx
                d = pos_at(iy, ix)[..., 0]
                dds = dds + (cur_depth - d) ** 2
        dds = jnp.sqrt(dds)
        take = dds < min_ds
        best_bias = jnp.where(take, bi, best_bias)
        min_ds = jnp.minimum(min_ds, dds)

    # 2x2 quad of the current tone around previous_output_uv + bias:
    # tone coord = c + (prev_j + 0.5 + bias)/2 - 0.5; corners static per
    # (parity, bias). Convert to YCoCg ONCE and cache every needed shift of
    # the converted planes + their squares (each (bias, parity) quad reuses
    # them), instead of 40 shifted conversions.
    s_mm = rgb_to_ycocg(jnp.clip(current_color, 0.0, 1.0))
    s_sq = s_mm * s_mm
    _shift_cache = {}

    def ycc_at(dy, dx):
        if (dy, dx) not in _shift_cache:
            _shift_cache[(dy, dx)] = (_shift(s_mm, dy, dx),
                                      _shift(s_sq, dy, dx))
        return _shift_cache[(dy, dx)]

    prev_ycc = rgb_to_ycocg(prev_color)
    clipped_variants = []
    for bi, (bx, by) in enumerate(biases):
        stats = []
        for parity_case in (0, 1):
            base_y = (parity_case + 0.5 + by) / 2.0 - 0.5
            base_x = (parity_case + 0.5 + bx) / 2.0 - 0.5
            y0 = int(np_floor(base_y))
            x0 = int(np_floor(base_x))
            m1 = 0.0
            m2 = 0.0
            for ky in (0, 1):
                for kx in (0, 1):
                    a, a2 = ycc_at(y0 + ky, x0 + kx)
                    m1 = m1 + a
                    m2 = m2 + a2
            stats.append((m1, m2))
        m1 = jnp.where(prev_j == 0, stats[0][0], stats[1][0])
        m2 = jnp.where(prev_j == 0, stats[0][1], stats[1][1])
        mean = m1 / 4.0
        var = jnp.sqrt(jnp.maximum(m2 / 4.0 - mean * mean, 0.0))
        clipped_variants.append(ycocg_to_rgb(clip_towards_aabb_center(
            prev_ycc, s_mm, mean - var, mean + var)))
    clipped = clipped_variants[0]
    for bi in range(1, len(biases)):
        clipped = jnp.where((best_bias == bi)[..., None],
                            clipped_variants[bi], clipped)
    prev_color = jnp.where(need_clip[..., None], clipped, prev_color)

    # sub-pixel velocity differential remix (smaa.wgsl:218-227)
    subpix = jnp.mod(velocity / (2.0 * texel), 1.0)
    blend = jnp.clip(-jnp.cos(jnp.maximum(subpix[..., 0], subpix[..., 1]) * TAU),
                     0.0, 1.0)
    # remix = linear sample of current tone at previous_output_uv:
    # tone coord c + prev_j/2 - 0.25 -> two-tap blend, parity-selected
    def remix_for(parity_case):
        off = parity_case / 2.0 - 0.25
        lo = int(np_floor(off))
        frac = off - lo
        a = _shift(current_color, lo, lo)
        b_ = _shift(current_color, lo + 1, lo)
        c_ = _shift(current_color, lo, lo + 1)
        d_ = _shift(current_color, lo + 1, lo + 1)
        return (a * (1 - frac) * (1 - frac) + c_ * frac * (1 - frac)
                + b_ * (1 - frac) * frac + d_ * frac * frac)

    remix = jnp.where(prev_j == 0, remix_for(0), remix_for(1))
    prev_color = prev_color + (remix - prev_color) * blend[..., None]

    one = jnp.ones(render_size + (1,))
    cur4 = jnp.concatenate([current_color, one], -1)
    prev4 = jnp.concatenate([jnp.clip(prev_color, 0.0, 1.0), one], -1)

    even_frame = (frame["number"] & 1) == 0
    p00 = jnp.where(even_frame, cur4, prev4)
    p11 = jnp.where(even_frame, prev4, cur4)

    # ---- extrapolate pass (smaa.wgsl:239-271)
    def qshift(img, dy, dx):
        return jnp.roll(img, (-dy, -dx), axis=(0, 1))

    t_c = p00
    b_c = p11
    n_c = qshift(p11, -1, 0)
    e_c = qshift(p00, 0, 1)
    s_c = qshift(p00, 1, 0)
    w_c = qshift(p11, 0, -1)

    dh = jnp.stack([luminance(jnp.abs(w_c[..., :3] - b_c[..., :3])),
                    luminance(jnp.abs(t_c[..., :3] - e_c[..., :3]))], -1)
    dv = jnp.stack([luminance(jnp.abs(t_c[..., :3] - s_c[..., :3])),
                    luminance(jnp.abs(n_c[..., :3] - b_c[..., :3]))], -1)
    factor_x = jnp.maximum(dv[..., 0], 1e-3) * jnp.maximum(dv[..., 1], 1e-3)
    factor_y = jnp.maximum(dh[..., 0], 1e-3) * jnp.maximum(dh[..., 1], 1e-3)
    factor_z = 1.0 / (factor_x + factor_y)

    def diff_blend(t, b, l, r):
        color = (l + r) * factor_x[..., None] + (t + b) * factor_y[..., None]
        return 0.5 * factor_z[..., None] * color

    x_color = diff_blend(t_c, s_c, w_c, b_c)  # at 2c + (0,1)
    y_color = diff_blend(n_c, b_c, t_c, e_c)  # at 2c + (1,0)

    quad = jnp.stack(
        [jnp.stack([p00, y_color], axis=2),
         jnp.stack([x_color, p11], axis=2)], axis=2)
    return quad.transpose(0, 2, 1, 3, 4).reshape(oh, ow, 4)


