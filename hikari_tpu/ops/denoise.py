"""SVGF-style edge-aware a-trous denoiser (denoise.wgsl).

Per channel: demodulation (divide out albedo + 3x3 variance prefilter,
denoise.wgsl:135-166) then four a-trous iterations with step sizes 8/4/2/1
(denoise.wgsl:97-116) weighted by normal^16, depth-gradient, instance id and
luminance/variance (denoise.wgsl:43-66); optional firefly clamp; the last
level re-multiplies albedo.

All taps are STATIC shifts of the render-res-resampled G-buffer — pure
stencils XLA fuses, no gathers (the jittered deferred lookup is handled once
by restir.resample_deferred; the denoiser's 0.5-texel jitter resolves to the
same parity slice at the supported ratios).
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.config import ATROUS_KERNEL
from hikari_tpu.ops.restir import resample_deferred
from hikari_tpu.utils.math import F32_EPSILON, F32_MAX, luminance, normalize

_STEPS = (8, 4, 2, 1)


def _shift2d(img, dy, dx):
    """Static shift with validity mask for out-of-image taps."""
    h, w = img.shape[:2]
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    pad = ((pad_y), (pad_x)) + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad)
    out = p[pad_y[0] - dy : pad_y[0] - dy + h, pad_x[0] - dx : pad_x[0] - dx + w]
    valid = jnp.ones((h, w), bool)
    if dy > 0:
        valid = valid & (jnp.arange(h)[:, None] >= dy)
    elif dy < 0:
        valid = valid & (jnp.arange(h)[:, None] < h + dy)
    if dx > 0:
        valid = valid & (jnp.arange(w)[None, :] >= dx)
    elif dx < 0:
        valid = valid & (jnp.arange(w)[None, :] < w + dx)
    return out, valid


def normal_weight(n0, n1):
    d = jnp.maximum(0.0, jnp.sum(n0 * n1, -1))
    return d ** 16


def depth_weight(d0, d1, gradient, offset):
    eps = 0.01
    dg = jnp.abs(gradient[..., 0] * offset[0] + gradient[..., 1] * offset[1])
    return jnp.exp(-jnp.abs(d0 - d1) / (dg + eps))


def luminance_weight(l0, l1, variance):
    # var^0.25 as two sqrts: a float pow lowers to exp(log) transcendentals
    var4 = jnp.sqrt(jnp.sqrt(jnp.maximum(variance, 0.0)))
    return jnp.exp(-jnp.abs(l0 - l1) / (4.0 * var4 + 1e-3))


def instance_weight(i0, i1):
    return jnp.maximum(0.0, 1.0 - jnp.abs(i0 - i1))


def demodulate(albedo_r, render, variance, render_size):
    """irradiance = render / albedo; variance 3x3 prefilter
    (denoise.wgsl:135-166)."""
    alb = albedo_r[..., :3]
    irr = jnp.where(alb < 0.01, 0.0, render[..., :3] / jnp.maximum(alb, 1e-6))

    var = jnp.zeros(render_size, jnp.float32)
    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            v, ok = _shift2d(variance, oy, ox)
            k = float(ATROUS_KERNEL[oy + 1, ox + 1])
            var = var + jnp.where(ok & (v <= F32_MAX), k * jnp.maximum(v, 0.0), 0.0)
    return irr, var


def denoise_channel(g, albedo, render, variance, frame, render_size,
                    ratio: float, firefly: bool):
    """Full demodulate + 4-level a-trous + remodulate for one channel.

    g: render-res resampled G-buffer; albedo: FULL-res albedo texture.
    """
    return denoise_channels(g, albedo, [(render, variance, firefly)], frame,
                            render_size, ratio)[0]


def denoise_channels(g, albedo, chans, frame, render_size, ratio: float,
                     fused: bool | None = None, albedo_r=None):
    """Denoise several lighting channels in ONE fused pass.

    chans: list of (render [h,w,4], variance [h,w], firefly bool). The
    edge-stopping geometry weights (normal^16 / depth / instance,
    denoise.wgsl:43-66) depend only on the G-buffer, so with C channels in
    flight they are computed once per tap instead of C times, and every tap
    shift covers all channels — ~40% fewer 1080p passes for the 3-channel
    reference pipeline (the analog of denoise.wgsl's 3 sequential
    dispatches, post_process.rs:1180-1240).

    fused: run the a-trous cascade as one Pallas kernel per level
    (ops/denoise_fused.py; 12.5 -> ~3 ms at 1080p) instead of the XLA
    shift-stencil formulation. Default: on (interpret-mode emulation on
    CPU); the XLA path remains the test oracle."""
    import jax as _jax

    if albedo_r is None:
        albedo_r = resample_deferred(albedo, render_size, frame["number"],
                                     ratio)
    depth = g["position"][..., 3]
    valid = depth >= F32_EPSILON
    normal = normalize(g["normal"])
    gradient = g["depth_gradient"]
    instance = g["instance_material"][..., 0]

    irrs, variances = [], []
    for render, variance, _ in chans:
        irr_c, var_c = demodulate(albedo_r, render, variance, render_size)
        irrs.append(irr_c)
        variances.append(var_c)
    nch = len(chans)

    import os as _os

    if _os.environ.get("HIKARI_DN_DUMP"):  # debug: bit-dump island inputs
        import jax.experimental as _jex

        _tag = _os.environ["HIKARI_DN_DUMP"]

        def _save(**a):
            import time as _time

            import numpy as _np

            _np.savez(f"/tmp/dn_island_{_tag}_{_time.monotonic_ns()}.npz",
                      **{k: _np.asarray(v) for k, v in a.items()})

        _jex.io_callback(
            _save, None,
            **{f"irr{c}": irrs[c] for c in range(nch)},
            **{f"var{c}": variances[c] for c in range(nch)})

    if fused is None:
        import os

        fused = os.environ.get("HIKARI_DENOISE_FUSED", "1") != "0"
    if fused:
        from hikari_tpu.ops.denoise_fused import denoise_levels_fused

        on_tpu = any(d.platform != "cpu" for d in _jax.devices())
        outs_irr = denoise_levels_fused(
            irrs, variances, normal, gradient, depth, instance,
            [ff for _, _, ff in chans], _STEPS, render_size,
            interpret=not on_tpu)
        return [jnp.where(valid[..., None],
                          jnp.concatenate(
                              [oi, jnp.ones(render_size + (1,))], -1)
                          * albedo_r, 0.0)
                for oi in outs_irr]
    # channel-stacked irradiance [h, w, 3C]: the tap shifts cover every
    # channel in one pass; per-channel scalar planes stay [h, w] (slices
    # along the outermost channel dim are layout-free bitcasts — avoid any
    # [h, w, C, 3] broadcast materialization). Between levels the stack is
    # stored bf16: each of the 8 taps re-reads it, so halving its bytes
    # halves the denoiser's dominant HBM traffic (quantization ~0.4% per
    # level on demodulated irradiance, re-modulated by full-precision
    # albedo at the end — inside the golden-image tolerance).
    irr = jnp.concatenate(irrs, axis=-1).astype(jnp.bfloat16)
    ffs = [ff for _, _, ff in chans]

    def chan3(x, c):
        return x[..., 3 * c:3 * c + 3].astype(jnp.float32)

    center_k = float(ATROUS_KERNEL[1, 1])
    for step in _STEPS:
        bad = [~jnp.all(jnp.isfinite(chan3(irr, c)), -1)
               | jnp.any(chan3(irr, c) > F32_MAX, -1) for c in range(nch)]
        c_irrs = [jnp.where(bad[c][..., None], 0.0, chan3(irr, c))
                  for c in range(nch)]
        sum_irr = [ci * center_k for ci in c_irrs]
        sum_w = [jnp.where(bad[c], 0.0, center_k) for c in range(nch)]
        lum0 = [jnp.where(bad[c], 0.0, luminance(c_irrs[c]))
                for c in range(nch)]

        ff_m1 = [jnp.zeros(render_size) for _ in range(nch)]
        ff_m2 = [jnp.zeros(render_size) for _ in range(nch)]
        ff_cnt = [jnp.zeros(render_size) for _ in range(nch)]

        for oy in (-1, 0, 1):
            for ox in (-1, 0, 1):
                if oy == 0 and ox == 0:
                    continue
                dy, dx = oy * step, ox * step
                s_irr, ok = _shift2d(irr, dy, dx)
                s_nrm, _ = _shift2d(normal, dy, dx)
                s_dep, _ = _shift2d(depth, dy, dx)
                s_ins, _ = _shift2d(instance, dy, dx)
                geo_w = (
                    normal_weight(normal, normalize(s_nrm))
                    * depth_weight(depth, s_dep, gradient, (ox, oy))
                    * instance_weight(instance, s_ins)
                ) * float(ATROUS_KERNEL[oy + 1, ox + 1])
                # ^ [h,w] — shared by all channels
                for c in range(nch):
                    sc = chan3(s_irr, c)
                    finite = jnp.all(jnp.isfinite(sc), -1) & ~jnp.any(
                        sc > F32_MAX, -1)
                    okc = ok & finite
                    s_lum = luminance(sc)
                    w = geo_w * luminance_weight(lum0[c], s_lum, variances[c])
                    w = jnp.where(
                        okc,
                        jnp.clip(w, 0.0,
                                 float(ATROUS_KERNEL[oy + 1, ox + 1])), 0.0)
                    # zero the excluded tap VALUE too: NaN * 0 == NaN, so a
                    # non-finite neighbor would otherwise spread each level
                    sc = jnp.where(okc[..., None], sc, 0.0)
                    sum_irr[c] = sum_irr[c] + sc * w[..., None]
                    sum_w[c] = sum_w[c] + w
                    if ffs[c]:
                        ff_m1[c] = ff_m1[c] + jnp.where(okc, s_lum, 0.0)
                        ff_m2[c] = ff_m2[c] + jnp.where(okc, s_lum * s_lum,
                                                        0.0)
                        ff_cnt[c] = ff_cnt[c] + okc.astype(jnp.float32)

        new_irrs = []
        for c in range(nch):
            ni = jnp.where((sum_w[c] < 1e-4)[..., None], 0.0,
                           sum_irr[c]
                           / jnp.maximum(sum_w[c], 1e-4)[..., None])
            if ffs[c]:
                ff_mean = ff_m1[c] / jnp.maximum(ff_cnt[c], 1.0)
                ff_var = (ff_m2[c] / jnp.maximum(ff_cnt[c], 1.0)
                          - ff_mean * ff_mean)
                is_firefly = lum0[c] > ff_mean + 3.0 * jnp.sqrt(
                    jnp.maximum(ff_var, 0.0))
                ni = jnp.where(is_firefly[..., None],
                               (ff_mean / jnp.maximum(lum0[c], 1e-30))[..., None]
                               * ni, ni)
            new_irrs.append(ni)
        irr = jnp.concatenate(new_irrs, axis=-1).astype(jnp.bfloat16)

    outs = []
    for c in range(nch):
        out = jnp.concatenate(
            [chan3(irr, c), jnp.ones(render_size + (1,))], -1) * albedo_r
        outs.append(jnp.where(valid[..., None], out, 0.0))
    return outs
