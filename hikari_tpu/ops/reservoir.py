"""ReSTIR reservoirs as SoA tensor pytrees.

The reference packs reservoirs into 64-byte structs (fp16 radiance/weights,
unorm16 randoms, snorm8 normals — light.wgsl:35-136) in 10 ping-pong storage
buffers. Functionally a reservoir is just a struct of per-pixel fields; here
each field is a dense [H,W(,C)] tensor and ping-pong becomes functional carry
threading (SURVEY.md §7 design translation). fp32 throughout for round 1; a
packed bf16/int8 layout is a later bandwidth optimization.

Reservoir algebra matches light.wgsl:138-179 + 937-952.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils.math import luminance

MAX_VARIANCE = 10.0


def empty_reservoir(size):
    h, w = size
    f = lambda *c: jnp.zeros((h, w) + c, jnp.float32)
    return {
        "radiance": f(4),
        "random": f(4),
        "visible_position": f(4),
        "visible_normal": f(3),
        "visible_instance": jnp.full((h, w), -1, jnp.int32),
        "sample_position": f(4),
        "sample_normal": f(3),
        "count": f(),
        "lifetime": f(),
        "w": f(),
        "w_sum": f(),
        "w2_sum": f(),
    }


def where_reservoir(mask, a, b):
    """Elementwise select between two reservoirs. mask [H,W] bool."""
    out = {}
    for k in a:
        m = mask[..., None] if a[k].ndim == 3 else mask
        out[k] = jnp.where(m, a[k], b[k])
    return out


def zero_where(mask, r):
    return where_reservoir(mask, empty_reservoir(r["count"].shape), r)


def make_sample(radiance, random, visible_position, visible_normal,
                visible_instance, sample_position, sample_normal):
    return {
        "radiance": radiance,
        "random": random,
        "visible_position": visible_position,
        "visible_normal": visible_normal,
        "visible_instance": visible_instance,
        "sample_position": sample_position,
        "sample_normal": sample_normal,
    }


_SAMPLE_KEYS = ("radiance", "random", "visible_position", "visible_normal",
                "visible_instance", "sample_position", "sample_normal")


def set_reservoir(s, w_new):
    """Fresh reservoir from one sample (light.wgsl:138-144)."""
    r = dict(s)
    r["count"] = jnp.ones_like(w_new)
    r["lifetime"] = jnp.zeros_like(w_new)
    r["w"] = jnp.zeros_like(w_new)
    r["w_sum"] = w_new
    r["w2_sum"] = w_new * w_new
    return r


def update_reservoir(r, s, w_new, mask=None):
    """Weighted reservoir update (light.wgsl:146-173). mask gates the whole
    update (used to emulate per-thread branches)."""
    if mask is None:
        mask = jnp.ones_like(w_new, bool)
    w_sum = r["w_sum"] + w_new
    w2_sum = r["w2_sum"] + w_new * w_new
    count = r["count"] + 1.0
    rand = jnp.mod(jnp.sum(s["random"], axis=-1), 1.0)
    replace = mask & (rand < w_new / jnp.maximum(w_sum, 1e-30))
    out = dict(r)
    out["w_sum"] = jnp.where(mask, w_sum, r["w_sum"])
    out["w2_sum"] = jnp.where(mask, w2_sum, r["w2_sum"])
    out["count"] = jnp.where(mask, count, r["count"])
    for k in _SAMPLE_KEYS:
        m = replace[..., None] if out[k].ndim == 3 else replace
        out[k] = jnp.where(m, s[k], r[k])
    return out


def merge_reservoir(r, other, p, mask=None):
    """Merge another reservoir, count-weighted (light.wgsl:175-179)."""
    if mask is None:
        mask = jnp.ones_like(p, bool)
    count = r["count"]
    s = {k: other[k] for k in _SAMPLE_KEYS}
    out = update_reservoir(r, s, p * other["w"] * other["count"], mask)
    out["count"] = jnp.where(mask, count + other["count"], r["count"])
    return out


def clamp_reservoir(r, max_count):
    """Temporal/spatial history clamp (light.wgsl:944-951, 1645-1651)."""
    m = max_count
    over = r["count"] > m
    scale = jnp.where(over, m / jnp.maximum(r["count"], 1e-30), 1.0)
    out = dict(r)
    out["w_sum"] = r["w_sum"] * scale
    out["w2_sum"] = r["w2_sum"] * scale
    out["count"] = jnp.minimum(r["count"], m)
    return out


def temporal_restir(r, s, w_new, max_count, mask=None):
    """update + clamp (light.wgsl:937-952)."""
    return clamp_reservoir(update_reservoir(r, s, w_new, mask), max_count)


def reservoir_variance(r):
    """Stored variance (light.wgsl:1224-1227)."""
    count = jnp.maximum(r["count"], 1e-30)
    var = r["w2_sum"] / count - (r["w_sum"] / count) ** 2
    var = jnp.where(r["count"] < 1.0, var, var / count)
    return jnp.minimum(var, MAX_VARIANCE)


def finalize_w(r, target_luminance):
    """r.w = w_sum / (count * lum(target)) (light.wgsl:1216-1217)."""
    total = r["count"] * target_luminance
    out = dict(r)
    out["w"] = jnp.where(total > 0.0, r["w_sum"] / jnp.maximum(total, 1e-30), 0.0)
    return out


def gather_reservoir(r, iy, ix, valid):
    """Load reservoirs at integer coords [.., 2]; invalid -> zero reservoir."""
    out = {}
    for k, a in r.items():
        g = a[iy, ix]
        m = valid[..., None] if g.ndim == iy.ndim + 1 else valid
        out[k] = jnp.where(m, g, jnp.zeros_like(g) if a.dtype != jnp.int32 else -1)
    return out


def scatter_reservoir(dst, iy, ix, src, mask):
    """dst[iy, ix] = src where mask — the reference's cross-pixel
    previous-spatial invalidation scatter (light.wgsl:1092-1095,
    1199-1202). Out-of-range handled by caller via mask; masked lanes are
    redirected to a dummy out-of-bounds index (drop semantics)."""
    h, w = dst["count"].shape
    # jax drops out-of-bounds scatter updates; route masked-off lanes there.
    oy = jnp.where(mask, iy, h + 1)
    ox = jnp.where(mask, ix, w + 1)
    out = {}
    for k in dst:
        out[k] = dst[k].at[oy, ox].set(src[k], mode="drop")
    return out


def check_previous_reservoir(r, s):
    """Temporal reprojection rejection (light.wgsl:917-935): depth ratio,
    normal dot, instance id. Returns (possibly zeroed reservoir, ok_mask)."""
    from hikari_tpu.utils.math import dot3

    depth_ratio = r["visible_position"][..., 3] / jnp.where(
        s["visible_position"][..., 3] == 0.0, 1e-30, s["visible_position"][..., 3]
    )
    depth_ratio = jnp.where(depth_ratio < 1.0,
                            1.0 / jnp.where(depth_ratio == 0.0, 1e-30, depth_ratio),
                            depth_ratio)
    depth_miss = depth_ratio > 1.05 * (1.0 + 0.5 * s["random"][..., 0])
    instance_miss = r["visible_instance"] != s["visible_instance"]
    normal_miss = dot3(s["visible_normal"], r["visible_normal"]) < 0.9
    ok = ~(depth_miss | normal_miss | instance_miss)
    return zero_where(~ok, r), ok
