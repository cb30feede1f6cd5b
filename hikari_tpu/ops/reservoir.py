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


# ---------------------------------------------------------------------------
# Packed layout: ALL fields in one [H,W,28] tensor so cross-pixel
# gathers/scatters are ONE row-gather instead of 12 (TPU gather cost is
# per-row, not per-byte — measured 24ns/row regardless of width). This is
# the tensor analog of the reference's packed 64-byte reservoir struct
# (light.wgsl:35-43).
# ---------------------------------------------------------------------------

_PACK_SPEC = (
    ("radiance", 4), ("random", 4), ("visible_position", 4),
    ("visible_normal", 3), ("sample_position", 4), ("sample_normal", 3),
    ("count", 1), ("lifetime", 1), ("w", 1), ("w_sum", 1), ("w2_sum", 1),
    ("visible_instance", 1),
)
PACKED_WIDTH = sum(n for _, n in _PACK_SPEC)  # 28


def pack_reservoir(r):
    parts = []
    for k, n in _PACK_SPEC:
        a = r[k]
        if k == "visible_instance":
            a = a.astype(jnp.float32)
        if a.ndim == 2:
            a = a[..., None]
        parts.append(a)
    return jnp.concatenate(parts, axis=-1)


def unpack_reservoir(t):
    out = {}
    o = 0
    for k, n in _PACK_SPEC:
        a = t[..., o : o + n]
        if n == 1:
            a = a[..., 0]
        if k == "visible_instance":
            a = a.astype(jnp.int32)
        out[k] = a
        o += n
    return out


def gather_reservoir_packed(packed, iy, ix, valid):
    """One flat row-gather of the packed tensor; invalid -> zero reservoir
    (visible_instance -1)."""
    h, w, f = packed.shape
    flat = packed.reshape(h * w, f)
    idx = (iy * w + ix).reshape(-1)
    g = jnp.take(flat, idx, axis=0).reshape(iy.shape + (f,))
    g = jnp.where(valid[..., None], g, 0.0)
    r = unpack_reservoir(g)
    r["visible_instance"] = jnp.where(valid, r["visible_instance"], -1)
    return r


def gather_reservoir(r, iy, ix, valid):
    return gather_reservoir_packed(pack_reservoir(r), iy, ix, valid)


def scatter_reservoir_packed(dst_packed, iy, ix, src, mask):
    """Packed-tensor variant: dst stays packed across the frame."""
    h, w, f = dst_packed.shape
    dp = dst_packed.reshape(h * w, f)
    sp = pack_reservoir(src).reshape(-1, f)
    idx = jnp.where(mask, iy * w + ix, h * w + 1).reshape(-1)
    return dp.at[idx].set(sp, mode="drop").reshape(h, w, f)


def scatter_reservoir(dst, iy, ix, src, mask):
    """dst[iy, ix] = src where mask — the reference's cross-pixel
    previous-spatial invalidation scatter (light.wgsl:1092-1095,
    1199-1202). One flat row-scatter on the packed tensor; masked lanes are
    routed out of bounds (drop semantics)."""
    h, w = dst["count"].shape
    dp = pack_reservoir(dst).reshape(h * w, PACKED_WIDTH)
    sp = pack_reservoir(src).reshape(-1, PACKED_WIDTH)
    idx = jnp.where(mask, iy * w + ix, h * w + 1).reshape(-1)
    out = dp.at[idx].set(sp, mode="drop")
    return unpack_reservoir(out.reshape(h, w, PACKED_WIDTH))


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
