"""ReSTIR reservoirs as SoA tensor pytrees.

The reference packs reservoirs into 64-byte structs (fp16 radiance/weights,
unorm16 randoms, snorm8 normals — light.wgsl:35-136) in 10 ping-pong storage
buffers. Functionally a reservoir is just a struct of per-pixel fields; the
working representation is a dict of dense [H,W(,C)] f32 tensors, and the
carry representation is the packed [H,W,16] f32 tensor below — the
reference's exact 64 B/pixel budget (bf16/unorm16/snorm8 lane bitcasts).
Ping-pong becomes functional carry threading (SURVEY.md §7).

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
# Packed layout: ALL fields in one [H,W,16] f32 tensor = 64 B/pixel — the
# reference's exact budget (light.wgsl:35-43: fp16 radiance/stats, unorm16
# randoms, snorm8 normals, f32 positions, instance riding sample_pos.w).
# One tensor means cross-pixel gathers/scatters are ONE row-gather instead
# of 12 (TPU gather cost is per-row, not per-byte), and the five carry
# buffers cost 57% of the unpacked-f32 round-1 layout's HBM traffic.
# bf16 replaces the reference's fp16 (native on TPU; more range, 8-bit
# mantissa — all consumers' thresholds tolerate 0.4% quantization, and the
# reference round-trips through the same class of quantization each frame).
# ---------------------------------------------------------------------------

PACKED_WIDTH = 16


def _bf16_pair(a, b):
    """Two f32 -> one f32 lane holding two bf16."""
    import jax

    x = jnp.stack([a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)], axis=-1)
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _bf16_unpair(lane):
    import jax

    x = jax.lax.bitcast_convert_type(lane, jnp.bfloat16)
    return x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32)


def _u32_to_f32(u):
    import jax

    return jax.lax.bitcast_convert_type(u.astype(jnp.uint32), jnp.float32)


def _f32_to_u32(f):
    import jax

    return jax.lax.bitcast_convert_type(f, jnp.uint32)


def _unorm16_pair(a, b):
    ua = jnp.round(jnp.clip(a, 0.0, 1.0) * 65535.0).astype(jnp.uint32)
    ub = jnp.round(jnp.clip(b, 0.0, 1.0) * 65535.0).astype(jnp.uint32)
    return _u32_to_f32(ua | (ub << 16))


def _unorm16_unpair(lane):
    u = _f32_to_u32(lane)
    return ((u & 0xFFFF).astype(jnp.float32) / 65535.0,
            (u >> 16).astype(jnp.float32) / 65535.0)


def _snorm8_vec(n3, extra_u8):
    """normal xyz snorm8 + one u8 payload -> one f32 lane."""
    b = jnp.round((jnp.clip(n3, -1.0, 1.0) * 0.5 + 0.5)
                  * 255.0).astype(jnp.uint32)
    word = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
            | (extra_u8.astype(jnp.uint32) << 24))
    return _u32_to_f32(word)


def _snorm8_unvec(lane):
    u = _f32_to_u32(lane)
    def dec(shift):
        return ((u >> shift) & 0xFF).astype(jnp.float32) / 255.0 * 2.0 - 1.0
    n3 = jnp.stack([dec(0), dec(8), dec(16)], axis=-1)
    return n3, (u >> 24).astype(jnp.float32)


def _pack_planes(r):
    """The 16 packed lanes as individual [h, w] planes."""
    rad = r["radiance"]
    rnd = r["random"]
    return [
        r["visible_position"][..., 0],                          # 0
        r["visible_position"][..., 1],                          # 1
        r["visible_position"][..., 2],                          # 2
        r["visible_position"][..., 3],                          # 3
        r["sample_position"][..., 0],                           # 4
        r["sample_position"][..., 1],                           # 5
        r["sample_position"][..., 2],                           # 6
        r["visible_instance"].astype(jnp.float32),              # 7
        _bf16_pair(rad[..., 0], rad[..., 1]),                   # 8
        _bf16_pair(rad[..., 2], rad[..., 3]),                   # 9
        _unorm16_pair(rnd[..., 0], rnd[..., 1]),                # 10
        _unorm16_pair(rnd[..., 2], rnd[..., 3]),                # 11
        _snorm8_vec(r["visible_normal"],
                    jnp.clip(r["lifetime"], 0.0, 255.0)),       # 12
        _snorm8_vec(r["sample_normal"],
                    (r["sample_position"][..., 3] > 0.5)
                    .astype(jnp.float32) * 255.0),              # 13
        _bf16_pair(r["count"], r["w"]),                         # 14
        _bf16_pair(r["w_sum"], r["w2_sum"]),                    # 15
    ]


def pack_reservoir(r):
    return jnp.stack(_pack_planes(r), axis=-1)


def pack_reservoir_planes(r):
    """Channel-plane layout [h, PACKED_WIDTH, w] — the format the banded
    reprojection gather consumes (ops/reproj_gather.py); matches the
    physical layout XLA picks for the channel-last carry without the
    logical transpose."""
    return jnp.stack(_pack_planes(r), axis=1)


def _unpack_fields(take):
    """Shared bit-unpack logic; take(i) yields packed lane i [h, w]."""
    rad01 = _bf16_unpair(take(8))
    rad23 = _bf16_unpair(take(9))
    rnd01 = _unorm16_unpair(take(10))
    rnd23 = _unorm16_unpair(take(11))
    vnrm, lifetime = _snorm8_unvec(take(12))
    snrm, sflag = _snorm8_unvec(take(13))
    count, w = _bf16_unpair(take(14))
    w_sum, w2_sum = _bf16_unpair(take(15))
    return {
        "visible_position": jnp.stack(
            [take(0), take(1), take(2), take(3)], -1),
        "sample_position": jnp.stack(
            [take(4), take(5), take(6),
             (sflag > 127.0).astype(jnp.float32)], -1),
        "visible_instance": take(7).astype(jnp.int32),
        "radiance": jnp.stack([rad01[0], rad01[1], rad23[0], rad23[1]], -1),
        "random": jnp.stack([rnd01[0], rnd01[1], rnd23[0], rnd23[1]], -1),
        "visible_normal": vnrm,
        "sample_normal": snrm,
        "lifetime": lifetime,
        "count": count,
        "w": w,
        "w_sum": w_sum,
        "w2_sum": w2_sum,
    }


def unpack_reservoir(t):
    return _unpack_fields(lambda i: t[..., i])


def unpack_reservoir_planes(t):
    """Inverse of pack_reservoir_planes ([h, PACKED_WIDTH, w])."""
    return _unpack_fields(lambda i: t[:, i, :])


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
