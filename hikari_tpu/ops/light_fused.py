"""Fused Pallas lighting mega-kernel (the no-reuse fast path in one kernel).

The XLA formulation of the three lighting channels (ops/restir.py fast
paths) is semantically a handful of ray casts plus elementwise shading — but
it compiles to ~170 separate [H,W] fusions that each round-trip HBM: the
round-2 flagship profile showed 4 ms of Pallas intersection and ~25 ms of
XLA "loop fusion" glue. This kernel keeps a [128,128] ray block resident in
VMEM and runs the ENTIRE per-pixel lighting pipeline of light.wgsl's
direct_lit / indirect_lit_ambient no-reuse specialization on it:

* direct channel (light.wgsl:1045-1261, RENDER_EMISSIVE): solar-cone NEE
  candidate + shadow ray + Burley/GGX shading + surface emission add;
* emissive channel (EMISSIVE_LIT): emissive-BVH containment walk
  (light.wgsl:624-657, statically unrolled), alias-table triangle pick
  (light.wgsl:662-669), barycentric sample, probe ray restricted to the
  emitter, area-to-solid-angle pdf, shadow ray, shading;
* indirect channel (light.wgsl:1264-1498): cosine-hemisphere bounce(s) with
  per-bounce NEE (emissive pick with solar fallback), transport, radiance
  clamp, final shading at the visible point.

All light-candidate tables (triangles, emissive rows, alias slots,
materials) live in VMEM; per-lane table lookups are unrolled select-sweeps,
so the kernel is eligible only for small scenes (the cornell/minimal/simple
benchmark class — `fused_eligible`). Larger scenes keep the modular
XLA+Pallas path.

Numerics match ops/restir.py's static no-reuse fast paths: the same
Möller-Trumbore forms (ops/trace_pallas.py), the same WGSL-derived shading
chain (ops/shading.py), the same pdf/fallback logic (ops/sampling.py).
tests/test_light_fused.py asserts channel-for-channel agreement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7
DISTANCE_MAX = 65535.0
RAY_BIAS = 0.02
GOLDEN_RATIO = 1.618033989
TAU = 6.283185307
INV_TAU = 0.159154943
PI = 3.14159265358979

_LANES = 128


def _block_h(w: int) -> int:
    """Rows of the image per grid step. Blocks span the FULL image width so
    kernel inputs/outputs keep the [H,W]{1,0:T(8,128)} layout every XLA
    consumer uses — flat [N/128,128] blocks forced a real relayout copy per
    plane (~0.26 ms each at 1080p, round-3 profile). Target ~16k lanes per
    step (the measured compute/overhead sweet spot of trace_pallas)."""
    return max(8, min(128, ((16384 // max(w, 1)) // 8) * 8))

# eligibility caps (per-lane select-sweep cost scales with each of these)
MAX_TRIS = 768
MAX_EMISSIVES = 8
MAX_ALIAS_SLOTS = 64
MAX_EM_TRIS = 32
MAX_MATERIALS = 16

# ---- params row-0 layout -------------------------------------------------
_P_DIRL = 0        # dir_to_light xyz
_P_DIRC = 3        # dir_color rgb
_P_AMB = 6         # ambient rgb
_P_COS_SOLAR = 9
_P_CAM = 10        # camera world position xyz
_P_MAX_IND = 13    # max_indirect_luminance
_P_ADV = 14        # frame_number * GOLDEN_RATIO (rand advance, un-modded)
_P_MAXCNT = 15     # max_temporal_reuse_count
_P_EM = 16         # per-emissive stride-10 block (leaf-order):
#                    cx cy cz radius inst alias_off alias_count area tri_off pad
_EM_STRIDE = 10
# row 1: alias slots (prob, alias) pairs
# row 2 (temporal reuse): [0] direct-validation flag (0/1 this frame),
#                         [1] emissive-validation flag


def fused_eligible(scene, *, no_texture: bool, num_emissives: int,
                   temporal_reuse: bool, track_de: bool, track_ind: bool,
                   tracer_kind: str, has_sun: bool = True,
                   bounces: int = 1, ckb: bool = False) -> bool:
    """Static gate for the mega-kernel (the analog of a pipeline-key
    specialization): small-scene brute-force class, no textures (texture
    fetches would need per-lane atlas gathers), no spatial reuse (its
    cross-pixel taps/scatters are a different pass). Temporal reuse IS
    covered (in-kernel ReSTIR), except under checkerboard lighting where
    the reservoir carries live at full res while the kernel runs on the
    compressed domain."""
    if track_de or track_ind or not no_texture:
        return False
    if temporal_reuse and ckb:
        return False
    if not (has_sun or num_emissives > 0 or bounces > 0):
        return False  # nothing for the kernel to emit
    if tracer_kind != "brute_force_pallas":
        return False
    if scene["tri_pos_flat"].shape[0] > MAX_TRIS:
        return False
    if scene["mat_packed"].shape[0] > MAX_MATERIALS:
        return False
    if num_emissives > 0:
        if "em_leaf_order" not in scene:
            return False
        if scene["em_packed"].shape[0] > MAX_EMISSIVES:
            return False
        if scene["alias_packed"].shape[0] > MAX_ALIAS_SLOTS:
            return False
        if scene["em_tri_pos_flat"].shape[0] > MAX_EM_TRIS:
            return False
    return True


# ---------------------------------------------------------------------------
# packing helpers (share trace_pallas's 8-per-row triangle layout)
# ---------------------------------------------------------------------------

def _pack8(table, width=16):
    p, c = table.shape
    rows = max(8, -(-p // 8) * 8)
    pad = jnp.full((rows - p, c), 0.0, table.dtype)
    t = jnp.concatenate([table, pad], axis=0) if rows > p else table
    if c < width:
        fill = jnp.zeros((rows, width - c), table.dtype)
        if c == 10:
            t = t.at[p:, 9].set(-1.0)
        t = jnp.concatenate([t, fill], axis=1)
    return t.reshape(rows // 8, 8 * width)


def _pack_params(scene, view, frame, n_em, has_sun=True):
    z = jnp.zeros((_LANES,), jnp.float32)
    row0 = z
    row0 = row0.at[_P_DIRL:_P_DIRL + 3].set(scene["dir_to_light"])
    row0 = row0.at[_P_DIRC:_P_DIRC + 3].set(scene["dir_color"][:3])
    row0 = row0.at[_P_AMB:_P_AMB + 3].set(scene["ambient_color"][:3])
    row0 = row0.at[_P_COS_SOLAR].set(jnp.cos(frame["solar_angle"]))
    row0 = row0.at[_P_CAM:_P_CAM + 3].set(view["world_position"])
    row0 = row0.at[_P_MAX_IND].set(frame["max_indirect_luminance"])
    row0 = row0.at[_P_ADV].set(
        frame["number"].astype(jnp.float32) * GOLDEN_RATIO)
    if n_em > 0:
        order = scene["em_leaf_order"][:n_em]
        em = scene["em_packed"][order]           # [E,12] leaf-order rows
        inst = jnp.round(em[:, 8]).astype(jnp.int32)
        tri_off = scene["em_inst_tri_offset_f"][inst]
        for e in range(n_em):
            o = _P_EM + _EM_STRIDE * e
            row0 = lax.dynamic_update_slice(
                row0,
                jnp.stack([em[e, 4], em[e, 5], em[e, 6], em[e, 7], em[e, 8],
                           em[e, 9], em[e, 10], em[e, 11], tri_off[e], 0.0]),
                (o,))
    row0 = row0.at[_P_MAXCNT].set(
        jnp.minimum(frame["max_temporal_reuse_count"], 1e30))
    row1 = z
    if n_em > 0:
        a = scene["alias_packed"]                # [A,2] (prob, alias)
        flat = a.reshape(-1)
        row1 = lax.dynamic_update_slice(row1, flat, (0,))
    row2 = z
    fnum = frame["number"]
    d_iv = jnp.maximum(frame["direct_validate_interval"], 1)
    e_iv = jnp.maximum(frame["emissive_validate_interval"], 1)
    # flags only for ACTIVE channels: they select the validation-retrace
    # kernel variant, so an absent channel must not force the slow path
    row2 = row2.at[0].set(((fnum % d_iv) == 0).astype(jnp.float32)
                          * float(has_sun))
    row2 = row2.at[1].set(((fnum % e_iv) == 0).astype(jnp.float32)
                          * float(n_em > 0))
    return jnp.stack([row0, row1, row2])         # [3,128]


# ---------------------------------------------------------------------------
# in-kernel reservoir bit packing (ops/reservoir.py layout, u32 math —
# width-changing bitcasts are not available in Mosaic, so the bf16 pairs
# use an explicit round-to-nearest-even on the raw bits, which matches
# XLA's f32->bf16 cast for all finite values)
# ---------------------------------------------------------------------------

def _bits(f):
    return lax.bitcast_convert_type(f, jnp.uint32)


def _fbits(u):
    return lax.bitcast_convert_type(u.astype(jnp.uint32), jnp.float32)


def _rne16(f):
    u = _bits(f)
    return (u + 0x7FFF + ((u >> 16) & 1)) >> 16


def _kbf16_pair(a, b):
    return _fbits(_rne16(a) | (_rne16(b) << 16))


def _kbf16_unpair(lane):
    u = _bits(lane)
    return _fbits((u & 0xFFFF) << 16), _fbits(u & jnp.uint32(0xFFFF0000))


def _kunorm16_pair(a, b):
    # Mosaic has no f32<->u32 casts; the values fit i32, so route there
    ua = jnp.round(jnp.clip(a, 0.0, 1.0) * 65535.0) \
        .astype(jnp.int32).astype(jnp.uint32)
    ub = jnp.round(jnp.clip(b, 0.0, 1.0) * 65535.0) \
        .astype(jnp.int32).astype(jnp.uint32)
    return _fbits(ua | (ub << 16))


def _kunorm16_unpair(lane):
    u = _bits(lane)
    return ((u & 0xFFFF).astype(jnp.int32).astype(jnp.float32) / 65535.0,
            (u >> 16).astype(jnp.int32).astype(jnp.float32) / 65535.0)


def _ksnorm8_vec(n3, extra_u8):
    def enc(v):
        return jnp.round((jnp.clip(v, -1.0, 1.0) * 0.5 + 0.5)
                         * 255.0).astype(jnp.int32).astype(jnp.uint32)

    word = (enc(n3[0]) | (enc(n3[1]) << 8) | (enc(n3[2]) << 16)
            | (extra_u8.astype(jnp.int32).astype(jnp.uint32) << 24))
    return _fbits(word)


def _ksnorm8_unvec(lane):
    u = _bits(lane)

    def dec(shift):
        return (((u >> shift) & 0xFF).astype(jnp.int32)
                .astype(jnp.float32) / 255.0 * 2.0 - 1.0)

    return (dec(0), dec(8), dec(16)), \
        (u >> 24).astype(jnp.int32).astype(jnp.float32)


def _unpack_prev(ref):
    """Gathered prev-reservoir planes ([bh,16,w] block ref) -> dict of
    [bh,w] planes (ops/reservoir.py unpack, u32 math)."""
    return _unpack_take(lambda i: ref[:, i, :])


def _unpack_take(t):
    """Reservoir unpack from a plane accessor t(i) -> [bh,w] (shared by
    light_fused and spatial_fused, which reads rolled window slices)."""
    rad01 = _kbf16_unpair(t(8))
    rad23 = _kbf16_unpair(t(9))
    rnd01 = _kunorm16_unpair(t(10))
    rnd23 = _kunorm16_unpair(t(11))
    (vnx, vny, vnz), life = _ksnorm8_unvec(t(12))
    (snx, sny, snz), sflag = _ksnorm8_unvec(t(13))
    count, w = _kbf16_unpair(t(14))
    w_sum, w2_sum = _kbf16_unpair(t(15))
    return {
        "vpx": t(0), "vpy": t(1), "vpz": t(2), "vpd": t(3),
        "spx": t(4), "spy": t(5), "spz": t(6),
        "spw": (sflag > 127.0).astype(jnp.float32),
        "vinst": t(7),
        "rad_r": rad01[0], "rad_g": rad01[1],
        "rad_b": rad23[0], "rad_a": rad23[1],
        "rnd0": rnd01[0], "rnd1": rnd01[1],
        "rnd2": rnd23[0], "rnd3": rnd23[1],
        "vnx": vnx, "vny": vny, "vnz": vnz, "life": life,
        "snx": snx, "sny": sny, "snz": snz,
        "count": count, "w": w, "w_sum": w_sum, "w2_sum": w2_sum,
    }


def _pack_out(ref, r):
    """Inverse of _unpack_prev into a [bh,16,w] output block ref."""
    ref[:, 0, :] = r["vpx"]
    ref[:, 1, :] = r["vpy"]
    ref[:, 2, :] = r["vpz"]
    ref[:, 3, :] = r["vpd"]
    ref[:, 4, :] = r["spx"]
    ref[:, 5, :] = r["spy"]
    ref[:, 6, :] = r["spz"]
    ref[:, 7, :] = r["vinst"]
    ref[:, 8, :] = _kbf16_pair(r["rad_r"], r["rad_g"])
    ref[:, 9, :] = _kbf16_pair(r["rad_b"], r["rad_a"])
    ref[:, 10, :] = _kunorm16_pair(r["rnd0"], r["rnd1"])
    ref[:, 11, :] = _kunorm16_pair(r["rnd2"], r["rnd3"])
    ref[:, 12, :] = _ksnorm8_vec(
        (r["vnx"], r["vny"], r["vnz"]), jnp.clip(r["life"], 0.0, 255.0))
    ref[:, 13, :] = _ksnorm8_vec(
        (r["snx"], r["sny"], r["snz"]),
        (r["spw"] > 0.5).astype(jnp.float32) * 255.0)
    ref[:, 14, :] = _kbf16_pair(r["count"], r["w"])
    ref[:, 15, :] = _kbf16_pair(r["w_sum"], r["w2_sum"])


_RSV_SAMPLE_KEYS = ("rad_r", "rad_g", "rad_b", "rad_a",
                    "rnd0", "rnd1", "rnd2", "rnd3",
                    "vpx", "vpy", "vpz", "vpd",
                    "vnx", "vny", "vnz", "vinst",
                    "spx", "spy", "spz", "spw",
                    "snx", "sny", "snz")


def _rsv_zero_where(mask, r):
    out = {k: jnp.where(mask, 0.0, v) for k, v in r.items()}
    out["vinst"] = jnp.where(mask, -1.0, r["vinst"])
    return out


def _rsv_update(r, s, w_new, mask):
    """WRS update (reservoir.update_reservoir, light.wgsl:146-173)."""
    w_sum = r["w_sum"] + w_new
    w2_sum = r["w2_sum"] + w_new * w_new
    count = r["count"] + 1.0
    rand = jnp.mod(s["rnd0"] + s["rnd1"] + s["rnd2"] + s["rnd3"], 1.0)
    replace = mask & (rand < w_new / jnp.maximum(w_sum, 1e-30))
    out = dict(r)
    out["w_sum"] = jnp.where(mask, w_sum, r["w_sum"])
    out["w2_sum"] = jnp.where(mask, w2_sum, r["w2_sum"])
    out["count"] = jnp.where(mask, count, r["count"])
    for k in _RSV_SAMPLE_KEYS:
        out[k] = jnp.where(replace, s[k], r[k])
    return out


def _rsv_clamp(r, max_count):
    over = r["count"] > max_count
    scale = jnp.where(over, max_count / jnp.maximum(r["count"], 1e-30), 1.0)
    out = dict(r)
    out["w_sum"] = r["w_sum"] * scale
    out["w2_sum"] = r["w2_sum"] * scale
    out["count"] = jnp.minimum(r["count"], max_count)
    return out


def _rsv_set(s, w_new):
    r = dict(s)
    r["count"] = jnp.ones_like(w_new)
    r["life"] = jnp.zeros_like(w_new)
    r["w"] = jnp.zeros_like(w_new)
    r["w_sum"] = w_new
    r["w2_sum"] = w_new * w_new
    return r


def _rsv_where(mask, a, b):
    return {k: jnp.where(mask, a[k], b[k]) for k in b}


# ---------------------------------------------------------------------------
# in-kernel math (component-wise over [B,128] blocks)
# ---------------------------------------------------------------------------

def _rsqrt_n(x, y, z):
    inv = lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _lum(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _onb_apply(nx, ny, nz, lx, ly, lz):
    """apply_normal_basis (utils.wgsl:42-50), component form."""
    s = jnp.minimum(jnp.sign(nz) * 2.0 + 1.0, 1.0)
    u = -1.0 / (s + nz)
    v = nx * ny * u
    tx = 1.0 + s * nx * nx * u
    ty = s * v
    tz = -s * nx
    bx = v
    by = s + ny * ny * u
    bz = -ny
    return (tx * lx + bx * ly + nx * lz,
            ty * lx + by * ly + ny * lz,
            tz * lx + bz * ly + nz * lz)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _env_brdf_approx(f0r, f0g, f0b, pr, nov):
    """Karis EnvBRDFApprox, component form (utils/math.py:226-237)."""
    r0 = 1.0 - pr
    r1 = 0.0425 - 0.0275 * pr
    r2 = 1.04 - 0.572 * pr
    r3 = 0.022 * pr - 0.04
    a004 = jnp.minimum(r0 * r0, jnp.exp2(-9.28 * nov)) * r0 + r1
    ab_x = -1.04 * a004 + r2
    ab_y = 1.04 * a004 + r3
    return f0r * ab_x + ab_y, f0g * ab_x + ab_y, f0b * ab_x + ab_y


class _Surface:
    """Per-lane surface fields + derived f0/diffuse (ops/shading.py)."""

    def __init__(self, br, bg, bb, emr, emg, emb, ema, pr, metal, refl):
        self.em = (emr, emg, emb, ema)
        clamped = jnp.clip(pr, 0.089, 1.0)
        self.rough = clamped * clamped
        f = 0.16 * refl * refl * (1.0 - metal)
        self.f0 = (f + br * metal, f + bg * metal, f + bb * metal)
        self.diff = (br * (1.0 - metal), bg * (1.0 - metal),
                     bb * (1.0 - metal))


def _mat_sweep(mats_ref, n_mats, mat_f):
    """Material row select-sweep -> _Surface (retrieve_surface, no-texture).

    mat_f: float material ids (already max(id,0) like the XLA path)."""
    fields = [mats_ref[0, f] for f in range(11)]
    out = [jnp.full(mat_f.shape, v, jnp.float32) for v in fields]
    for m in range(1, n_mats):
        sel = mat_f == float(m)
        for f in range(11):
            out[f] = jnp.where(sel, mats_ref[m, f], out[f])
    br, bg, bb = out[0], out[1], out[2]
    emr, emg, emb, ema = out[4], out[5], out[6], out[7]
    return _Surface(br, bg, bb, emr, emg, emb, ema, out[8], out[9], out[10])


def _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz, nx, ny, nz, lx, ly, lz,
           rad_r, rad_g, rad_b, rad_a):
    """shading() (light.wgsl:869-888): lit*a + ambient*(1-a)."""
    hx, hy, hz = _rsqrt_n(lx + vx, ly + vy, lz + vz)
    nol = jnp.clip(_dot(nx, ny, nz, lx, ly, lz), 0.0, 1.0)
    noh = jnp.clip(_dot(nx, ny, nz, hx, hy, hz), 0.0, 1.0)
    loh = jnp.clip(_dot(lx, ly, lz, hx, hy, hz), 0.0, 1.0)
    nov = jnp.maximum(_dot(nx, ny, nz, vx, vy, vz), 0.0001)
    rough = surf.rough
    # Fd_Burley
    f90 = 0.5 + 2.0 * rough * loh * loh
    fd = ((1.0 + (f90 - 1.0) * _pow5(1.0 - nol))
          * (1.0 + (f90 - 1.0) * _pow5(1.0 - nov)) * (1.0 / PI))
    # GGX D * V
    one_minus = 1.0 - noh * noh
    a_ = noh * rough
    k = rough / (one_minus + a_ * a_)
    d = k * k * (1.0 / PI)
    a2 = rough * rough
    lam_v = nol * jnp.sqrt((nov - a2 * nov) * nov + a2)
    lam_l = nov * jnp.sqrt((nol - a2 * nol) * nol + a2)
    vis = 0.5 / jnp.maximum(lam_v + lam_l, 1e-7)
    dv = d * vis
    f0r, f0g, f0b = surf.f0
    fr90 = jnp.clip(
        (f0r + f0g + f0b) * (50.0 * 0.33), 0.0, 1.0)
    sch = _pow5(1.0 - loh)
    fr = f0r + (fr90 - f0r) * sch
    fg = f0g + (fr90 - f0g) * sch
    fb = f0b + (fr90 - f0b) * sch
    dr, dg, db = surf.diff
    lit_r = (dv * fr + dr * fd) * rad_r * nol
    lit_g = (dv * fg + dg * fd) * rad_g * nol
    lit_b = (dv * fb + db * fd) * rad_b * nol
    # ambient (occlusion == 1 in the no-texture path)
    da_r, da_g, da_b = _env_brdf_approx(dr, dg, db, jnp.ones_like(nov), nov)
    sa_r, sa_g, sa_b = _env_brdf_approx(f0r, f0g, f0b, rough, nov)
    am_r = (da_r + sa_r) * amb_r
    am_g = (da_g + sa_g) * amb_g
    am_b = (da_b + sa_b) * amb_b
    one_m = 1.0 - rad_a
    return (lit_r * rad_a + am_r * one_m,
            lit_g * rad_a + am_g * one_m,
            lit_b * rad_a + am_b * one_m)


def _shadow_sweep(tris_ref, n_rows, ox, oy, oz, dx, dy, dz, maxt, excl):
    """Division-free occlusion loop (trace_pallas._kernel_shadow).

    Returns (occluded, t) with t = nearest accepted hit distance."""

    def body(r, carry):
        row = tris_ref[pl.ds(r, 1), :]
        for k in range(8):
            td_best, ads_best, inst_best = carry
            o = k * 16
            v0x, v0y, v0z = row[0, o], row[0, o + 1], row[0, o + 2]
            v1x, v1y, v1z = row[0, o + 3], row[0, o + 4], row[0, o + 5]
            v2x, v2y, v2z = row[0, o + 6], row[0, o + 7], row[0, o + 8]
            inst = row[0, o + 9]
            abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
            acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
            ux = dy * acz - dz * acy
            uy = dz * acx - dx * acz
            uz = dx * acy - dy * acx
            det = abx * ux + aby * uy + abz * uz
            s = jnp.sign(det)
            ads = det * s
            aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
            ud = (aox * ux + aoy * uy + aoz * uz) * s
            vx = aoy * abz - aoz * aby
            vy = aoz * abx - aox * abz
            vz = aox * aby - aoy * abx
            vd = (dx * vx + dy * vy + dz * vz) * s
            td = (acx * vx + acy * vy + acz * vz) * s
            ok = ((ads >= F32_EPSILON)
                  & (ud >= 0.0) & (vd >= 0.0) & (ud + vd <= ads)
                  & (td > F32_EPSILON * ads)
                  & (td < maxt * ads)
                  & (td * ads_best < td_best * ads)
                  & (inst >= 0.0) & (inst != excl))
            carry = (jnp.where(ok, td, td_best),
                     jnp.where(ok, ads, ads_best),
                     jnp.where(ok, inst, inst_best))
        return carry

    shape = ox.shape
    init = (jnp.full(shape, F32_MAX, jnp.float32),
            jnp.ones(shape, jnp.float32),
            jnp.full(shape, -1.0, jnp.float32))
    td, ads, inst = lax.fori_loop(0, n_rows, body, init)
    occluded = inst >= 0.0
    return occluded, jnp.where(occluded, td / ads, F32_MAX), inst


def _trace_full_sweep(tris_ref, attr_ref, n_rows, ox, oy, oz, dx, dy, dz,
                      maxt, excl, incl):
    """Nearest-hit with fused attribute interpolation
    (trace_pallas._kernel_full). Returns (t, nx, ny, nz unnormalized
    interp, mat, inst); miss inst = -1."""

    def body(r, carry):
        row = tris_ref[pl.ds(r, 1), :]
        arow = attr_ref[pl.ds(r, 1), :]
        for k in range(8):
            t_best, nxb, nyb, nzb, matb, instb = carry
            o = k * 16
            v0x, v0y, v0z = row[0, o], row[0, o + 1], row[0, o + 2]
            v1x, v1y, v1z = row[0, o + 3], row[0, o + 4], row[0, o + 5]
            v2x, v2y, v2z = row[0, o + 6], row[0, o + 7], row[0, o + 8]
            inst = row[0, o + 9]
            abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
            acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
            ux = dy * acz - dz * acy
            uy = dz * acx - dx * acz
            uz = dx * acy - dy * acx
            det = abx * ux + aby * uy + abz * uz
            inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0, 1.0 / det)
            aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
            u = (aox * ux + aoy * uy + aoz * uz) * inv_det
            vx = aoy * abz - aoz * aby
            vy = aoz * abx - aox * abz
            vz = aox * aby - aoy * abx
            v = (dx * vx + dy * vy + dz * vz) * inv_det
            dist = (acx * vx + acy * vy + acz * vz) * inv_det
            ok = ((jnp.abs(det) >= F32_EPSILON)
                  & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0)
                  & (dist > F32_EPSILON)
                  & (dist < maxt) & (dist < t_best)
                  & (inst >= 0.0) & (inst != excl)
                  & ((incl < 0.0) | (inst == incl)))
            a0 = o
            nx = (arow[0, a0] + u * (arow[0, a0 + 3] - arow[0, a0])
                  + v * (arow[0, a0 + 6] - arow[0, a0]))
            ny = (arow[0, a0 + 1] + u * (arow[0, a0 + 4] - arow[0, a0 + 1])
                  + v * (arow[0, a0 + 7] - arow[0, a0 + 1]))
            nz = (arow[0, a0 + 2] + u * (arow[0, a0 + 5] - arow[0, a0 + 2])
                  + v * (arow[0, a0 + 8] - arow[0, a0 + 2]))
            carry = (jnp.where(ok, dist, t_best),
                     jnp.where(ok, nx, nxb), jnp.where(ok, ny, nyb),
                     jnp.where(ok, nz, nzb),
                     jnp.where(ok, arow[0, a0 + 15], matb),
                     jnp.where(ok, inst, instb))
        return carry

    shape = ox.shape
    z = jnp.zeros(shape, jnp.float32)
    init = (jnp.full(shape, F32_MAX, jnp.float32), z, z, z,
            jnp.full(shape, -1.0, jnp.float32),
            jnp.full(shape, -1.0, jnp.float32))
    return lax.fori_loop(0, n_rows, body, init)


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------

def _build_kernel(*, has_sun: bool, emissive_on: bool, bounces: int,
                  n_em: int, n_alias: int, n_em_tris: int, n_mats: int,
                  n_tri_rows: int, n_em_rows: int, temporal: bool = False,
                  validation: bool = True, track_de: bool = False,
                  track_ind: bool = False):
    """Returns the fused kernel for one static configuration. With
    temporal=True the kernel additionally takes the reprojection-gathered
    previous reservoir planes per active channel and runs the FULL
    temporal-ReSTIR path in-kernel (gates, WRS merge, validation retrace
    masked by the per-channel validation flag, finalize, repack) —
    restir.direct_lit / indirect_lit_ambient with temporal_reuse=True.

    validation=False compiles the variant WITHOUT the validation retrace
    (the candidate re-select + probe + shadow sweep of the reservoir's
    remembered sample, ~1/3 of the temporal kernel's cost): on frames
    where no channel's validate interval fires, the retrace result is
    discarded anyway (take_v = 0), so fused_lighting dispatches this
    cheaper variant via lax.cond on the per-frame flags."""

    def select_emissive_candidate(params, em_tris, em_attrs, rand,
                                  px, py, pz, nx, ny, nz, excl_f):
        """select_light_candidate(sample_emissive=True) in-kernel.

        rand = (r0, r1, r2, r3). Returns dict of per-lane candidate +
        probe-info fields (sampling.py:139-240 semantics)."""
        r0, r1, r2, r3 = rand
        # solar-cone fallback direction (sample_uniform_cone around
        # dir_to_light; scalar ONB)
        cos_solar = params[0, _P_COS_SOLAR]
        cz = 1.0 - (1.0 - cos_solar) * r2
        theta = TAU * r3
        cr = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
        lx_, ly_, lz_ = cr * jnp.cos(theta), cr * jnp.sin(theta), cz
        dlx = params[0, _P_DIRL]
        dly = params[0, _P_DIRL + 1]
        dlz = params[0, _P_DIRL + 2]
        rdx0, rdy0, rdz0 = _onb_apply(dlx, dly, dlz, lx_, ly_, lz_)

        if not emissive_on:
            z = jnp.zeros_like(r0)
            return {
                "dx": rdx0, "dy": rdy0, "dz": rdz0,
                "p": jnp.ones_like(r0), "maxd": jnp.full_like(r0, F32_MAX),
                "mind": jnp.full_like(r0, DISTANCE_MAX),
                "em_inst": jnp.full_like(r0, -1.0),
                "info_inst": jnp.full_like(r0, -1.0),
                "info_mat": jnp.full_like(r0, -1.0),
                "spx": px + rdx0 * DISTANCE_MAX,
                "spy": py + rdy0 * DISTANCE_MAX,
                "spz": pz + rdz0 * DISTANCE_MAX,
                "spw": z, "snx": z, "sny": z, "snz": z,
            }

        # --- emissive-BVH leaf walk, statically unrolled (leaf order)
        picked = jnp.full_like(r0, -1.0)
        count = jnp.zeros_like(r0)
        rand_w = r0
        for e in range(n_em):
            o = _P_EM + _EM_STRIDE * e
            cx_, cy_, cz2 = params[0, o], params[0, o + 1], params[0, o + 2]
            rad_ = params[0, o + 3]
            inst_e = params[0, o + 4]
            inside = ((px > cx_ - rad_) & (px < cx_ + rad_)
                      & (py > cy_ - rad_) & (py < cy_ + rad_)
                      & (pz > cz2 - rad_) & (pz < cz2 + rad_))
            take_leaf = inside & (inst_e != excl_f)
            new_rand = jnp.mod(rand_w + GOLDEN_RATIO, 1.0)
            rand_w = jnp.where(take_leaf, new_rand, rand_w)
            count = jnp.where(take_leaf, count + 1.0, count)
            take = take_leaf & (rand_w < 1.0 / jnp.maximum(count, 1.0))
            picked = jnp.where(take, float(e), picked)
        has_pick = picked >= 0.0

        # fields of the picked emissive (sweep; picked<0 uses row 0 like the
        # XLA path's max(picked,0) — masked out by has_pick downstream)
        def em_field(off):
            out = jnp.full_like(r0, params[0, _P_EM + off])
            for e in range(1, n_em):
                out = jnp.where(picked == float(e),
                                params[0, _P_EM + _EM_STRIDE * e + off], out)
            return out

        em_inst = em_field(4)
        a_off = em_field(5)
        a_cnt = em_field(6)
        area = em_field(7)
        tri_off = em_field(8)

        # alias-table triangle pick (light.wgsl:662-669)
        ai = jnp.minimum(jnp.floor(r0 * a_cnt),
                         jnp.maximum(a_cnt - 1.0, 0.0))
        slot = a_off + ai
        prob = jnp.zeros_like(r0)
        alias_v = jnp.zeros_like(r0)
        for s_i in range(n_alias):
            sel = slot == float(s_i)
            prob = jnp.where(sel, params[1, 2 * s_i], prob)
            alias_v = jnp.where(sel, params[1, 2 * s_i + 1], alias_v)
        prim_local = jnp.where(r1 < prob, alias_v, ai)
        em_prim = tri_off + prim_local

        # sampled triangle vertices (sweep over the emissive-only table)
        v0x = jnp.zeros_like(r0)
        v0y = jnp.zeros_like(r0)
        v0z = jnp.zeros_like(r0)
        v1x = jnp.zeros_like(r0)
        v1y = jnp.zeros_like(r0)
        v1z = jnp.zeros_like(r0)
        v2x = jnp.zeros_like(r0)
        v2y = jnp.zeros_like(r0)
        v2z = jnp.zeros_like(r0)
        for t_i in range(n_em_tris):
            sel = em_prim == float(t_i)
            row, o = t_i // 8, (t_i % 8) * 16
            v0x = jnp.where(sel, em_tris[row, o], v0x)
            v0y = jnp.where(sel, em_tris[row, o + 1], v0y)
            v0z = jnp.where(sel, em_tris[row, o + 2], v0z)
            v1x = jnp.where(sel, em_tris[row, o + 3], v1x)
            v1y = jnp.where(sel, em_tris[row, o + 4], v1y)
            v1z = jnp.where(sel, em_tris[row, o + 5], v1z)
            v2x = jnp.where(sel, em_tris[row, o + 6], v2x)
            v2y = jnp.where(sel, em_tris[row, o + 7], v2y)
            v2z = jnp.where(sel, em_tris[row, o + 8], v2z)

        srx = jnp.sqrt(r2)
        b0 = 1.0 - srx
        b1 = r3 * srx
        b2 = 1.0 - b0 - b1
        tx = b0 * v0x + b1 * v1x + b2 * v2x
        ty = b0 * v0y + b1 * v1y + b2 * v2y
        tz = b0 * v0z + b1 * v1z + b2 * v2z

        rox = px + nx * RAY_BIAS
        roy = py + ny * RAY_BIAS
        roz = pz + nz * RAY_BIAS
        rdx, rdy, rdz = _rsqrt_n(tx - px, ty - py, tz - pz)

        # probe ray restricted to the picked emitter (light.wgsl:672-687)
        incl = jnp.where(has_pick, em_inst, -2.0)
        pt, pnx, pny, pnz, pmat, pinst = _trace_full_sweep(
            em_tris, em_attrs, n_em_rows, rox, roy, roz, rdx, rdy, rdz,
            jnp.full_like(r0, F32_MAX), jnp.full_like(r0, -1.0), incl)
        pnx, pny, pnz = _rsqrt_n(pnx, pny, pnz)
        probe_hit = pinst >= 0.0
        probe_ok = (has_pick & (_dot(rdx, rdy, rdz, nx, ny, nz) > 0.0)
                    & probe_hit)

        # hit position (trace_pallas: t -> DISTANCE_MAX on miss)
        ptt = jnp.where(probe_hit, pt, DISTANCE_MAX)
        hpx = rox + rdx * ptt
        hpy = roy + rdy * ptt
        hpz = roz + rdz * ptt

        # pdf = d^2 / |cos * area| / count (light.wgsl:695-696)
        dx_ = hpx - px
        dy_ = hpy - py
        dz_ = hpz - pz
        d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
        denom = jnp.abs(_dot(rdx, rdy, rdz, pnx, pny, pnz) * area)
        p_em = d2 / jnp.maximum(denom, 1e-20) / jnp.maximum(count, 1.0)

        sel = probe_ok
        # fallback sample position: empty_hit_info(ro, rand_direction) on
        # the probe-fail branch (sampling.py:233-239)
        fpx = rox + rdx0 * DISTANCE_MAX
        fpy = roy + rdy0 * DISTANCE_MAX
        fpz = roz + rdz0 * DISTANCE_MAX
        return {
            "dx": jnp.where(sel, rdx, rdx0),
            "dy": jnp.where(sel, rdy, rdy0),
            "dz": jnp.where(sel, rdz, rdz0),
            "p": jnp.where(sel, p_em, 1.0),
            "maxd": jnp.where(sel, pt, F32_MAX),
            "mind": jnp.where(sel, pt - 0.1, DISTANCE_MAX),
            "em_inst": jnp.where(sel, em_inst, -1.0),
            "info_inst": jnp.where(sel, pinst, -1.0),
            "info_mat": jnp.where(sel, pmat, -1.0),
            "spx": jnp.where(sel, hpx, fpx),
            "spy": jnp.where(sel, hpy, fpy),
            "spz": jnp.where(sel, hpz, fpz),
            "spw": jnp.where(sel & probe_hit, 1.0, 0.0),
            "snx": jnp.where(sel, pnx, 0.0),
            "sny": jnp.where(sel, pny, 0.0),
            "snz": jnp.where(sel, pnz, 0.0),
        }

    n_prev = (int(has_sun) + int(emissive_on)
              + int(bounces > 0)) if temporal else 0

    def kernel(params, tris, attrs, em_tris, em_attrs, mats,
               px_r, py_r, pz_r, dep_r, nx_r, ny_r, nz_r, inst_r, mat_r,
               r0_r, r1_r, r2_r, r3_r, *rest):
        prev_refs = list(rest[:n_prev])
        outs = rest[n_prev:]
        px, py, pz = px_r[:], py_r[:], pz_r[:]
        depth = dep_r[:]
        nx, ny, nz = nx_r[:], ny_r[:], nz_r[:]
        inst_f = inst_r[:]
        mat_f = mat_r[:]
        r0, r1, r2, r3 = r0_r[:], r1_r[:], r2_r[:], r3_r[:]

        valid = depth >= F32_EPSILON
        amb_r = params[0, _P_AMB]
        amb_g = params[0, _P_AMB + 1]
        amb_b = params[0, _P_AMB + 2]
        # visible surface + view (shared by every channel)
        surf = _mat_sweep(mats, n_mats, mat_f)
        vx, vy, vz = _rsqrt_n(params[0, _P_CAM] - px,
                              params[0, _P_CAM + 1] - py,
                              params[0, _P_CAM + 2] - pz)
        emr, emg, emb, ema = surf.em
        em_add = 255.0 * ema
        out_i = 0

        nrm_n = _rsqrt_n(nx, ny, nz)

        def gates(r):
            """check_previous_reservoir (light.wgsl:917-935). Returns the
            gated reservoir and the miss mask (the miss mask drives the
            spatial-buffer invalidation scatter when tracking)."""
            ratio = r["vpd"] / jnp.where(depth == 0.0, 1e-30, depth)
            ratio = jnp.where(ratio < 1.0,
                              1.0 / jnp.where(ratio == 0.0, 1e-30, ratio),
                              ratio)
            depth_miss = ratio > 1.05 * (1.0 + 0.5 * r0)
            inst_miss = r["vinst"] != inst_f
            normal_miss = _dot(nrm_n[0], nrm_n[1], nrm_n[2],
                               r["vnx"], r["vny"], r["vnz"]) < 0.9
            miss = depth_miss | inst_miss | normal_miss
            return _rsv_zero_where(miss, r), miss

        def cur_sample(cand, rad):
            """This frame's candidate as reservoir-sample fields."""
            return {
                "rad_r": rad[0], "rad_g": rad[1],
                "rad_b": rad[2], "rad_a": rad[3],
                "rnd0": r0, "rnd1": r1, "rnd2": r2, "rnd3": r3,
                "vpx": px, "vpy": py, "vpz": pz, "vpd": depth,
                "vnx": nx, "vny": ny, "vnz": nz,
                "vinst": inst_f,
                "spx": cand["spx"], "spy": cand["spy"], "spz": cand["spz"],
                "spw": cand.get("spw", jnp.zeros_like(r0)),
                "snx": cand.get("snx", jnp.zeros_like(r0)),
                "sny": cand.get("sny", jnp.zeros_like(r0)),
                "snz": cand.get("snz", jnp.zeros_like(r0)),
            }

        def trace_candidate(cand, directional: bool, rand4=None):
            """Candidate -> shadow -> input_radiance. Returns
            (rad rgba, w_new, sample fields incl. occlusion override)."""
            rdx, rdy, rdz = cand["dx"], cand["dy"], cand["dz"]
            trace_ok = (_dot(rdx, rdy, rdz, nx, ny, nz) > 0.0) \
                & (cand["p"] > 0.0)
            if not directional:
                trace_ok &= cand["em_inst"] >= 0.0
            rox = px + nx * RAY_BIAS
            roy = py + ny * RAY_BIAS
            roz = pz + nz * RAY_BIAS
            occluded, sh_t, sh_inst = _shadow_sweep(
                tris, n_tri_rows, rox, roy, roz, rdx, rdy, rdz,
                cand["maxd"], cand["em_inst"])
            info_inst = jnp.where(occluded, sh_inst, cand["info_inst"])
            info_mat = jnp.where(occluded, -1.0, cand["info_mat"])
            spx = jnp.where(occluded, rox + rdx * sh_t, cand["spx"])
            spy = jnp.where(occluded, roy + rdy * sh_t, cand["spy"])
            spz = jnp.where(occluded, roz + rdz * sh_t, cand["spz"])
            spw = jnp.where(occluded, 1.0,
                            cand.get("spw", jnp.zeros_like(r0)))
            snx = jnp.where(occluded, 0.0,
                            cand.get("snx", jnp.zeros_like(r0)))
            sny = jnp.where(occluded, 0.0,
                            cand.get("sny", jnp.zeros_like(r0)))
            snz = jnp.where(occluded, 0.0,
                            cand.get("snz", jnp.zeros_like(r0)))
            miss = info_inst < 0.0
            if directional:
                cosdl = _dot(rdx, rdy, rdz, params[0, _P_DIRL],
                             params[0, _P_DIRL + 1], params[0, _P_DIRL + 2])
                take_dir = miss & (cosdl >= params[0, _P_COS_SOLAR])
                rad_r = jnp.where(take_dir, params[0, _P_DIRC], 0.0)
                rad_g = jnp.where(take_dir, params[0, _P_DIRC + 1], 0.0)
                rad_b = jnp.where(take_dir, params[0, _P_DIRC + 2], 0.0)
                rad_a = 1.0 - (miss & ~take_dir).astype(jnp.float32)
            else:
                hsurf = _mat_sweep(mats, n_mats, jnp.maximum(info_mat, 0.0))
                hr, hg, hb, ha = hsurf.em
                take_em = (~miss) & (info_inst == cand["em_inst"])
                s255 = 255.0 * ha
                rad_r = jnp.where(take_em, s255 * hr, 0.0)
                rad_g = jnp.where(take_em, s255 * hg, 0.0)
                rad_b = jnp.where(take_em, s255 * hb, 0.0)
                rad_a = 1.0 - miss.astype(jnp.float32)
            rad_r = jnp.where(trace_ok, rad_r, 0.0)
            rad_g = jnp.where(trace_ok, rad_g, 0.0)
            rad_b = jnp.where(trace_ok, rad_b, 0.0)
            rad_a = jnp.where(trace_ok, rad_a, 0.0)
            lum = _lum(rad_r, rad_g, rad_b)
            w_new = jnp.where(cand["p"] > 0.0,
                              lum / jnp.maximum(cand["p"], 1e-30), 0.0)
            return ((rad_r, rad_g, rad_b, rad_a), w_new,
                    {"spx": spx, "spy": spy, "spz": spz, "spw": spw,
                     "snx": snx, "sny": sny, "snz": snz})

        def reuse_channel(cand_fn, prev_ref, directional: bool,
                          is_val):
            """Full temporal path (restir.direct_lit temporal branch).

            Returns ((r,g,b), var, reservoir, trk) where trk =
            (gate_miss, val_miss, scatter_reservoir) feeds the caller's
            spatial-buffer invalidation replace when tracking spatial
            reuse (the analog of light.wgsl:1092-1095 / 1199-1202)."""
            r, gate_miss = gates(_unpack_prev(prev_ref))
            cand = cand_fn((r0, r1, r2, r3))
            rad, w_new, sp = trace_candidate(cand, directional)
            s2 = cur_sample(cand, rad)
            s2.update(sp)
            gate = valid & ((is_val < 0.5) | (r["count"] < 4.0))
            rcur = _rsv_clamp(_rsv_update(r, s2, w_new, gate),
                            params[0, _P_MAXCNT])
            r_scatter = dict(rcur)
            val_miss = jnp.zeros_like(valid)
            # validation retrace of the reservoir's remembered sample
            # (light.wgsl:1156-1213): a full candidate re-select +
            # probe + shadow sweep. Only applied on validation frames
            # (take_v), so fused_lighting compiles a second variant
            # without it and dispatches by the per-frame flags.
            if validation:
                r_rand = (r["rnd0"], r["rnd1"], r["rnd2"], r["rnd3"])
                cand_v = cand_fn(r_rand, pos=(r["vpx"], r["vpy"], r["vpz"]),
                                 nrm=(r["vnx"], r["vny"], r["vnz"]))
                rvx, rvy, rvz = _rsqrt_n(r["spx"] - px, r["spy"] - py,
                                         r["spz"] - pz)
                trace_ok_v = (_dot(cand_v["dx"], cand_v["dy"], cand_v["dz"],
                                   r["vnx"], r["vny"], r["vnz"]) > 0.0) \
                    & (cand_v["p"] > 0.0)
                if not directional:
                    trace_ok_v &= cand_v["em_inst"] >= 0.0
                rox = px + nx * RAY_BIAS
                roy = py + ny * RAY_BIAS
                roz = pz + nz * RAY_BIAS
                occ_v, sht_v, shi_v = _shadow_sweep(
                    tris, n_tri_rows, rox, roy, roz, rvx, rvy, rvz,
                    cand_v["maxd"], cand_v["em_inst"])
                vi_inst = jnp.where(occ_v, shi_v, cand_v["info_inst"])
                vi_mat = jnp.where(occ_v, -1.0, cand_v["info_mat"])
                vspx = jnp.where(occ_v, rox + rvx * sht_v, cand_v["spx"])
                vspy = jnp.where(occ_v, roy + rvy * sht_v, cand_v["spy"])
                vspz = jnp.where(occ_v, roz + rvz * sht_v, cand_v["spz"])
                vspw = jnp.where(occ_v, 1.0, cand_v["spw"])
                vsnx = jnp.where(occ_v, 0.0, cand_v["snx"])
                vsny = jnp.where(occ_v, 0.0, cand_v["sny"])
                vsnz = jnp.where(occ_v, 0.0, cand_v["snz"])
                vmiss = vi_inst < 0.0
                if directional:
                    cosdl_v = _dot(rvx, rvy, rvz, params[0, _P_DIRL],
                                   params[0, _P_DIRL + 1],
                                   params[0, _P_DIRL + 2])
                    vtake = vmiss & (cosdl_v >= params[0, _P_COS_SOLAR])
                    vrad_r = jnp.where(vtake, params[0, _P_DIRC], 0.0)
                    vrad_g = jnp.where(vtake, params[0, _P_DIRC + 1], 0.0)
                    vrad_b = jnp.where(vtake, params[0, _P_DIRC + 2], 0.0)
                    vrad_a = 1.0 - (vmiss & ~vtake).astype(jnp.float32)
                else:
                    vsurf = _mat_sweep(mats, n_mats, jnp.maximum(vi_mat, 0.0))
                    vr_, vg_, vb_, va_ = vsurf.em
                    vtake = (~vmiss) & (vi_inst == cand_v["em_inst"])
                    v255 = 255.0 * va_
                    vrad_r = jnp.where(vtake, v255 * vr_, 0.0)
                    vrad_g = jnp.where(vtake, v255 * vg_, 0.0)
                    vrad_b = jnp.where(vtake, v255 * vb_, 0.0)
                    vrad_a = 1.0 - vmiss.astype(jnp.float32)
                vrad_r = jnp.where(trace_ok_v, vrad_r, 0.0)
                vrad_g = jnp.where(trace_ok_v, vrad_g, 0.0)
                vrad_b = jnp.where(trace_ok_v, vrad_b, 0.0)
                vrad_a = jnp.where(trace_ok_v, vrad_a, 0.0)
                reuse_validate = r["count"] >= 4.0
                s2v = dict(s2)
                for k, v in (("rnd0", r["rnd0"]), ("rnd1", r["rnd1"]),
                             ("rnd2", r["rnd2"]), ("rnd3", r["rnd3"]),
                             ("spx", vspx), ("spy", vspy), ("spz", vspz),
                             ("spw", vspw), ("snx", vsnx), ("sny", vsny),
                             ("snz", vsnz), ("rad_r", vrad_r),
                             ("rad_g", vrad_g), ("rad_b", vrad_b),
                             ("rad_a", vrad_a)):
                    s2v[k] = jnp.where(reuse_validate, v, s2[k])
                lum_ratio = _lum(vrad_r, vrad_g, vrad_b) / jnp.maximum(
                    _lum(r["rad_r"], r["rad_g"], r["rad_b"]), 1e-4)
                lum_miss = ((lum_ratio > 1.25) | (lum_ratio < 0.8)) & valid
                w_new_v = jnp.where(
                    cand_v["p"] > 0.0,
                    _lum(s2v["rad_r"], s2v["rad_g"], s2v["rad_b"])
                    / jnp.maximum(cand_v["p"], 1e-30), 0.0)
                take_v = (is_val > 0.5) & lum_miss
                val_miss = take_v
                rcur = _rsv_where(take_v, _rsv_set(s2v, w_new_v), rcur)
            # finalize (light.wgsl:1216-1259)
            tot = rcur["count"] * _lum(rcur["rad_r"], rcur["rad_g"], rcur["rad_b"])
            rcur["w"] = jnp.where(tot > 0.0,
                                rcur["w_sum"] / jnp.maximum(tot, 1e-30), 0.0)
            for k, v in (("vpx", px), ("vpy", py), ("vpz", pz),
                         ("vpd", depth), ("vnx", nx), ("vny", ny),
                         ("vnz", nz)):
                rcur[k] = v
            rcur["life"] = rcur["life"] + 1.0
            cnt = jnp.maximum(rcur["count"], 1e-30)
            var = rcur["w2_sum"] / cnt - (rcur["w_sum"] / cnt) ** 2
            var = jnp.where(rcur["count"] < 1.0, var, var / cnt)
            var = jnp.where(valid, jnp.minimum(var, 10.0), 0.0)
            rcur = _rsv_zero_where(~valid, rcur)
            ldx, ldy, ldz = _rsqrt_n(rcur["spx"] - rcur["vpx"],
                                     rcur["spy"] - rcur["vpy"],
                                     rcur["spz"] - rcur["vpz"])
            o_r, o_g, o_b = _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz,
                                   nx, ny, nz, ldx, ldy, ldz,
                                   rcur["rad_r"], rcur["rad_g"], rcur["rad_b"],
                                   rcur["rad_a"])
            o_r = o_r * rcur["w"]
            o_g = o_g * rcur["w"]
            o_b = o_b * rcur["w"]
            return (o_r, o_g, o_b), var, rcur, \
                (gate_miss & valid, val_miss, r_scatter)

        def shade_channel(cand, directional: bool):
            """Candidate -> shadow -> input_radiance -> shading * w
            (direct_lit's no-reuse fast path, restir.py:318-370)."""
            rdx, rdy, rdz = cand["dx"], cand["dy"], cand["dz"]
            trace_ok = (_dot(rdx, rdy, rdz, nx, ny, nz) > 0.0) & (cand["p"] > 0.0)
            if not directional:
                trace_ok &= cand["em_inst"] >= 0.0
            rox = px + nx * RAY_BIAS
            roy = py + ny * RAY_BIAS
            roz = pz + nz * RAY_BIAS
            occluded, sh_t, sh_inst = _shadow_sweep(
                tris, n_tri_rows, rox, roy, roz, rdx, rdy, rdz,
                cand["maxd"], cand["em_inst"])
            # occlude_hit_info: occluders override the probe info
            info_inst = jnp.where(occluded, sh_inst, cand["info_inst"])
            info_mat = jnp.where(occluded, -1.0, cand["info_mat"])
            spx = jnp.where(occluded, rox + rdx * sh_t, cand["spx"])
            spy = jnp.where(occluded, roy + rdy * sh_t, cand["spy"])
            spz = jnp.where(occluded, roz + rdz * sh_t, cand["spz"])
            # input_radiance (sample_ambient=False)
            miss = info_inst < 0.0
            if directional:
                cosdl = _dot(rdx, rdy, rdz, params[0, _P_DIRL],
                             params[0, _P_DIRL + 1], params[0, _P_DIRL + 2])
                take_dir = miss & (cosdl >= params[0, _P_COS_SOLAR])
                rad_r = jnp.where(take_dir, params[0, _P_DIRC], 0.0)
                rad_g = jnp.where(take_dir, params[0, _P_DIRC + 1], 0.0)
                rad_b = jnp.where(take_dir, params[0, _P_DIRC + 2], 0.0)
                rad_a = 1.0 - (miss & ~take_dir).astype(jnp.float32)
            else:
                hsurf = _mat_sweep(mats, n_mats, jnp.maximum(info_mat, 0.0))
                hr, hg, hb, ha = hsurf.em
                take_em = (~miss) & (info_inst == cand["em_inst"])
                s255 = 255.0 * ha
                rad_r = jnp.where(take_em, s255 * hr, 0.0)
                rad_g = jnp.where(take_em, s255 * hg, 0.0)
                rad_b = jnp.where(take_em, s255 * hb, 0.0)
                rad_a = 1.0 - miss.astype(jnp.float32)
            rad_r = jnp.where(trace_ok, rad_r, 0.0)
            rad_g = jnp.where(trace_ok, rad_g, 0.0)
            rad_b = jnp.where(trace_ok, rad_b, 0.0)
            rad_a = jnp.where(trace_ok, rad_a, 0.0)
            lum = _lum(rad_r, rad_g, rad_b)
            w_new = jnp.where(cand["p"] > 0.0,
                              lum / jnp.maximum(cand["p"], 1e-30), 0.0)
            w_f = jnp.where(lum > 0.0, w_new / jnp.maximum(lum, 1e-30), 0.0)
            w2d = jnp.where(valid, w_f, 0.0)
            lx, ly, lz = _rsqrt_n(spx - px, spy - py, spz - pz)
            o_r, o_g, o_b = _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz,
                                   nx, ny, nz, lx, ly, lz,
                                   rad_r, rad_g, rad_b, rad_a)
            return o_r * w2d, o_g * w2d, o_b * w2d

        # ---- direct channel (RENDER_EMISSIVE adds surface emission). With
        # no sun the whole channel is the deterministic emission add, which
        # the caller keeps at full res outside the checkerboard
        # (emissive_surface_channel) — no kernel outputs for it then.
        prev_i = 0

        def solar_cand(rand4, pos=None, nrm=None):
            # solar-only candidate: p=1, maxd=F32_MAX, em=-1
            # (sampling.py:157); independent of pos/nrm
            _, _, c2, c3 = rand4
            cos_solar = params[0, _P_COS_SOLAR]
            cz = 1.0 - (1.0 - cos_solar) * c2
            theta = TAU * c3
            cr = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
            lx_, ly_, lz_ = cr * jnp.cos(theta), cr * jnp.sin(theta), cz
            rdx0, rdy0, rdz0 = _onb_apply(
                params[0, _P_DIRL], params[0, _P_DIRL + 1],
                params[0, _P_DIRL + 2], lx_, ly_, lz_)
            ppx = px if pos is None else pos[0]
            ppy = py if pos is None else pos[1]
            ppz = pz if pos is None else pos[2]
            z = jnp.zeros_like(r0)
            return {
                "dx": rdx0, "dy": rdy0, "dz": rdz0,
                "p": jnp.ones_like(r0), "maxd": jnp.full_like(r0, F32_MAX),
                "mind": jnp.full_like(r0, DISTANCE_MAX),
                "em_inst": jnp.full_like(r0, -1.0),
                "info_inst": jnp.full_like(r0, -1.0),
                "info_mat": jnp.full_like(r0, -1.0),
                "spx": ppx + rdx0 * DISTANCE_MAX,
                "spy": ppy + rdy0 * DISTANCE_MAX,
                "spz": ppz + rdz0 * DISTANCE_MAX,
                "spw": z, "snx": z, "sny": z, "snz": z,
            }

        def emit_track(out_i, trk):
            """flags plane (1 = reprojection-gate miss, +2 = validation
            luminance miss) + the reservoir the validation scatter writes
            (light.wgsl:1092-1095, 1199-1202)."""
            gate_miss, val_miss, r_scatter = trk
            outs[out_i][:] = (gate_miss.astype(jnp.float32)
                              + 2.0 * val_miss.astype(jnp.float32))
            _pack_out(outs[out_i + 1], r_scatter)
            return out_i + 2

        if has_sun:
            if temporal:
                (d_r, d_g, d_b), d_var, d_rsv, d_trk = reuse_channel(
                    solar_cand, prev_refs[prev_i], True, params[2, 0])
                prev_i += 1
                outs[out_i][:] = jnp.where(valid, d_r + em_add * emr, 0.0)
                outs[out_i + 1][:] = jnp.where(valid, d_g + em_add * emg,
                                               0.0)
                outs[out_i + 2][:] = jnp.where(valid, d_b + em_add * emb,
                                               0.0)
                outs[out_i + 3][:] = d_var
                _pack_out(outs[out_i + 4], d_rsv)
                out_i += 5
                if track_de:
                    out_i = emit_track(out_i, d_trk)
            else:
                cand_d = solar_cand((r0, r1, r2, r3))
                d_r, d_g, d_b = shade_channel(cand_d, directional=True)
                outs[out_i][:] = jnp.where(valid, d_r + em_add * emr, 0.0)
                outs[out_i + 1][:] = jnp.where(valid, d_g + em_add * emg,
                                               0.0)
                outs[out_i + 2][:] = jnp.where(valid, d_b + em_add * emb,
                                               0.0)
                out_i += 3

        # ---- emissive channel
        if emissive_on:
            def em_cand(rand4, pos=None, nrm=None):
                p3 = (px, py, pz) if pos is None else pos
                n3 = (nx, ny, nz) if nrm is None else nrm
                return select_emissive_candidate(
                    params, em_tris, em_attrs, rand4,
                    p3[0], p3[1], p3[2], n3[0], n3[1], n3[2], inst_f)

            if temporal:
                (e_r, e_g, e_b), e_var, e_rsv, e_trk = reuse_channel(
                    em_cand, prev_refs[prev_i], False, params[2, 1])
                prev_i += 1
                outs[out_i][:] = jnp.where(valid, e_r, 0.0)
                outs[out_i + 1][:] = jnp.where(valid, e_g, 0.0)
                outs[out_i + 2][:] = jnp.where(valid, e_b, 0.0)
                outs[out_i + 3][:] = e_var
                _pack_out(outs[out_i + 4], e_rsv)
                out_i += 5
                if track_de:
                    out_i = emit_track(out_i, e_trk)
            else:
                cand_e = em_cand((r0, r1, r2, r3))
                e_r, e_g, e_b = shade_channel(cand_e, directional=False)
                outs[out_i][:] = jnp.where(valid, e_r, 0.0)
                outs[out_i + 1][:] = jnp.where(valid, e_g, 0.0)
                outs[out_i + 2][:] = jnp.where(valid, e_b, 0.0)
                out_i += 3

        # ---- indirect channel (light.wgsl:1264-1498, no-reuse fast path)
        if bounces > 0:
            bnx, bny, bnz = _rsqrt_n(nx, ny, nz)
            b_px, b_py, b_pz = px, py, pz
            b_nx, b_ny, b_nz = bnx, bny, bnz
            br0, br1, br2, br3 = r0, r1, r2, r3
            transport = [jnp.ones_like(r0)] * 3
            tot_r = jnp.zeros_like(r0)
            tot_g = jnp.zeros_like(r0)
            tot_b = jnp.zeros_like(r0)
            tot_a = jnp.zeros_like(r0)
            alive = jnp.ones_like(r0, dtype=bool)
            first_px = jnp.zeros_like(r0)
            first_py = jnp.zeros_like(r0)
            first_pz = jnp.zeros_like(r0)
            pdf0 = jnp.zeros_like(r0)
            adv = params[0, _P_ADV]

            for n_b in range(bounces):
                # cosine-hemisphere bounce (utils/math.py:251-257)
                rr = jnp.sqrt(br0)
                th = TAU * br1
                hx_ = rr * jnp.cos(th)
                hy_ = rr * jnp.sin(th)
                hz_ = jnp.sqrt(jnp.maximum(1.0 - (hx_ * hx_ + hy_ * hy_), 0.0))
                bpdf = 2.0 * INV_TAU * hz_
                rdx, rdy, rdz = _onb_apply(b_nx, b_ny, b_nz, hx_, hy_, hz_)
                rox = b_px + b_nx * RAY_BIAS
                roy = b_py + b_ny * RAY_BIAS
                roz = b_pz + b_nz * RAY_BIAS
                ht, hnx, hny, hnz, hmat, hinst = _trace_full_sweep(
                    tris, attrs, n_tri_rows, rox, roy, roz, rdx, rdy, rdz,
                    jnp.full_like(r0, F32_MAX), jnp.full_like(r0, -1.0),
                    jnp.full_like(r0, -1.0))
                hit_ok = hinst >= 0.0
                hnx, hny, hnz = _rsqrt_n(hnx, hny, hnz)
                htt = jnp.where(hit_ok, ht, DISTANCE_MAX)
                hpx = rox + rdx * htt
                hpy = roy + rdy * htt
                hpz = roz + rdz * htt
                hnx = jnp.where(hit_ok, hnx, 0.0)
                hny = jnp.where(hit_ok, hny, 0.0)
                hnz = jnp.where(hit_ok, hnz, 0.0)
                if n_b == 0:
                    first_px, first_py, first_pz = hpx, hpy, hpz
                    first_nx, first_ny, first_nz = hnx, hny, hnz
                    first_hit = hit_ok
                    pdf0 = bpdf

                hsurf = _mat_sweep(mats, n_mats,
                                   jnp.where(hit_ok, hmat, 0.0))
                hsurf.rough = jnp.ones_like(r0)  # roughness := 1 at bounces

                cand = select_emissive_candidate(
                    params, em_tris, em_attrs, (br0, br1, br2, br3),
                    hpx, hpy, hpz, hnx, hny, hnz, hinst)
                sample_directional = cand["em_inst"] < 0.0
                bvx, bvy, bvz = _rsqrt_n(b_px - hpx, b_py - hpy, b_pz - hpz)
                cdx, cdy, cdz = cand["dx"], cand["dy"], cand["dz"]
                nee_ok = (_dot(cdx, cdy, cdz, hnx, hny, hnz) > 0.0) \
                    & (cand["p"] > 0.0)
                ro2x = hpx + hnx * RAY_BIAS
                ro2y = hpy + hny * RAY_BIAS
                ro2z = hpz + hnz * RAY_BIAS
                occ2, _sh_t2, sh_inst2 = _shadow_sweep(
                    tris, n_tri_rows, ro2x, ro2y, ro2z, cdx, cdy, cdz,
                    cand["maxd"], cand["em_inst"])
                ci_inst = jnp.where(occ2, sh_inst2, cand["info_inst"])
                ci_mat = jnp.where(occ2, -1.0, cand["info_mat"])
                # input_radiance with sample_directional=True
                miss2 = ci_inst < 0.0
                cosdl = _dot(cdx, cdy, cdz, params[0, _P_DIRL],
                             params[0, _P_DIRL + 1], params[0, _P_DIRL + 2])
                take_dir = miss2 & (cosdl >= params[0, _P_COS_SOLAR])
                nsurf = _mat_sweep(mats, n_mats, jnp.maximum(ci_mat, 0.0))
                nr, ng, nb, na = nsurf.em
                take_em = (~miss2) & (ci_inst == cand["em_inst"])
                s255 = 255.0 * na
                ir_r = jnp.where(take_dir, params[0, _P_DIRC],
                                 jnp.where(take_em, s255 * nr, 0.0))
                ir_g = jnp.where(take_dir, params[0, _P_DIRC + 1],
                                 jnp.where(take_em, s255 * ng, 0.0))
                ir_b = jnp.where(take_dir, params[0, _P_DIRC + 2],
                                 jnp.where(take_em, s255 * nb, 0.0))
                ir_a = 1.0 - (miss2 & ~take_dir).astype(jnp.float32)
                # keep rgb only for directional picks or hits ON the emitter
                keep = sample_directional | (ci_inst == cand["em_inst"])
                ir_r = jnp.where(keep, ir_r, 0.0)
                ir_g = jnp.where(keep, ir_g, 0.0)
                ir_b = jnp.where(keep, ir_b, 0.0)
                o_r, o_g, o_b = _shade(
                    hsurf, amb_r, amb_g, amb_b, bvx, bvy, bvz,
                    hnx, hny, hnz, cdx, cdy, cdz, ir_r, ir_g, ir_b, ir_a)
                inv_p = 1.0 / jnp.maximum(cand["p"], 1e-30)
                o_r = o_r * inv_p
                o_g = o_g * inv_p
                o_b = o_b * inv_p
                if n_b > 0:
                    kill = bpdf < 0.01
                    inv_b = 1.0 / jnp.maximum(bpdf, 1e-30)
                    o_r = jnp.where(kill, 0.0, o_r * inv_b)
                    o_g = jnp.where(kill, 0.0, o_g * inv_b)
                    o_b = jnp.where(kill, 0.0, o_b * inv_b)
                lum_b = _lum(o_r, o_g, o_b)
                max_ind = params[0, _P_MAX_IND]
                scale = jnp.where(lum_b > max_ind,
                                  max_ind / jnp.maximum(lum_b, 1e-30), 1.0)
                o_r = o_r * scale
                o_g = o_g * scale
                o_b = o_b * scale
                add = alive & hit_ok & nee_ok
                addf = add.astype(jnp.float32)
                tot_r = tot_r + jnp.where(add, transport[0] * o_r, 0.0)
                tot_g = tot_g + jnp.where(add, transport[1] * o_g, 0.0)
                tot_b = tot_b + jnp.where(add, transport[2] * o_b, 0.0)
                tot_a = tot_a + addf
                add_m = alive & ~hit_ok
                tot_r = tot_r + jnp.where(add_m, transport[0] * amb_r, 0.0)
                tot_g = tot_g + jnp.where(add_m, transport[1] * amb_g, 0.0)
                tot_b = tot_b + jnp.where(add_m, transport[2] * amb_b, 0.0)
                # transport *= env_brdf(hsurf, bounce_view, hit normal)
                nov_t = jnp.maximum(
                    _dot(hnx, hny, hnz, bvx, bvy, bvz), 0.0001)
                dr, dg, db = hsurf.diff
                f0r, f0g, f0b = hsurf.f0
                da_r, da_g, da_b = _env_brdf_approx(
                    dr, dg, db, jnp.ones_like(r0), nov_t)
                sa_r, sa_g, sa_b = _env_brdf_approx(
                    f0r, f0g, f0b, hsurf.rough, nov_t)
                upd = alive & hit_ok
                transport = [
                    jnp.where(upd, transport[0] * (da_r + sa_r), transport[0]),
                    jnp.where(upd, transport[1] * (da_g + sa_g), transport[1]),
                    jnp.where(upd, transport[2] * (da_b + sa_b), transport[2]),
                ]
                alive = alive & hit_ok & ((transport[0] > 0.01)
                                          | (transport[1] > 0.01)
                                          | (transport[2] > 0.01))
                br0 = jnp.mod(br0 + adv, 1.0)
                br1 = jnp.mod(br1 + adv, 1.0)
                br2 = jnp.mod(br2 + adv, 1.0)
                br3 = jnp.mod(br3 + adv, 1.0)
                b_px = jnp.where(hit_ok, hpx, b_px)
                b_py = jnp.where(hit_ok, hpy, b_py)
                b_pz = jnp.where(hit_ok, hpz, b_pz)
                b_nx = jnp.where(hit_ok, hnx, b_nx)
                b_ny = jnp.where(hit_ok, hny, b_ny)
                b_nz = jnp.where(hit_ok, hnz, b_nz)

            tot_a = jnp.minimum(tot_a, 1.0)
            lx, ly, lz = _rsqrt_n(first_px - px, first_py - py, first_pz - pz)
            s_r, s_g, s_b = _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz,
                                   bnx, bny, bnz, lx, ly, lz,
                                   tot_r, tot_g, tot_b, tot_a)
            lum_s = _lum(s_r, s_g, s_b)
            w_new = jnp.where(pdf0 > 0.0,
                              lum_s / jnp.maximum(pdf0, 1e-30), 0.0)
            if temporal:
                # indirect temporal ReSTIR (light.wgsl:1452-1497): the
                # reservoir stores the RAW bounce radiance; shading happens
                # from the merged sample (restir.indirect_lit_ambient)
                r_i, i_gate_miss = gates(_unpack_prev(prev_refs[prev_i]))
                prev_i += 1
                s_ind = {
                    "rad_r": tot_r, "rad_g": tot_g, "rad_b": tot_b,
                    "rad_a": tot_a,
                    "rnd0": r0, "rnd1": r1, "rnd2": r2, "rnd3": r3,
                    "vpx": px, "vpy": py, "vpz": pz, "vpd": depth,
                    "vnx": bnx, "vny": bny, "vnz": bnz,
                    "vinst": inst_f,
                    "spx": first_px, "spy": first_py, "spz": first_pz,
                    "spw": first_hit.astype(jnp.float32),
                    "snx": first_nx, "sny": first_ny, "snz": first_nz,
                }
                ri2 = _rsv_clamp(_rsv_update(r_i, s_ind, w_new, valid),
                                 params[0, _P_MAXCNT])
                ldx, ldy, ldz = _rsqrt_n(ri2["spx"] - ri2["vpx"],
                                         ri2["spy"] - ri2["vpy"],
                                         ri2["spz"] - ri2["vpz"])
                o_r, o_g, o_b = _shade(
                    surf, amb_r, amb_g, amb_b, vx, vy, vz,
                    ri2["vnx"], ri2["vny"], ri2["vnz"], ldx, ldy, ldz,
                    ri2["rad_r"], ri2["rad_g"], ri2["rad_b"], ri2["rad_a"])
                tot2 = ri2["count"] * _lum(o_r, o_g, o_b)
                ri2["w"] = jnp.where(
                    tot2 > 0.0, ri2["w_sum"] / jnp.maximum(tot2, 1e-30),
                    0.0)
                for k, v in (("vpx", px), ("vpy", py), ("vpz", pz),
                             ("vpd", depth), ("vnx", bnx), ("vny", bny),
                             ("vnz", bnz)):
                    ri2[k] = v
                ri2["life"] = ri2["life"] + 1.0
                cnt = jnp.maximum(ri2["count"], 1e-30)
                var = ri2["w2_sum"] / cnt - (ri2["w_sum"] / cnt) ** 2
                var = jnp.where(ri2["count"] < 1.0, var, var / cnt)
                var = jnp.where(valid, jnp.minimum(var, 10.0), 0.0)
                ri2 = _rsv_zero_where(~valid, ri2)
                outs[out_i][:] = jnp.where(valid, o_r * ri2["w"], 0.0)
                outs[out_i + 1][:] = jnp.where(valid, o_g * ri2["w"], 0.0)
                outs[out_i + 2][:] = jnp.where(valid, o_b * ri2["w"], 0.0)
                outs[out_i + 3][:] = var
                _pack_out(outs[out_i + 4], ri2)
                out_i += 5
                if track_ind:
                    # the indirect channel has no validation retrace; only
                    # the reprojection-gate invalidation (restir.py:632-635)
                    outs[out_i][:] = (i_gate_miss & valid) \
                        .astype(jnp.float32)
                    out_i += 1
            else:
                w2d = jnp.where(valid & (lum_s > 0.0),
                                w_new / jnp.maximum(lum_s, 1e-30), 0.0)
                outs[out_i][:] = jnp.where(valid, s_r * w2d, 0.0)
                outs[out_i + 1][:] = jnp.where(valid, s_g * w2d, 0.0)
                outs[out_i + 2][:] = jnp.where(valid, s_b * w2d, 0.0)
                out_i += 3

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "has_sun", "num_emissives", "bounces", "render_size", "interpret",
    "temporal", "track_de", "track_ind"))
def fused_lighting(scene, g, view, frame, rand, *, has_sun: bool,
                   num_emissives: int, bounces: int, render_size,
                   interpret: bool = False, temporal: bool = False,
                   prev_planes=None, track_de: bool = False,
                   track_ind: bool = False):
    """Run the mega-kernel. g: render-res (or checkerboard-compressed)
    G-buffer dict; rand: [h,w,4] blue noise. Returns dict with
    d_render/e_render/i_render [h,w,4] (variance is identically zero on the
    no-reuse path — the caller supplies zeros; see restir.direct_lit fast
    path). temporal=True additionally takes prev_planes (a list of
    reprojection-gathered [h,16,w] reservoir tensors, one per active
    channel in d/e/i order, already in_strict-masked) and returns
    {d,e,i}_var [h,w] + {d,e,i}_packed [h,16,w] new temporal carries."""
    if not interpret:
        # Mosaic has no CPU backend; on the CPU test platform the kernel
        # runs under the Pallas interpreter (same pattern as reproj_gather)
        interpret = not any(d.platform != "cpu" for d in jax.devices())
    h, w = render_size
    bh = _block_h(w)
    hp = -(-h // bh) * bh

    def _plane(x, _rows=None):
        return jnp.pad(x, ((0, hp - h), (0, 0))) if hp > h else x

    emissive_on = num_emissives > 0

    tris = _pack8(scene["tri_pos_flat"])
    attrs = _pack8(jnp.concatenate(
        [scene["tri_attr"][:, 0:15], scene["tri_attr"][:, 16:17]], axis=1))
    if emissive_on:
        em_tris = _pack8(scene["em_tri_pos_flat"])
        em_attrs = _pack8(jnp.concatenate(
            [scene["em_tri_attr"][:, 0:15], scene["em_tri_attr"][:, 16:17]],
            axis=1))
        n_em = scene["em_packed"].shape[0]
        n_alias = scene["alias_packed"].shape[0]
        n_em_tris = scene["em_tri_pos_flat"].shape[0]
    else:
        em_tris = tris[:1]
        em_attrs = attrs[:1]
        n_em = n_alias = n_em_tris = 0
    n_mats = scene["mat_packed"].shape[0]
    mats = jnp.pad(scene["mat_packed"],
                   ((0, 0), (0, _LANES - scene["mat_packed"].shape[1])))
    params = _pack_params(scene, view, frame, n_em, has_sun=has_sun)

    depth = g["position"][..., 3]
    inst_f = g["instance_material"][..., 0].astype(jnp.int32) \
        .astype(jnp.float32)
    mat_f = jnp.maximum(
        g["instance_material"][..., 1].astype(jnp.int32), 0) \
        .astype(jnp.float32)
    planes = [
        _plane(g["position"][..., 0]),
        _plane(g["position"][..., 1]),
        _plane(g["position"][..., 2]),
        _plane(depth),
        _plane(g["normal"][..., 0]),
        _plane(g["normal"][..., 1]),
        _plane(g["normal"][..., 2]),
        _plane(inst_f),
        _plane(mat_f),
        _plane(rand[..., 0]),
        _plane(rand[..., 1]),
        _plane(rand[..., 2]),
        _plane(rand[..., 3]),
    ]

    n_chan = int(has_sun) + int(emissive_on) + int(bounces > 0)
    per_chan = 5 if temporal else 3   # rgb [+ variance + packed carry]
    n_out = n_chan * per_chan
    prevs = []
    if temporal:
        assert prev_planes is not None and len(prev_planes) == n_chan
        prevs = [jnp.pad(p, ((0, hp - h), (0, 0), (0, 0)))
                 if hp > h else p for p in prev_planes]
    build = partial(
        _build_kernel,
        has_sun=has_sun, emissive_on=emissive_on, bounces=bounces,
        n_em=n_em, n_alias=n_alias, n_em_tris=n_em_tris, n_mats=n_mats,
        n_tri_rows=tris.shape[0], n_em_rows=em_tris.shape[0],
        temporal=temporal, track_de=track_de, track_ind=track_ind)
    kernel = build()
    # temporal: a second variant without the validation retrace, picked at
    # runtime when no channel's validate interval fires this frame (the
    # retrace is ~1/3 of the kernel; intervals 3/5 skip it 8/15 of frames)
    kernel_noval = build(validation=False) if temporal else None

    def tab_spec(r):
        return pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def invoke(params, tris, attrs, em_tris, em_attrs, mats, *ops_):
        planes = ops_[:13]
        prevs_l = ops_[13:]
        rows = planes[0].shape[0]
        ray_spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        rsv_spec = pl.BlockSpec((bh, 16, w), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs, out_shape = [], []
        chans = [c for c, on in (("d", has_sun), ("e", emissive_on),
                                 ("i", bounces > 0)) if on]
        for c in chans:
            out_specs += [ray_spec] * 3
            out_shape += [jax.ShapeDtypeStruct((rows, w), jnp.float32)] * 3
            if temporal:
                out_specs += [ray_spec, rsv_spec]
                out_shape += [
                    jax.ShapeDtypeStruct((rows, w), jnp.float32),
                    jax.ShapeDtypeStruct((rows, 16, w), jnp.float32)]
                if c in ("d", "e") and track_de:
                    # flags plane + validation-scatter reservoir
                    out_specs += [ray_spec, rsv_spec]
                    out_shape += [
                        jax.ShapeDtypeStruct((rows, w), jnp.float32),
                        jax.ShapeDtypeStruct((rows, 16, w), jnp.float32)]
                elif c == "i" and track_ind:
                    out_specs += [ray_spec]
                    out_shape += [
                        jax.ShapeDtypeStruct((rows, w), jnp.float32)]
        def call(k, *args):
            return pl.pallas_call(
                k,
                interpret=interpret,
                grid=(rows // bh,),
                in_specs=[tab_spec(3), tab_spec(tris.shape[0]),
                          tab_spec(attrs.shape[0]),
                          tab_spec(em_tris.shape[0]),
                          tab_spec(em_attrs.shape[0]),
                          tab_spec(mats.shape[0])]
                + [ray_spec] * 13 + [rsv_spec] * len(prevs_l),
                out_specs=out_specs,
                out_shape=out_shape,
                # the temporal variant's live reservoir state spills past
                # the default 16 MB scoped-vmem budget; raise the cap
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*args)

        args = (params, tris, attrs, em_tris, em_attrs, mats, *ops_)
        if kernel_noval is None:
            # tuple like the lax.cond path below (cond canonicalizes the
            # pallas_call list to a tuple; shard_map out_specs must match
            # the actual output pytree structure either way)
            return tuple(call(kernel, *args))
        # dispatch the no-retrace variant on frames where neither
        # channel validates (params row 2 holds the per-frame flags)
        any_val = params[2, 0] + params[2, 1] > 0.0
        return lax.cond(any_val,
                        lambda a: tuple(call(kernel, *a)),
                        lambda a: tuple(call(kernel_noval, *a)), args)

    from hikari_tpu.parallel import shard as _sh

    mesh = _sh.active_mesh()
    if mesh is not None:
        # manual row sharding (pixel-local: no halo, no coordinate use)
        from jax.sharding import PartitionSpec as P

        n = _sh.nshards(mesh)
        hpm = -(-hp // (bh * n)) * bh * n
        if hpm > hp:
            planes = [jnp.pad(p, ((0, hpm - hp), (0, 0))) for p in planes]
            prevs = [jnp.pad(p, ((0, hpm - hp), (0, 0), (0, 0)))
                     for p in prevs]
        out_specs = []
        for c in [c for c, on in (("d", has_sun), ("e", emissive_on),
                                  ("i", bounces > 0)) if on]:
            out_specs += [P(_sh.AXIS, None)] * 3
            if temporal:
                out_specs += [P(_sh.AXIS, None), P(_sh.AXIS, None, None)]
                if c in ("d", "e") and track_de:
                    out_specs += [P(_sh.AXIS, None),
                                  P(_sh.AXIS, None, None)]
                elif c == "i" and track_ind:
                    out_specs += [P(_sh.AXIS, None)]
        outs = _sh.smap(
            invoke, mesh,
            in_specs=(P(),) * 6 + (P(_sh.AXIS, None),) * 13
            + (P(_sh.AXIS, None, None),) * len(prevs),
            out_specs=tuple(out_specs))(
                params, tris, attrs, em_tris, em_attrs, mats, *planes,
                *prevs)
    else:
        outs = invoke(params, tris, attrs, em_tris, em_attrs, mats,
                      *planes, *prevs)

    valid = depth >= F32_EPSILON
    alpha = valid.astype(jnp.float32)

    def to_render(i0):
        rgb = [outs[i0 + c][:h] for c in range(3)]
        return jnp.stack(rgb + [alpha], axis=-1)

    out = {}
    i0 = 0
    for slot, active in (("d", has_sun), ("e", emissive_on),
                         ("i", bounces > 0)):
        if not active:
            continue
        out[f"{slot}_render"] = to_render(i0)
        i0 += 3
        if temporal:
            out[f"{slot}_var"] = outs[i0][:h]
            out[f"{slot}_packed"] = outs[i0 + 1][:h]
            i0 += 2
            if slot in ("d", "e") and track_de:
                # flags: 1 = reprojection-gate miss, +2 = validation miss;
                # scatter: the reservoir the validation scatter writes
                out[f"{slot}_flags"] = outs[i0][:h]
                out[f"{slot}_scatter"] = outs[i0 + 1][:h]
                i0 += 2
            elif slot == "i" and track_ind:
                out["i_flags"] = outs[i0][:h]
                i0 += 1
    return out
