"""Fused spatial-ReSTIR Pallas kernel (light.wgsl:1500-1676 in ONE pass).

The modular formulation (restir.spatial_reuse) evaluates 8/16 Fibonacci
spiral taps as rolls of the packed temporal tensor plus a 5-step
screen-space depth ray-march per tap — ~700 separate [H,W] XLA fusions that
each round-trip HBM (~22 ms at 1080p, round-3 profile, plus the packed
gather of the previous spatial buffer). This kernel keeps a row band of the
NEW temporal reservoir planes (+ depth) resident in VMEM with a ±RANGE-row
halo and runs the whole pass in-register per 8-row block:

* start reservoir: previous spatial (reprojection-gathered by the caller
  via the banded gather) where the temporal lifetime exceeds max_lifetime,
  else the temporal reservoir (light.wgsl:1529-1541);
* merge the temporal reservoir (count-weighted WRS);
* per tap: dynamic row-slice + lane-roll of the 16 packed planes and the
  depth plane (the spiral offset is one scalar pair per tap per frame, so
  a slice+roll IS the gather), in-kernel bit unpack, screen-space depth
  ray-march occlusion (the march offsets reuse the same windowed depth),
  depth-ratio/normal/forward gates, clamped GRIS Jacobian, WRS merge
  (light.wgsl:1566-1643);
* clamp to max_spatial_reuse_count, final shading at the visible point,
  finalize w, stored variance (NaN-coded where the pass leaves the
  temporal variance in place), 64 B repack (light.wgsl:1645-1676).

Tap offsets wrap in x exactly like the modular jnp.roll formulation; in y
the window is zero-padded instead of wrapped — both are masked by the same
in-bounds gate, so merged values agree (tests/test_spatial_fused.py).

Eligibility mirrors the mega-kernel's scene class (small material table,
no textures, no per-pixel tap scramble); the caller additionally requires
the fused temporal path so the packed temporal planes are already in the
channel-plane layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hikari_tpu.ops.light_fused import (
    _LANES,
    _bits,
    _block_h,
    _dot,
    _kbf16_unpair,
    _ksnorm8_unvec,
    _kunorm16_unpair,
    _lum,
    _mat_sweep,
    _pack_out,
    _rsqrt_n,
    _rsv_clamp,
    _rsv_zero_where,
    _shade,
    _unpack_take,
    F32_EPSILON,
    F32_MAX,
    GOLDEN_RATIO,
    MAX_MATERIALS,
    TAU,
)

# light.wgsl:1505-1509 (emissive) / 1511-1515 (indirect) constants
SPATIAL_TAPS = 4
SPATIAL_VARIANCE_SAMPLE_THRESHOLD = 4.0

# ---- params row layout ----------------------------------------------------
_S_FRAND = 0     # per-frame spiral rotation (random_float(frame_number))
_S_MAXLIFE = 1   # max reservoir lifetime (F32_MAX when disabled)
_S_MAXCNT = 2    # max_spatial_reuse_count
_S_AMB = 3       # ambient rgb
_S_CAM = 6       # camera world position xyz
_S_ROW0 = 9      # global row offset of this shard's block 0
_S_H = 10        # total image rows (in-bounds gate)
_S_W = 11        # true image width (in-bounds gate; lanes may be padded)


def spatial_fused_eligible(scene, *, no_texture: bool,
                           scramble: bool) -> bool:
    """Static gate: the kernel shades per tap from the material table in
    VMEM (select-sweep), so the same small-scene class as the lighting
    mega-kernel applies; the per-pixel tap scramble evaluates four rotated
    spirals per tap and stays modular (light.wgsl:1566-1572 note)."""
    if not no_texture or scramble:
        return False
    if scene["mat_packed"].shape[0] > MAX_MATERIALS:
        return False
    return True


def _tap_geometry(count_taps: int, reuse_range: float):
    """Static per-tap spiral geometry (the radius only depends on the tap
    index; the per-frame rotation moves the angle). Computed in numpy f32
    with the SAME operation order as restir.spatial_reuse's traced f32
    arithmetic so round()/int() decisions match bit-for-bit."""
    import numpy as np

    f32 = np.float32
    taps = []
    for i in range(1, count_taps + 1):
        fi = f32(i)
        radius = f32(np.sqrt(fi / f32(count_taps))) * f32(reuse_range)
        tap_interval = np.maximum(f32(1.0), radius / f32(SPATIAL_TAPS + 1))
        tap_count = int(radius / tap_interval)
        inv_len = f32(1.0) / np.maximum(radius, f32(1e-5))
        fi_gr = fi * f32(GOLDEN_RATIO)
        march = [(f32(j) * tap_interval,
                  f32(j) / (f32(tap_count) + f32(1.0)))
                 for j in range(1, SPATIAL_TAPS + 2) if j <= tap_count]
        taps.append((fi_gr, radius, inv_len, march))
    return taps


def _unpack_tap(t):
    """Tap-side reservoir unpack: only the fields the gates / Jacobian /
    target function / WRS decision read (skips vpd, vinst, w_sum/w2_sum —
    the winner-plane epilogue recovers full fields once per pixel)."""
    rad01 = _kbf16_unpair(t(8))
    rad23 = _kbf16_unpair(t(9))
    rnd01 = _kunorm16_unpair(t(10))
    rnd23 = _kunorm16_unpair(t(11))
    (vnx, vny, vnz), _life = _ksnorm8_unvec(t(12))
    (snx, sny, snz), sflag = _ksnorm8_unvec(t(13))
    count, w = _kbf16_unpair(t(14))
    return {
        "vpx": t(0), "vpy": t(1), "vpz": t(2),
        "spx": t(4), "spy": t(5), "spz": t(6),
        "spw": (sflag > 127.0).astype(jnp.float32),
        "rad_r": rad01[0], "rad_g": rad01[1],
        "rad_b": rad23[0], "rad_a": rad23[1],
        "rnd0": rnd01[0], "rnd1": rnd01[1],
        "rnd2": rnd23[0], "rnd3": rnd23[1],
        "vnx": vnx, "vny": vny, "vnz": vnz,
        "snx": snx, "sny": sny, "snz": snz,
        "count": count, "w": w,
    }


def _win_rows(bh: int, halo: int) -> int:
    """Window rows, rounded up to a sublane multiple (tpu.dynamic_rotate
    rejects unaligned shapes; the extra rows sit below the bottom halo)."""
    return -(-(bh + 2 * halo) // 8) * 8


def _build_kernel(*, emissive_lit: bool, count_taps: int, reuse_range: int,
                  n_mats: int, bh: int, halo: int, wp: int):
    WIN = _win_rows(bh, halo)
    taps = _tap_geometry(count_taps, float(reuse_range))

    def kernel(params, mats, src_rsv, src_dep, prev_ref,
               px_ref, py_ref, pz_ref, mat_ref,
               out_r, out_g, out_b, out_var, out_pk,
               win_r, win_d, sems):
        gi = pl.program_id(0)

        pltpu.make_async_copy(
            src_rsv.at[pl.ds(gi * bh, WIN)], win_r, sems.at[0]).start()
        pltpu.make_async_copy(
            src_dep.at[pl.ds(gi * bh, WIN)], win_d, sems.at[1]).start()
        pltpu.make_async_copy(
            src_rsv.at[pl.ds(gi * bh, WIN)], win_r, sems.at[0]).wait()
        pltpu.make_async_copy(
            src_dep.at[pl.ds(gi * bh, WIN)], win_d, sems.at[1]).wait()

        frand = params[0, _S_FRAND]
        max_life = params[0, _S_MAXLIFE]
        max_cnt = params[0, _S_MAXCNT]
        amb_r = params[0, _S_AMB]
        amb_g = params[0, _S_AMB + 1]
        amb_b = params[0, _S_AMB + 2]
        h_tot = params[0, _S_H]
        w_tot = params[0, _S_W]

        # global pixel coordinates of this block (sharding-aware)
        yy = (params[0, _S_ROW0] + gi.astype(jnp.float32) * bh
              + lax.broadcasted_iota(jnp.int32, (bh, wp), 0)
              .astype(jnp.float32))
        xx = lax.broadcasted_iota(jnp.int32, (bh, wp), 1).astype(jnp.float32)

        # the depth window is 2D, where a dynamic sublane start is not
        # Mosaic-lowerable (vector.load alignment); load it whole and use
        # value-level rolls (rows never wrap: halo+dy in [0, 2*halo])
        wd = win_d[...]

        def shifted_d(dy, dx):
            r = pltpu.roll(pltpu.roll(wd, -dy, axis=0), -dx, axis=1)
            return r[halo:halo + bh, :]

        depth = wd[halo:halo + bh, :]
        valid = depth >= F32_EPSILON

        px = px_ref[...]
        py = py_ref[...]
        pz = pz_ref[...]
        vx, vy, vz = _rsqrt_n(params[0, _S_CAM] - px,
                              params[0, _S_CAM + 1] - py,
                              params[0, _S_CAM + 2] - pz)
        surf = _mat_sweep(mats, n_mats, mat_ref[...])

        center_pls = [win_r[pl.ds(halo, bh), c, :] for c in range(16)]
        q0 = _unpack_take(lambda c: center_pls[c])

        # WRS with a WINNER-PLANE epilogue (VERDICT r4 next #3): the tap
        # loop updates only the scalar reservoir algebra (w_sum, w2_sum,
        # count) plus ONE masked select of the winning tap's 16 PACKED
        # planes; the 23-field sample unpack/select per tap collapses to a
        # single unpack of the winner after the loop. All state stays 2-D
        # per-plane: Mosaic lowers [bh,16,wp] broadcast selects and 3-D
        # dynamic lane rolls ~2x slower than 16 plane-wise ops (measured
        # 31.9 -> expected ~16 ms for the 16-tap kernel at 1080p).
        keep_history = q0["life"] <= max_life
        win_pls = [jnp.where(keep_history, prev_ref[:, c, :],
                             center_pls[c]) for c in range(16)]
        win_is_tap = jnp.zeros((bh, wp), jnp.bool_)
        # scalar state of the start reservoir (prev scalars live in packed
        # lanes 12/14/15 — decode just those instead of the full 16)
        p_cnt, p_w = _kbf16_unpair(prev_ref[:, 14, :])
        p_ws, p_w2 = _kbf16_unpair(prev_ref[:, 15, :])
        p_life = _bits(prev_ref[:, 12, :]) >> 24
        r_wsum = jnp.where(keep_history, p_ws, q0["w_sum"])
        r_w2 = jnp.where(keep_history, p_w2, q0["w2_sum"])
        r_cnt = jnp.where(keep_history, p_cnt, q0["count"])
        r_life = jnp.where(
            keep_history,
            p_life.astype(jnp.int32).astype(jnp.float32), q0["life"])

        # s: the center pixel's sample context (fixed through the taps)
        s_vpx, s_vpy, s_vpz = q0["vpx"], q0["vpy"], q0["vpz"]
        s_vnx, s_vny, s_vnz = q0["vnx"], q0["vny"], q0["vnz"]

        def shade_lum(ldx, ldy, ldz, rr, rg, rb, ra):
            o_r, o_g, o_b = _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz,
                                   s_vnx, s_vny, s_vnz, ldx, ldy, ldz,
                                   rr, rg, rb, ra)
            return _lum(o_r, o_g, o_b)

        def wrs_step(planes, q, mw, mask, is_tap):
            """Scalar WRS merge + winner-plane select (merge_reservoir,
            light.wgsl:175-179, with the sample select deferred)."""
            nonlocal r_wsum, r_w2, r_cnt, win_pls, win_is_tap
            w_new = mw * q["w"] * q["count"]
            ws_n = r_wsum + w_new
            rand = jnp.mod(q["rnd0"] + q["rnd1"] + q["rnd2"] + q["rnd3"],
                           1.0)
            replace = mask & (rand < w_new / jnp.maximum(ws_n, 1e-30))
            r_wsum = jnp.where(mask, ws_n, r_wsum)
            r_w2 = jnp.where(mask, r_w2 + w_new * w_new, r_w2)
            r_cnt = jnp.where(mask, r_cnt + q["count"], r_cnt)
            win_pls = [jnp.where(replace, p, wp_)
                       for p, wp_ in zip(planes, win_pls)]
            if is_tap:
                win_is_tap = win_is_tap | replace
            else:
                win_is_tap = win_is_tap & ~replace

        if emissive_lit:
            merge_w0 = _lum(q0["rad_r"], q0["rad_g"], q0["rad_b"])
        else:
            d0x, d0y, d0z = _rsqrt_n(q0["spx"] - s_vpx, q0["spy"] - s_vpy,
                                     q0["spz"] - s_vpz)
            merge_w0 = shade_lum(d0x, d0y, d0z, q0["rad_r"], q0["rad_g"],
                                 q0["rad_b"], q0["rad_a"])
        wrs_step(center_pls, q0, merge_w0, valid, is_tap=False)

        use_sp_var = q0["count"] <= SPATIAL_VARIANCE_SAMPLE_THRESHOLD

        for fi_gr, radius, inv_len, march in taps:
            angle = TAU * jnp.mod(jnp.float32(fi_gr) + frand, 1.0)
            off_x = jnp.float32(radius) * jnp.cos(angle)
            off_y = jnp.float32(radius) * jnp.sin(angle)
            oy = jnp.round(off_y).astype(jnp.int32)
            ox = jnp.round(off_x).astype(jnp.int32)

            # dim 0 of the 3D reservoir window is a leading (untiled) dim,
            # so a dynamic start is fine there; lanes roll plane-wise
            # (2-D ops — see the winner-plane note above)
            tap_pls = [pltpu.roll(win_r[pl.ds(halo + oy, bh), c, :],
                                  -ox, axis=1) for c in range(16)]
            q = _unpack_tap(lambda c: tap_pls[c])
            sdep = shifted_d(oy, ox)
            oyf = oy.astype(jnp.float32)
            oxf = ox.astype(jnp.float32)
            in_b = ((yy + oyf >= 0.0) & (yy + oyf < h_tot)
                    & (xx + oxf >= 0.0) & (xx + oxf < w_tot))

            # screen-space depth ray-march (light.wgsl:1608-1628); the
            # schedule (tap distances, fractions) is static per tap index
            occluded = jnp.zeros((bh, wp), jnp.bool_)
            for tdist, frac in march:
                toy = jnp.round(jnp.float32(tdist) * off_y
                                * jnp.float32(inv_len)).astype(jnp.int32)
                tox = jnp.round(jnp.float32(tdist) * off_x
                                * jnp.float32(inv_len)).astype(jnp.int32)
                tap_depth = shifted_d(toy, tox)
                ref_depth = depth + (sdep - depth) * jnp.float32(frac)
                occluded |= tap_depth > ref_depth + 1e-5

            depth_ratio = depth / jnp.where(sdep == 0.0, 1e-30, sdep)
            ok = in_b & (depth_ratio >= 0.9) & (depth_ratio <= 1.1)
            ok &= q["count"] >= F32_EPSILON
            ok &= _dot(s_vnx, s_vny, s_vnz,
                       q["vnx"], q["vny"], q["vnz"]) >= 0.866
            sdx, sdy, sdz = _rsqrt_n(q["spx"] - s_vpx, q["spy"] - s_vpy,
                                     q["spz"] - s_vpz)
            ok &= _dot(sdx, sdy, sdz, s_vnx, s_vny, s_vnz) >= 0.0
            ok &= ~occluded

            # GRIS Jacobian (light.wgsl:985-1004)
            trx, try_, trz = _rsqrt_n(s_vpx - q["spx"], s_vpy - q["spy"],
                                      s_vpz - q["spz"])
            tqx, tqy, tqz = _rsqrt_n(q["vpx"] - q["spx"],
                                     q["vpy"] - q["spy"],
                                     q["vpz"] - q["spz"])
            cos1 = jnp.abs(_dot(trx, try_, trz,
                                q["snx"], q["sny"], q["snz"]))
            cos2 = jnp.abs(_dot(tqx, tqy, tqz,
                                q["snx"], q["sny"], q["snz"]))
            term1 = cos1 / jnp.maximum(cos2, 1e-4)
            num = ((q["vpx"] - q["spx"]) ** 2 + (q["vpy"] - q["spy"]) ** 2
                   + (q["vpz"] - q["spz"]) ** 2)
            den = ((s_vpx - q["spx"]) ** 2 + (s_vpy - q["spy"]) ** 2
                   + (s_vpz - q["spz"]) ** 2)
            term2 = num / jnp.maximum(den, 1e-4)
            jac = jnp.clip(term1 * term2, 1.0, 50.0)
            jac = jnp.where(q["spw"] > 0.5, jac, 1.0)

            if emissive_lit:
                mw = _lum(q["rad_r"], q["rad_g"], q["rad_b"]) / jac
            else:
                mw = shade_lum(sdx, sdy, sdz, q["rad_r"], q["rad_g"],
                               q["rad_b"], q["rad_a"]) / jac
            wrs_step(tap_pls, q, mw, ok & valid, is_tap=True)

        # winner epilogue: ONE unpack of the selected planes; the visible
        # point/normal keep the ORIGINAL semantics — q0's center values
        # unless a tap's sample won after them (the modular op order sets
        # vp/vn to q0 after the q0 merge, then lets tap merges overwrite)
        r = _unpack_take(lambda c: win_pls[c])
        r["w_sum"], r["w2_sum"], r["count"] = r_wsum, r_w2, r_cnt
        r["life"] = r_life
        for k in ("vpx", "vpy", "vpz", "vpd", "vnx", "vny", "vnz"):
            r[k] = jnp.where(win_is_tap, r[k], q0[k])
        r = _rsv_clamp(r, max_cnt)

        ldx, ldy, ldz = _rsqrt_n(r["spx"] - s_vpx, r["spy"] - s_vpy,
                                 r["spz"] - s_vpz)
        o_r, o_g, o_b = _shade(surf, amb_r, amb_g, amb_b, vx, vy, vz,
                               s_vnx, s_vny, s_vnz, ldx, ldy, ldz,
                               r["rad_r"], r["rad_g"], r["rad_b"],
                               r["rad_a"])
        target_lum = (_lum(r["rad_r"], r["rad_g"], r["rad_b"])
                      if emissive_lit else _lum(o_r, o_g, o_b))
        tot = r["count"] * target_lum
        r["w"] = jnp.where(tot > 0.0,
                           r["w_sum"] / jnp.maximum(tot, 1e-30), 0.0)
        r["life"] = r["life"] + 1.0

        cnt = jnp.maximum(r["count"], 1e-30)
        var = r["w2_sum"] / cnt - (r["w_sum"] / cnt) ** 2
        var = jnp.where(r["count"] < 1.0, var, var / cnt)
        var = jnp.minimum(var, 10.0)

        out_r[...] = jnp.where(valid, r["w"] * o_r, 0.0)
        out_g[...] = jnp.where(valid, r["w"] * o_g, 0.0)
        out_b[...] = jnp.where(valid, r["w"] * o_b, 0.0)
        out_var[...] = jnp.where(valid & use_sp_var, var,
                                 jnp.float32(float("nan")))
        # the carry stores the post-reuse reservoir on valid pixels and an
        # empty reservoir elsewhere (frame.py's _zero_packed_where)
        r = _rsv_zero_where(~valid, r)
        _pack_out(out_pk, r)

    return kernel


@partial(jax.jit, static_argnames=("emissive_lit", "render_size",
                                   "interpret", "total_rows"))
def spatial_fused(scene, g, view, frame, temporal_planes, prev_sp_planes,
                  *, emissive_lit: bool, render_size,
                  interpret: bool = False, row0=None,
                  total_rows: int | None = None):
    """Run the fused spatial pass for one channel.

    temporal_planes: [h,16,w] THIS frame's temporal reservoir channel
    planes (the mega-kernel's {e,i}_packed output). prev_sp_planes:
    [h,16,w] previous spatial reservoir, already reprojection-gathered and
    validation-replaced by the caller. Returns {"render" [h,w,4],
    "variance" [h,w] (NaN where the temporal variance should remain),
    "spatial_planes" [h,16,w]}. row0: global row offset (sharded callers).
    """
    if not interpret:
        interpret = not any(d.platform != "cpu" for d in jax.devices())
    h, w = render_size
    count_taps = 8 if emissive_lit else 16
    reuse_range = 10 if emissive_lit else 20
    halo = reuse_range

    from hikari_tpu.utils.math import random_float

    bh = _block_h(w)
    wp = -(-w // _LANES) * _LANES
    hp = -(-h // bh) * bh

    depth = g["position"][..., 3]
    mat_f = jnp.maximum(
        g["instance_material"][..., 1].astype(jnp.int32), 0) \
        .astype(jnp.float32)

    def pad_center(x):
        cfg = [(0, hp - h)] + [(0, 0)] * (x.ndim - 2) + [(0, wp - w)]
        return jnp.pad(x, cfg) if (hp > h or wp > w) else x

    bot = _win_rows(bh, halo) - bh - halo   # bottom margin incl. alignment

    def pad_window(x):
        cfg = [(halo, bot + hp - h)] + [(0, 0)] * (x.ndim - 2) \
            + [(0, wp - w)]
        return jnp.pad(x, cfg)

    src_rsv = pad_window(temporal_planes)
    src_dep = pad_window(depth)
    prev_p = pad_center(prev_sp_planes)
    pxp = pad_center(g["position"][..., 0])
    pyp = pad_center(g["position"][..., 1])
    pzp = pad_center(g["position"][..., 2])
    matp = pad_center(mat_f)

    n_mats = scene["mat_packed"].shape[0]
    mats = jnp.pad(scene["mat_packed"],
                   ((0, 0), (0, _LANES - scene["mat_packed"].shape[1])))

    max_life = jnp.where(frame["max_reservoir_lifetime"] <= 1.0, F32_MAX,
                         frame["max_reservoir_lifetime"])
    prow = jnp.zeros((_LANES,), jnp.float32)
    prow = prow.at[_S_FRAND].set(random_float(frame["number"][None])[0])
    prow = prow.at[_S_MAXLIFE].set(max_life)
    prow = prow.at[_S_MAXCNT].set(frame["max_spatial_reuse_count"])
    prow = lax.dynamic_update_slice(prow, scene["ambient_color"][:3],
                                    (_S_AMB,))
    prow = lax.dynamic_update_slice(prow, view["world_position"], (_S_CAM,))
    prow = prow.at[_S_ROW0].set(0.0 if row0 is None
                                else row0.astype(jnp.float32))
    # sharded callers pass the TOTAL image rows for the in-bounds gate
    prow = prow.at[_S_H].set(float(h if total_rows is None else total_rows))
    prow = prow.at[_S_W].set(float(w))
    params = prow[None, :]

    kernel = _build_kernel(
        emissive_lit=emissive_lit, count_taps=count_taps,
        reuse_range=reuse_range, n_mats=n_mats, bh=bh, halo=halo, wp=wp)
    WIN = _win_rows(bh, halo)

    grid = hp // bh
    ray_spec = pl.BlockSpec((bh, wp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    rsv_spec = pl.BlockSpec((bh, 16, wp), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tab = lambda r: pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(grid,),
        in_specs=[tab(1), tab(mats.shape[0]),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                  rsv_spec, ray_spec, ray_spec, ray_spec, ray_spec],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec, rsv_spec],
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((hp, 16, wp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((WIN, 16, wp), jnp.float32),
            pltpu.VMEM((WIN, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, mats, src_rsv, src_dep, prev_p, pxp, pyp, pzp, matp)

    alpha = (depth >= F32_EPSILON).astype(jnp.float32)
    render = jnp.stack([outs[0][:h, :w], outs[1][:h, :w], outs[2][:h, :w],
                        alpha], axis=-1)
    return {"render": render, "variance": outs[3][:h, :w],
            "spatial_planes": outs[4][:h, :, :w]}
