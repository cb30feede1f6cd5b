"""Tile-cull trace engine: the TPU-native large-scene ray tracer.

Replaces the reference's per-thread stackless BVH walk (light.wgsl:400-486)
with a two-phase formulation that never gathers per ray:

  Phase 1 (XLA, dense): rays are grouped into TILES of 1024 (32x32 screen
  blocks when `shape2d` is given). Each tile's conservative bounds (origin
  AABB, per-axis direction interval, max t) are slab-tested against every
  cluster AABB with interval arithmetic — a [tiles, clusters] elementwise
  grid, pure VPU work. Surviving clusters are compacted front-to-back (by
  conservative entry t) into a per-tile list via lax.top_k.

  Phase 2 (Pallas): grid over tiles. The kernel walks the tile's cluster
  list, double-buffer-DMAs each cluster's fixed 64-triangle block
  (8 triangles packed per 128-lane row, models/clusters.py) from HBM into
  VMEM, and intersects it densely against the tile's 1024 rays with an
  8-wide statically unrolled Möller-Trumbore (light.wgsl:364-398). Measured
  ~0.046 ns per (ray, triangle) pair on v5e — ~100x cheaper than one
  per-ray row gather, which is why culling at tile granularity (not per
  ray) is the right TPU trade.

Correctness never depends on ray coherence: the cull test is conservative
for ANY ray set (incoherent tiles just prune less). Hit contract matches
ops/trace.py: exclude_instance / include_instance semantics of
light.wgsl:459,682-687; misses have instance == -1.

If a tile's surviving-cluster count exceeds the list capacity, the tile's
count is marked -1 and the kernel sweeps every cluster (slow but exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_MAX = 3.402823466e38
F32_EPSILON = 1.1920929e-7
DISTANCE_MAX = 65535.0

LANES = 128
ROWS = 8                  # ray rows per tile -> 1024 rays
TILE_RAYS = ROWS * LANES
TILE_H, TILE_W = 32, 32   # screen-space tile when shape2d is known
CAP = 64                  # cluster-list capacity per tile


# --------------------------------------------------------------------------
# ray tiling
# --------------------------------------------------------------------------

def _tile_flat(x, n_tiles, edge):
    """[N,...] -> [n_tiles*ROWS, LANES, ...] padding at the end."""
    n = x.shape[0]
    pad = n_tiles * TILE_RAYS - n
    mode = "edge" if edge else "constant"
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, cfg, mode=mode) if pad else x
    return xp.reshape((n_tiles * ROWS, LANES) + x.shape[1:])


def _untile_flat(x, n):
    return x.reshape((-1,) + x.shape[2:])[:n]


def _tile_2d(x, h, w, edge):
    """[h*w,...] -> tiles of TILE_H x TILE_W screen blocks."""
    th, tw = -(-h // TILE_H), -(-w // TILE_W)
    mode = "edge" if edge else "constant"
    xp = x.reshape((h, w) + x.shape[1:])
    xp = jnp.pad(xp, [(0, th * TILE_H - h), (0, tw * TILE_W - w)]
                 + [(0, 0)] * (x.ndim - 1), mode=mode)
    xp = xp.reshape((th, TILE_H, tw, TILE_W) + x.shape[1:])
    xp = jnp.moveaxis(xp, 2, 1)  # [th, tw, TILE_H, TILE_W, ...]
    return xp.reshape((th * tw * ROWS, LANES) + x.shape[1:])


def _untile_2d(x, h, w):
    th, tw = -(-h // TILE_H), -(-w // TILE_W)
    xp = x.reshape((th, tw, TILE_H, TILE_W) + x.shape[2:])
    xp = jnp.moveaxis(xp, 1, 2)
    xp = xp.reshape((th * TILE_H, tw * TILE_W) + x.shape[4:])
    return xp[:h, :w].reshape((h * w,) + x.shape[4:])


def _octant_order(rd, n, h, w, ro=None, sb_min=None, sb_max=None):
    """Permutation grouping rays by (direction cone, origin locality).

    Incoherent ray sets (indirect bounces, light.wgsl:1396-1399) span all
    direction signs inside a screen tile, which makes every slab axis
    unbounded and defeats the interval cull. The primary key is a 96-cone
    direction bin — sign octant (3 bits) x dominant axis (x3) x the two
    minor/major axis ratios halved (x4) — so every 1024-ray packet spans a
    ~28-degree cone, not a 90-degree octant; within a cone the rays order
    by the 21-bit Morton code of their ORIGIN (when given) so each packet
    also has a tight 3-D origin box. Measured on the 96k-tri scene probe:
    octant-only 509 ns/ray -> +dominant-axis 289 -> +ratio bins 204
    (round-2 screen-tile key: 489).
    """
    octant = ((rd[:, 0] < 0).astype(jnp.int32)
              + 2 * (rd[:, 1] < 0).astype(jnp.int32)
              + 4 * (rd[:, 2] < 0).astype(jnp.int32))
    ad = jnp.abs(rd)
    amax = jnp.maximum(jnp.max(ad, axis=1), 1e-9)
    amin = jnp.min(ad, axis=1)
    amid = ad.sum(axis=1) - amax - amin
    dom = jnp.argmax(ad, axis=1).astype(jnp.int32)
    r1 = jnp.clip((amin / amax * 2.0).astype(jnp.int32), 0, 1)
    r2 = jnp.clip((amid / amax * 2.0).astype(jnp.int32), 0, 1)
    cone = ((octant * 3 + dom) * 2 + r1) * 2 + r2
    if ro is not None and sb_min is not None:
        extent = jnp.maximum(sb_max - sb_min, 1e-6)
        q = jnp.clip(((ro - sb_min) / extent * 127.0).astype(jnp.int32),
                     0, 127)
        sub = jnp.zeros((n,), jnp.int32)
        for b in range(7):
            for a in range(3):
                sub = sub | (((q[:, a] >> b) & 1) << (3 * b + a))
        key = cone * (1 << 21) + sub
    elif h is not None:
        pix = jnp.arange(n, dtype=jnp.int32)
        tw = -(-w // TILE_W)
        tile_id = (pix // w // TILE_H) * tw + (pix % w) // TILE_W
        key = cone * ((-(-h // TILE_H)) * tw) + tile_id
    else:
        key = cone * (-(-n // TILE_RAYS)) + (
            jnp.arange(n, dtype=jnp.int32) // TILE_RAYS)
    order = jnp.argsort(key)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return order, inv


# --------------------------------------------------------------------------
# phase 1: conservative tile-vs-cluster cull
# --------------------------------------------------------------------------

def cull_phase(cl_aabb, ro_t, rd_t, mt_t, cap: int = CAP):
    """cl_aabb [C,8]; ro_t/rd_t [T*ROWS, LANES, 3]; mt_t [T*ROWS, LANES].
    Returns (lists [T, cap] i32, counts [T] i32 with -1 = overflow)."""
    c = cl_aabb.shape[0]
    t = ro_t.shape[0] // ROWS
    ro = ro_t.reshape(t, TILE_RAYS, 3)
    rd = rd_t.reshape(t, TILE_RAYS, 3)
    mt = mt_t.reshape(t, TILE_RAYS)

    olo, ohi = ro.min(axis=1), ro.max(axis=1)            # [T,3]
    dlo, dhi = rd.min(axis=1), rd.max(axis=1)
    mt_max = mt.max(axis=1)                              # [T]

    monotone = (dlo > 0.0) | (dhi < 0.0)
    safe_lo = jnp.where(jnp.abs(dlo) < 1e-20, 1e-20, dlo)
    safe_hi = jnp.where(jnp.abs(dhi) < 1e-20, 1e-20, dhi)
    ilo = jnp.where(monotone, 1.0 / safe_hi, 0.0)        # [T,3]
    ihi = jnp.where(monotone, 1.0 / safe_lo, 0.0)

    bmin = cl_aabb[None, :, 0:3]                         # [1,C,3]
    bmax = cl_aabb[None, :, 3:6]

    def prods(blo_, bhi_):
        # interval (b - O) x interval I: extremes over the 4 products
        a_lo = blo_ - ohi[:, None]
        a_hi = bhi_ - olo[:, None]
        p1 = a_lo * ilo[:, None]
        p2 = a_lo * ihi[:, None]
        p3 = a_hi * ilo[:, None]
        p4 = a_hi * ihi[:, None]
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    tmin_ax, tmax_ax = prods(bmin, bmax)                 # [T,C,3]
    # axes whose direction interval spans 0 cannot bound t
    unbounded = ~monotone[:, None, :]
    tmin_ax = jnp.where(unbounded, 0.0, tmin_ax)
    tmax_ax = jnp.where(unbounded, F32_MAX, tmax_ax)
    t_lo = jnp.maximum(tmin_ax.max(axis=-1), 0.0)        # [T,C]
    t_hi = tmax_ax.min(axis=-1)
    survive = (t_lo <= t_hi) & (t_hi >= 0.0) & (t_lo <= mt_max[:, None])
    # padded clusters carry inverted AABBs ([1e30, -1e30]); the interval
    # test does NOT reject them on its own (t_lo clamps to 0, t_hi stays
    # huge when origin/direction intervals span the box), so kill them
    # explicitly — otherwise every empty cluster survives at enter=0,
    # sorts to the FRONT of every tile list and wastes cap slots
    survive &= jnp.all(cl_aabb[None, :, 0:3] <= cl_aabb[None, :, 3:6],
                       axis=-1)

    key = jnp.where(survive, t_lo, F32_MAX)              # front-to-back
    neg_enter, lists = jax.lax.top_k(-key, min(cap, c))
    enter = -neg_enter
    if cap > c:
        lists = jnp.pad(lists, ((0, 0), (0, cap - c)))
        enter = jnp.pad(enter, ((0, 0), (0, cap - c)),
                        constant_values=F32_MAX)
    counts = survive.sum(axis=1).astype(jnp.int32)
    counts = jnp.where(counts > cap, -1, counts)
    # per-(tile, cluster) conservative entry t for EVERY cluster (culled ->
    # F32_MAX): the kernel's per-block skip test during overflow sweeps
    return lists.astype(jnp.int32), counts, enter, key


# --------------------------------------------------------------------------
# phase 2: Pallas tile kernels
# --------------------------------------------------------------------------

def _mt_core(row, o, ox, oy, oz, dx, dy, dz):
    """8-packed Möller-Trumbore for the triangle at lane offset o.
    Returns (dist, u, v, inst, valid_geo)."""
    v0x, v0y, v0z = row[0, 0, o], row[0, 0, o + 1], row[0, 0, o + 2]
    v1x, v1y, v1z = row[0, 0, o + 3], row[0, 0, o + 4], row[0, 0, o + 5]
    v2x, v2y, v2z = row[0, 0, o + 6], row[0, 0, o + 7], row[0, 0, o + 8]
    inst = row[0, 0, o + 9]
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
    valid = ((jnp.abs(det) >= F32_EPSILON)
             & (u >= 0.0) & (u <= 1.0)
             & (v >= 0.0) & (u + v <= 1.0)
             & (dist > F32_EPSILON))
    return dist, u, v, inst, valid


SWEEP_BLOCKS = 8   # clusters per overflow-sweep iteration (one big DMA)


def _make_kernel(mode: str, cluster: int, cap: int, total_clusters: int):
    rows_per = cluster // 8
    want_attr = mode == "full"
    SB = SWEEP_BLOCKS
    n_super = -(-total_clusters // SB)
    n_s64 = -(-n_super // 8)

    def kernel(list_ref, count_ref, enter_ref, enter_all_ref, esup_ref,
               saabb_ref, esup64_ref, saabb64_ref, tris_any, *rest):
        if want_attr:
            attr_any = rest[0]
            rest = rest[1:]
        rox, roy, roz, rdx, rdy, rdz, maxt, excl, incl = rest[:9]
        rest = rest[9:]
        n_out = _N_OUT[mode]
        outs = rest[:n_out]
        if want_attr:
            (scr_pos, scr_attr, swp_pos, swp_attr,
             sem_pos, sem_attr, sem_sw, sem_swa) = rest[n_out:]
        else:
            scr_pos, swp_pos, sem_pos, sem_sw = rest[n_out:]

        ox, oy, oz = rox[:], roy[:], roz[:]
        dx, dy, dz = rdx[:], rdy[:], rdz[:]
        mt = maxt[:]
        ex = excl[:]
        inc = incl[:]
        # safe inverse directions for the per-block slab pre-test
        def _inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                                   jnp.where(d < 0, -1e-20, 1e-20), d)
        ivx, ivy, ivz = _inv(dx), _inv(dy), _inv(dz)

        cnt = count_ref[0, 0, 0]
        # overflow (cnt < 0): process the sorted cap-nearest prefix first
        # (early-out applies: unlisted clusters all have enter >= the
        # prefix's last entry), then sweep every cluster in SB-wide
        # super-blocks only while the bound stays above enter[cap-1]
        n = jnp.where(cnt < 0, cap, cnt)

        def tbest_of(carry):
            if mode == "shadow":
                td_c, ads_c, inst_c = carry
                return jnp.where(inst_c >= 0.0, td_c / ads_c, F32_MAX)
            return carry[0]

        def bound_of(carry):
            return jnp.max(jnp.minimum(tbest_of(carry), mt))

        def intersect_rows(read_pos, read_attr, c0):
            def row_body(r, c2):
                row = read_pos(r)
                if want_attr:
                    arow = read_attr(r)
                for o in range(0, 128, 16):
                    if mode == "shadow":
                        c2 = _shadow_tri(row, o, ox, oy, oz, dx, dy, dz,
                                         mt, ex, inc, c2)
                    else:
                        dist, u, v, inst, valid = _mt_core(
                            row, o, ox, oy, oz, dx, dy, dz)
                        ok = (valid & (dist < mt) & (dist < c2[0])
                              & (inst >= 0.0) & (inst != ex)
                              & ((inc < 0.0) | (inst == inc)))
                        prim = row[0, 0, o + 10]
                        if mode == "hit":
                            tb, ub, vb, pb, ib = c2
                            c2 = (jnp.where(ok, dist, tb),
                                  jnp.where(ok, u, ub),
                                  jnp.where(ok, v, vb),
                                  jnp.where(ok, prim, pb),
                                  jnp.where(ok, inst, ib))
                        else:
                            a0 = o
                            nx = (arow[0, 0, a0] + u * (arow[0, 0, a0 + 3] - arow[0, 0, a0])
                                  + v * (arow[0, 0, a0 + 6] - arow[0, 0, a0]))
                            ny = (arow[0, 0, a0 + 1] + u * (arow[0, 0, a0 + 4] - arow[0, 0, a0 + 1])
                                  + v * (arow[0, 0, a0 + 7] - arow[0, 0, a0 + 1]))
                            nz = (arow[0, 0, a0 + 2] + u * (arow[0, 0, a0 + 5] - arow[0, 0, a0 + 2])
                                  + v * (arow[0, 0, a0 + 8] - arow[0, 0, a0 + 2]))
                            uvx = (arow[0, 0, a0 + 9] + u * (arow[0, 0, a0 + 11] - arow[0, 0, a0 + 9])
                                   + v * (arow[0, 0, a0 + 13] - arow[0, 0, a0 + 9]))
                            uvy = (arow[0, 0, a0 + 10] + u * (arow[0, 0, a0 + 12] - arow[0, 0, a0 + 10])
                                   + v * (arow[0, 0, a0 + 14] - arow[0, 0, a0 + 10]))
                            mat = arow[0, 0, a0 + 15]
                            (tb, pb, nxb, nyb, nzb, uxb, uyb, mb, ib) = c2
                            c2 = (jnp.where(ok, dist, tb),
                                  jnp.where(ok, prim, pb),
                                  jnp.where(ok, nx, nxb),
                                  jnp.where(ok, ny, nyb),
                                  jnp.where(ok, nz, nzb),
                                  jnp.where(ok, uvx, uxb),
                                  jnp.where(ok, uvy, uyb),
                                  jnp.where(ok, mat, mb),
                                  jnp.where(ok, inst, ib))
                return c2

            return jax.lax.fori_loop(0, rows_per, row_body, c0)

        def gated_block(read_pos, read_attr, tb_c, c0):
            """Per-ray slab test against the block's AABB (stashed in the
            first packed row's padding lanes by models/clusters.py):
            intersect the 8-row block only if SOME ray can improve."""
            r0 = read_pos(0)
            t1x = (r0[0, 0, 11] - ox) * ivx
            t2x = (r0[0, 0, 27] - ox) * ivx
            t1y = (r0[0, 0, 12] - oy) * ivy
            t2y = (r0[0, 0, 28] - oy) * ivy
            t1z = (r0[0, 0, 13] - oz) * ivz
            t2z = (r0[0, 0, 29] - oz) * ivz
            t_en = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            t_ex = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            can = (t_ex >= t_en) & (t_ex >= 0.0) & (
                t_en < jnp.minimum(tb_c, mt))
            return jax.lax.cond(
                jnp.any(can),
                lambda c: intersect_rows(read_pos, read_attr, c),
                lambda c: c, c0)

        # ---------------- phase 1: sorted prefix ----------------
        def dma_pos(slot, j):
            cid = list_ref[0, 0, jnp.minimum(j, cap - 1)]
            return pltpu.make_async_copy(
                tris_any.at[pl.ds(cid * rows_per, rows_per), :],
                scr_pos.at[slot], sem_pos.at[slot])

        if want_attr:
            def dma_attr(slot, j):
                cid = list_ref[0, 0, jnp.minimum(j, cap - 1)]
                return pltpu.make_async_copy(
                    attr_any.at[pl.ds(cid * rows_per, rows_per), :],
                    scr_attr.at[slot], sem_attr.at[slot])

        @pl.when(n > 0)
        def _():
            dma_pos(0, 0).start()
            if want_attr:
                dma_attr(0, 0).start()

        def body(state):
            j, carry = state
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n)
            def _():
                nslot = jax.lax.rem(j + 1, 2)
                dma_pos(nslot, j + 1).start()
                if want_attr:
                    dma_attr(nslot, j + 1).start()

            dma_pos(slot, j).wait()
            if want_attr:
                dma_attr(slot, j).wait()

            def rp(r):
                return scr_pos[pl.ds(slot, 1), pl.ds(r, 1), :]

            def ra(r):
                return scr_attr[pl.ds(slot, 1), pl.ds(r, 1), :]

            # per-block skip: a block whose conservative entry t exceeds
            # the packet's bound cannot improve any ray (the DMA already
            # ran; only the intersection math is skipped)
            cid = list_ref[0, 0, jnp.minimum(j, cap - 1)]
            e_blk = enter_all_ref[
                0, 0, jnp.minimum(cid, total_clusters - 1)]
            tb_c = tbest_of(carry)
            bound_c = jnp.max(jnp.minimum(tb_c, mt))
            carry = jax.lax.cond(
                e_blk <= bound_c,
                lambda c: gated_block(rp, ra if want_attr else None,
                                      tb_c, c),
                lambda c: c, carry)
            return j + 1, carry

        shape = ox.shape
        fmax = jnp.full(shape, F32_MAX, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        neg1 = jnp.full(shape, -1.0, jnp.float32)
        if mode == "hit":
            init = (fmax, zero, zero, neg1, neg1)
        elif mode == "full":
            init = (fmax, neg1, zero, zero, zero, zero, zero, neg1, neg1)
        else:
            init = (fmax, jnp.ones(shape, jnp.float32), neg1)

        def cond(state):
            j, carry = state
            go = j < n
            # front-to-back early-out: the list is sorted by conservative
            # entry t, so once every ray's best-so-far (capped by its
            # max_t) is closer than the next cluster's entry, no later
            # cluster can produce a closer valid hit
            enter_j = enter_ref[0, 0, jnp.minimum(j, cap - 1)]
            go &= enter_j <= bound_of(carry)
            return go

        j_stop, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))

        # drain the one in-flight prefetch the loop may have left behind
        @pl.when(j_stop < n)
        def _():
            slot = jax.lax.rem(j_stop, 2)
            dma_pos(slot, j_stop).wait()
            if want_attr:
                dma_attr(slot, j_stop).wait()

        # ---------------- phase 2: super-block sweep (overflow) ----------
        # Overflow packets used to walk the remaining clusters ONE 4 KB
        # DMA at a time — 2.3k iterations of DMA issue/wait dominated the
        # realistic divergent-ray profile (round-5 probe: 46.9% of bounce
        # packets overflow, p90 sees every cluster). The sweep now fetches
        # SB consecutive clusters per iteration (the packed table is
        # cluster-contiguous) and gates each block from VMEM; a per-super
        # entry minimum (esup_ref) skips whole super-blocks.
        def sdma_pos(slot, k):
            return pltpu.make_async_copy(
                tris_any.at[pl.ds(k * SB * rows_per, SB * rows_per), :],
                swp_pos.at[slot], sem_sw.at[slot])

        if want_attr:
            def sdma_attr(slot, k):
                return pltpu.make_async_copy(
                    attr_any.at[pl.ds(k * SB * rows_per, SB * rows_per), :],
                    swp_attr.at[slot], sem_swa.at[slot])

        def slab_gate(aabb_ref, k, lim):
            """Vector slab test of every ray against an SMEM AABB row:
            True where a ray could hit inside the box closer than lim."""
            t1x = (aabb_ref[0, k, 0] - ox) * ivx
            t2x = (aabb_ref[0, k, 3] - ox) * ivx
            t1y = (aabb_ref[0, k, 1] - oy) * ivy
            t2y = (aabb_ref[0, k, 4] - oy) * ivy
            t1z = (aabb_ref[0, k, 2] - oz) * ivz
            t2z = (aabb_ref[0, k, 5] - oz) * ivz
            s_en = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            s_ex = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            return (s_ex >= s_en) & (s_ex >= 0.0) & (s_en < lim)

        # Two-level sweep (round-5 probe: the sweep's cost is per-
        # iteration control flow + gating, NOT DMA bytes — 636 ns/ray
        # with per-block conds, 520 with a super8 vector gate). The
        # outer loop walks 64-cluster SUPER64 regions (Morton order
        # keeps them spatially tight): ONE scalar entry test + ONE
        # vector slab test against the union AABB either skips all 8
        # super8 DMAs and 64 block gates, or runs the inner 8-step
        # double-buffered pipeline. Divergent packets whose rays found
        # close hits in the sorted prefix prune most super64s outright.
        def sweep(c0):
            def s64body(state):
                k64, carry = state
                tb_c = tbest_of(carry)
                bound_c = jnp.max(jnp.minimum(tb_c, mt))
                ok = (esup64_ref[0, 0, k64] <= bound_c) & jnp.any(
                    slab_gate(saabb64_ref, k64,
                              jnp.minimum(tb_c, mt)))

                def proc64(c):
                    def kk_of(j):
                        # pad-tail super8s clamp to the last real super:
                        # a re-test of the same blocks is idempotent
                        return jnp.minimum(k64 * 8 + j, n_super - 1)

                    sdma_pos(0, kk_of(0)).start()
                    if want_attr:
                        sdma_attr(0, kk_of(0)).start()

                    def inner(j, c2):
                        slot = jax.lax.rem(j, 2)

                        @pl.when(j + 1 < 8)
                        def _():
                            nslot = jax.lax.rem(j + 1, 2)
                            sdma_pos(nslot, kk_of(j + 1)).start()
                            if want_attr:
                                sdma_attr(nslot, kk_of(j + 1)).start()

                        sdma_pos(slot, kk_of(j)).wait()
                        if want_attr:
                            sdma_attr(slot, kk_of(j)).wait()

                        k = kk_of(j)
                        tb2 = tbest_of(c2)
                        bound2 = jnp.max(jnp.minimum(tb2, mt))
                        s_can = slab_gate(saabb_ref, k,
                                          jnp.minimum(tb2, mt))

                        def proc(c3):
                            for b in range(SB):
                                def rp(r, b=b, slot=slot):
                                    return swp_pos[
                                        pl.ds(slot, 1),
                                        pl.ds(b * rows_per + r, 1), :]

                                def ra(r, b=b, slot=slot):
                                    return swp_attr[
                                        pl.ds(slot, 1),
                                        pl.ds(b * rows_per + r, 1), :]

                                cid = jnp.minimum(k * SB + b,
                                                  total_clusters - 1)
                                e_blk = enter_all_ref[0, 0, cid]
                                c3 = jax.lax.cond(
                                    e_blk <= bound2,
                                    lambda cc, rp=rp, ra=ra: gated_block(
                                        rp, ra if want_attr else None,
                                        tb2, cc),
                                    lambda cc: cc, c3)
                            return c3

                        return jax.lax.cond(
                            (esup_ref[0, 0, k] <= bound2)
                            & jnp.any(s_can), proc, lambda c3: c3, c2)

                    return jax.lax.fori_loop(0, 8, inner, c)

                carry = jax.lax.cond(ok, proc64, lambda c: c, carry)
                return k64 + 1, carry

            def s64cond(state):
                k64, carry = state
                go = k64 < n_s64
                # every unlisted cluster has enter >= enter[cap-1]
                go &= enter_ref[0, 0, cap - 1] <= bound_of(carry)
                return go

            _, cf = jax.lax.while_loop(s64cond, s64body,
                                       (jnp.int32(0), c0))
            return cf

        final = jax.lax.cond(cnt < 0, sweep, lambda c: c, final)

        if mode == "shadow":
            td, ads, inst = final
            outs[0][:] = jnp.where(inst >= 0.0, td / ads, F32_MAX)
            outs[1][:] = inst
        else:
            for oref, val in zip(outs, final):
                oref[:] = val

    return kernel


def _shadow_tri(row, o, ox, oy, oz, dx, dy, dz, mt, ex, inc, carry):
    """Division-free occlusion test (same scheme as trace_pallas.py
    _kernel_shadow): all conditions in |det|-multiplied form, closest-t by
    cross-multiplication; one divide per ray after the loop."""
    td_best, ads_best, inst_best = carry
    v0x, v0y, v0z = row[0, 0, o], row[0, 0, o + 1], row[0, 0, o + 2]
    v1x, v1y, v1z = row[0, 0, o + 3], row[0, 0, o + 4], row[0, 0, o + 5]
    v2x, v2y, v2z = row[0, 0, o + 6], row[0, 0, o + 7], row[0, 0, o + 8]
    inst = row[0, 0, o + 9]
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
          & (td < mt * ads)
          & (td * ads_best < td_best * ads)
          & (inst >= 0.0)
          & (inst != ex)
          & ((inc < 0.0) | (inst == inc)))
    return (jnp.where(ok, td, td_best), jnp.where(ok, ads, ads_best),
            jnp.where(ok, inst, inst_best))


_N_OUT = {"hit": 5, "full": 9, "shadow": 2}


@functools.partial(jax.jit, static_argnames=("mode", "cluster", "cap",
                                              "interpret"))
def _run_tiles(tris_packed, attr_packed, cl_aabb, ro_t9, lists, counts,
               enter, enter_all, mode: str, cluster: int, cap: int,
               interpret: bool):
    """ro_t9: tuple of 9 [T*ROWS, LANES] ray arrays."""
    tiles = lists.shape[0]
    total_clusters = cl_aabb.shape[0]
    rows_per = cluster // 8
    kernel = _make_kernel(mode, cluster, cap, total_clusters)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    n_out = _N_OUT[mode]
    # per-super-block entry minimum for the sweep's DMA-level skip, and
    # zero row padding so the SB-wide sweep DMA never reads past the table
    SB = SWEEP_BLOCKS
    n_super = -(-total_clusters // SB)
    cpad = n_super * SB - total_clusters
    ea_p = jnp.pad(enter_all, ((0, 0), (0, cpad)), constant_values=F32_MAX)
    esup = ea_p.reshape(tiles, n_super, SB).min(axis=-1)
    # per-super union AABB (tile-independent) for the sweep's vector gate;
    # pad clusters get a degenerate inverted box so the union ignores them
    ca = cl_aabb[:, 0:6]
    if cpad:
        ca = jnp.concatenate(
            [ca, jnp.tile(jnp.asarray([[F32_MAX] * 3 + [-F32_MAX] * 3],
                                      ca.dtype), (cpad, 1))], axis=0)
    saabb = jnp.concatenate(
        [ca[:, 0:3].reshape(n_super, SB, 3).min(axis=1),
         ca[:, 3:6].reshape(n_super, SB, 3).max(axis=1)], axis=-1)
    # super64 level: 8 super8s per outer sweep step (pad: entry F32_MAX,
    # degenerate AABB — the outer gate then always skips the pad tail)
    n_s64 = -(-n_super // 8)
    spad = n_s64 * 8 - n_super
    esup_p = jnp.pad(esup, ((0, 0), (0, spad)), constant_values=F32_MAX)
    esup64 = esup_p.reshape(tiles, n_s64, 8).min(axis=-1)
    sa_p = saabb
    if spad:
        sa_p = jnp.concatenate(
            [saabb, jnp.tile(jnp.asarray([[F32_MAX] * 3 + [-F32_MAX] * 3],
                                         saabb.dtype), (spad, 1))], axis=0)
    saabb64 = jnp.concatenate(
        [sa_p[:, 0:3].reshape(n_s64, 8, 3).min(axis=1),
         sa_p[:, 3:6].reshape(n_s64, 8, 3).max(axis=1)], axis=-1)
    if cpad:
        tris_packed = jnp.pad(tris_packed,
                              ((0, cpad * rows_per), (0, 0)))
        if attr_packed is not None:
            attr_packed = jnp.pad(attr_packed,
                                  ((0, cpad * rows_per), (0, 0)))
    in_specs = [
        pl.BlockSpec((1, 1, cap), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, cap), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, total_clusters), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_super), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_super, 6), lambda i: (0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_s64), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_s64, 6), lambda i: (0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [pltpu.VMEM((2, rows_per, 128), jnp.float32),
               pltpu.VMEM((2, SB * rows_per, 128), jnp.float32),
               pltpu.SemaphoreType.DMA((2,)),
               pltpu.SemaphoreType.DMA((2,))]
    args = [lists[:, None, :], counts[:, None, None], enter[:, None, :],
            enter_all[:, None, :], esup[:, None, :], saabb[None],
            esup64[:, None, :], saabb64[None], tris_packed]
    if mode == "full":
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(attr_packed)
        scratch = [pltpu.VMEM((2, rows_per, 128), jnp.float32),
                   pltpu.VMEM((2, rows_per, 128), jnp.float32),
                   pltpu.VMEM((2, SB * rows_per, 128), jnp.float32),
                   pltpu.VMEM((2, SB * rows_per, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    outs = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(tiles,),
        in_specs=in_specs + [ray_spec] * 9,
        out_specs=[ray_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((tiles * ROWS, LANES), jnp.float32)]
        * n_out,
        scratch_shapes=scratch,
    )(*args, *ro_t9)
    return outs


# --------------------------------------------------------------------------
# public engine
# --------------------------------------------------------------------------

def _prep_rays(ro, rd, max_t, exclude_instance, include_instance, shape2d):
    n = ro.shape[0]
    if exclude_instance is None:
        exclude_instance = jnp.full((n,), -1, jnp.int32)
    if include_instance is None:
        include_instance = jnp.full((n,), -1, jnp.int32)
    max_t = jnp.asarray(max_t, jnp.float32) * jnp.ones((n,), jnp.float32)

    if shape2d is not None and shape2d[0] * shape2d[1] == n:
        h, w = shape2d
        tile = lambda x, edge: _tile_2d(x, h, w, edge)
        untile = lambda x: _untile_2d(x, h, w)
    else:
        th = -(-n // TILE_RAYS)
        tile = lambda x, edge: _tile_flat(x, th, edge)
        untile = lambda x: _untile_flat(x, n)

    ro_t = tile(ro, True)
    rd_t = tile(rd, True)
    mt_t = tile(max_t, False)
    # padded rays' exclude/include values are harmless: their outputs are
    # cropped before returning
    ex_t = tile(exclude_instance.astype(jnp.float32), True)
    inc_t = tile(include_instance.astype(jnp.float32), True)
    ray9 = (ro_t[..., 0], ro_t[..., 1], ro_t[..., 2],
            rd_t[..., 0], rd_t[..., 1], rd_t[..., 2],
            mt_t, ex_t, inc_t)
    return ray9, ro_t, rd_t, mt_t, untile


def cull_trace(scene, ro, rd, max_t, exclude_instance=None,
               include_instance=None, mode: str = "hit", shape2d=None,
               cap: int = CAP, incoherent: bool = False,
               interpret: bool = False):
    """Dispatch a cull-engine trace. Returns the ops/trace.py hit or info
    contract depending on `mode` ('hit' | 'full' | 'shadow').
    `incoherent=True` reorders rays by (tile, direction octant) first —
    use for bounce-style ray sets whose directions span all signs."""
    # cluster size is static geometry of the packed table: 8 triangles per
    # row, (rows / clusters) rows per cluster
    cluster = 8 * (scene["cl_tri_packed"].shape[0]
                   // scene["cl_aabb"].shape[0])
    n = ro.shape[0]
    inv_perm = None
    if incoherent:
        h, w = shape2d if (shape2d is not None
                           and shape2d[0] * shape2d[1] == n) else (None, None)
        order, inv_perm = _octant_order(
            rd, n, h, w, ro=ro,
            sb_min=jnp.min(scene["cl_aabb"][:, 0:3], axis=0),
            sb_max=jnp.max(scene["cl_aabb"][:, 3:6], axis=0))
        ro = jnp.take(ro, order, axis=0)
        rd = jnp.take(rd, order, axis=0)
        max_t = jnp.take(jnp.asarray(max_t, jnp.float32)
                         * jnp.ones((n,), jnp.float32), order)
        if exclude_instance is not None:
            exclude_instance = jnp.take(exclude_instance, order)
        if include_instance is not None:
            include_instance = jnp.take(include_instance, order)
        shape2d = None  # sorted order replaces screen tiling
    # clamp every ray's effective max_t at its scene-box exit: all geometry
    # lies inside the union of cluster AABBs, so no hit can be farther. This
    # lets sky-heading rays stop inflating the early-out bound (their
    # min(t_best, max_t) would otherwise stay F32_MAX forever).
    sb_min = jnp.min(scene["cl_aabb"][:, 0:3], axis=0)
    sb_max = jnp.max(scene["cl_aabb"][:, 3:6], axis=0)
    safe_rd = jnp.where(jnp.abs(rd) < 1e-20,
                        jnp.where(rd < 0, -1e-20, 1e-20), rd)
    inv = 1.0 / safe_rd
    t1 = (sb_min - ro) * inv
    t2 = (sb_max - ro) * inv
    t_en = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_ex = jnp.min(jnp.maximum(t1, t2), axis=-1)
    box_hit = (t_ex >= t_en) & (t_ex >= 0.0)
    max_t = jnp.minimum(jnp.asarray(max_t, jnp.float32),
                        jnp.where(box_hit, t_ex * 1.0001 + 1e-4, 0.0))
    ray9, ro_t, rd_t, mt_t, untile = _prep_rays(
        ro, rd, max_t, exclude_instance, include_instance, shape2d)
    lists, counts, enter, enter_all = cull_phase(
        scene["cl_aabb"], ro_t, rd_t, mt_t, cap=cap)
    outs = _run_tiles(scene["cl_tri_packed"], scene.get("cl_attr_packed"),
                      scene["cl_aabb"], ray9, lists, counts, enter,
                      enter_all, mode=mode, cluster=cluster, cap=cap,
                      interpret=interpret)
    outs = [untile(o) for o in outs]
    if inv_perm is not None:
        outs = [jnp.take(o, inv_perm, axis=0) for o in outs]
        ro = jnp.take(ro, inv_perm, axis=0)  # for position reconstruction
        rd = jnp.take(rd, inv_perm, axis=0)

    if mode == "shadow":
        t, inst_f = outs
        inst = jnp.round(inst_f).astype(jnp.int32)
        miss = inst < 0
        return {"t": jnp.where(miss, F32_MAX, t),
                "u": jnp.zeros((n,), jnp.float32),
                "v": jnp.zeros((n,), jnp.float32),
                "prim": jnp.full((n,), -1, jnp.int32),
                "instance": inst}
    if mode == "hit":
        t, u, v, p, inst_f = outs
        prim = jnp.round(p).astype(jnp.int32)
        inst = jnp.round(inst_f).astype(jnp.int32)
        miss = inst < 0
        return {"t": jnp.where(miss, F32_MAX, t), "u": u, "v": v,
                "prim": jnp.where(miss, -1, prim), "instance": inst}

    t, p, nx, ny, nz, uvx, uvy, mat, inst_f = outs
    prim = jnp.round(p).astype(jnp.int32)
    inst = jnp.round(inst_f).astype(jnp.int32)
    miss = inst < 0
    tt = jnp.where(miss, DISTANCE_MAX, t)
    pos = ro + rd * tt[:, None]
    normal = jnp.stack([nx, ny, nz], -1)
    nn = jnp.maximum(jnp.sum(normal * normal, -1), 1e-20)
    normal = normal * jax.lax.rsqrt(nn)[:, None]
    return {
        "t": jnp.where(miss, F32_MAX, t),
        "prim": jnp.where(miss, -1, prim),
        "instance": inst,
        "position": jnp.concatenate(
            [pos, jnp.where(miss, 0.0, 1.0)[:, None]], -1),
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "uv": jnp.where(miss[:, None], 0.0, jnp.stack([uvx, uvy], -1)),
        "material": jnp.where(miss, -1, jnp.round(mat).astype(jnp.int32)),
    }
