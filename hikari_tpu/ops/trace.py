"""Ray tracing on TPU: lockstep wavefront BVH traversal + brute-force MXU path.

The reference traverses per-thread stackless entry/exit loops
(light.wgsl:400-486). A scalar data-dependent loop per pixel would serialize
TPU vector lanes, so this module provides two *batched* engines:

1. `traverse_bvh`: all rays step their own entry/exit cursor in lockstep
   inside one `lax.while_loop`; each step is a dense gather of node/triangle
   rows + masked hit updates. Scales to any scene size.

2. `brute_force_intersect`: for small scenes (the cornell/minimal/simple
   benchmark class) testing EVERY triangle beats traversal on TPU — the
   [rays x tris] intersection work is dense, regular, and fuses into a few
   large vector ops (and maps to the MXU in the Pallas variant,
   ops/trace_pallas.py). `lax.scan` over triangle tiles keeps memory bounded.

Hit contract (matches light.wgsl Hit/Intersection): distance (F32_MAX miss),
barycentric uv, primitive index, instance index (-1 == miss, standing in for
the reference's U32_MAX).

Semantics notes:
* `exclude_instance` skips hits on one instance (shadow rays exclude their
  emitter, light.wgsl:459).
* `include_instance` accepts hits ONLY on one instance (the emissive probe
  ray that the reference traces in the emitter's own BLAS,
  light.wgsl:682-687).
* `early_distance` turns the query into an any-hit beyond that distance
  (light.wgsl:421-424): traversal stops once a hit closer than it is found.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hikari_tpu.utils.math import F32_MAX, F32_EPSILON, dot3

DONT_EXCLUDE = jnp.int32(-1)
ANY_INSTANCE = jnp.int32(-1)


def make_ray(origin, direction):
    """Precompute safe inverse direction (zero components -> huge finite)."""
    safe = jnp.where(jnp.abs(direction) < 1e-20,
                     jnp.where(direction < 0.0, -1e-20, 1e-20), direction)
    return origin, direction, 1.0 / safe


def intersects_aabb(ro, inv_rd, bmin, bmax):
    """Slab test (light.wgsl:344-362): returns entry t, or F32_MAX on miss."""
    t1 = (bmin - ro) * inv_rd
    t2 = (bmax - ro) * inv_rd
    t_min = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_max = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_max >= t_min) & (t_max >= 0.0)
    return jnp.where(hit, t_min, F32_MAX)


def intersect_triangle(ro, rd, v0, v1, v2):
    """Moller-Trumbore (light.wgsl:364-398). Returns (t, u, v); miss t=F32_MAX."""
    ab = v1 - v0
    ac = v2 - v0
    u_vec = jnp.cross(rd, ac)
    det = dot3(ab, u_vec)
    inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0, 1.0 / det)
    ao = ro - v0
    u = dot3(ao, u_vec) * inv_det
    v_vec = jnp.cross(ao, ab)
    v = dot3(rd, v_vec) * inv_det
    distance = dot3(ac, v_vec) * inv_det
    valid = (
        (jnp.abs(det) >= F32_EPSILON)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (distance > F32_EPSILON)
    )
    return jnp.where(valid, distance, F32_MAX), u, v


@partial(jax.jit, static_argnames=("tile",))
def brute_force_intersect(scene, ro, rd, max_t,
                          exclude_instance=None, include_instance=None, tile: int = 256):
    """Nearest-hit over every triangle, tiled scan. Shapes: ro/rd [N,3]."""
    n = ro.shape[0]
    p = scene["tri_pos"].shape[0]
    tile = min(tile, p)
    num_tiles = -(-p // tile)
    if exclude_instance is None:
        exclude_instance = jnp.full((n,), -1, jnp.int32)
    if include_instance is None:
        include_instance = jnp.full((n,), -1, jnp.int32)

    tri_pos = scene["tri_pos"]
    tri_inst = scene["tri_instance"]

    def body(carry, ti):
        t_best, u_best, v_best, prim_best = carry
        # clamp the start explicitly: XLA clamps out-of-bounds dynamic
        # slices silently, which would desynchronize `start + ti_best`
        # prim labels from the actually-sliced rows on the last tile
        start = jnp.minimum(ti * tile, p - tile)
        v = jax.lax.dynamic_slice_in_dim(tri_pos, start, tile, axis=0)  # [T,3,3]
        inst = jax.lax.dynamic_slice_in_dim(tri_inst, start, tile, axis=0)  # [T]
        t, u, vv = intersect_triangle(
            ro[:, None, :], rd[:, None, :], v[None, :, 0], v[None, :, 1], v[None, :, 2]
        )  # [N,T]
        ok = inst[None, :] >= 0
        ok &= inst[None, :] != exclude_instance[:, None]
        ok &= (include_instance[:, None] < 0) | (inst[None, :] == include_instance[:, None])
        t = jnp.where(ok, t, F32_MAX)
        t = jnp.where(t < max_t[:, None], t, F32_MAX)
        ti_best = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        t_new = t[rows, ti_best]
        closer = t_new < t_best
        t_best = jnp.where(closer, t_new, t_best)
        u_best = jnp.where(closer, u[rows, ti_best], u_best)
        v_best = jnp.where(closer, vv[rows, ti_best], v_best)
        prim_best = jnp.where(closer, start + ti_best, prim_best)
        return (t_best, u_best, v_best, prim_best), None

    init = (
        jnp.full((n,), F32_MAX, jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
    )
    (t, u, v, prim), _ = jax.lax.scan(body, init, jnp.arange(num_tiles))
    from hikari_tpu.utils.math import table_gather

    miss = prim < 0
    inst = jnp.round(
        table_gather(scene["tri_pos_flat"], jnp.maximum(prim, 0))[:, 9]
    ).astype(jnp.int32)
    instance = jnp.where(miss, -1, inst)
    return {"t": t, "u": u, "v": v, "prim": prim, "instance": instance}


def traverse_bvh(scene, ro, rd, max_t,
                 exclude_instance=None, include_instance=None,
                 early_distance=None, max_steps=None):
    """Lockstep stackless entry/exit traversal over the world BVH.

    All rays advance one node per iteration of a shared while_loop; rays that
    finish idle (masked) until the last ray exits. Divergence cost is bounded
    by the longest single-ray path, which the BVH keeps O(log n + hits).
    """
    n = ro.shape[0]
    node_count = scene["bvh_entry"].shape[0]
    if exclude_instance is None:
        exclude_instance = jnp.full((n,), -1, jnp.int32)
    if include_instance is None:
        include_instance = jnp.full((n,), -1, jnp.int32)
    if early_distance is None:
        early_distance = jnp.zeros((n,), jnp.float32)

    from hikari_tpu.utils.math import table_gather

    _, _, inv_rd = make_ray(ro, rd)

    bvh_packed = scene["bvh_packed"]
    tri_pos_flat = scene["tri_pos_flat"]

    def cond(state):
        idx = state[0]
        return jnp.any(idx < node_count)

    def body(state):
        idx, t_best, u_best, v_best, prim_best = state
        safe = jnp.minimum(idx, node_count - 1)
        node = table_gather(bvh_packed, safe)  # [N,9]
        nmin = node[:, 0:3]
        nmax = node[:, 3:6]
        is_leaf = node[:, 6] > 0.5
        payload = jnp.round(node[:, 7]).astype(jnp.int32)
        exit_ = jnp.round(node[:, 8]).astype(jnp.int32)
        active = idx < node_count

        aabb_t = intersects_aabb(ro, inv_rd, nmin, nmax)
        aabb_hit = aabb_t < t_best

        prim = jnp.where(is_leaf, payload, 0)
        tri = table_gather(tri_pos_flat, prim)  # [N,10]
        v = tri[:, :9].reshape(-1, 3, 3)
        t, u, vv = intersect_triangle(ro, rd, v[:, 0], v[:, 1], v[:, 2])
        inst = jnp.round(tri[:, 9]).astype(jnp.int32)
        accept = (
            active & is_leaf & aabb_hit
            & (t < t_best)
            & (inst >= 0)
            & (inst != exclude_instance)
            & ((include_instance < 0) | (inst == include_instance))
        )
        t_best = jnp.where(accept, t, t_best)
        u_best = jnp.where(accept, u, u_best)
        v_best = jnp.where(accept, vv, v_best)
        prim_best = jnp.where(accept, prim, prim_best)

        early_out = accept & (t_best < early_distance)
        next_idx = jnp.where(is_leaf, exit_,
                             jnp.where(aabb_hit, payload, exit_))
        idx = jnp.where(active, jnp.where(early_out, node_count, next_idx), idx)
        return idx, t_best, u_best, v_best, prim_best

    state = (
        jnp.zeros((n,), jnp.int32),
        jnp.asarray(max_t, jnp.float32) * jnp.ones((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
    )
    idx, t, u, v, prim = jax.lax.while_loop(cond, body, state)
    miss = prim < 0
    inst_f = table_gather(tri_pos_flat, jnp.maximum(prim, 0))[:, 9]
    instance = jnp.where(miss, -1, jnp.round(inst_f).astype(jnp.int32))
    return {"t": t, "u": u, "v": v, "prim": prim, "instance": instance}


def _probe_all_pairs(tris, attrs, ro, rd, max_t, exclude_instance,
                     include_instance):
    """All-pairs Möller-Trumbore over a tiny triangle table (the emissive
    subset) — [N, E] intermediates, winner attrs via one-hot matmul (no
    per-pixel gather). Same hit-info contract as pallas_brute_force_full;
    `prim` is local to the probe table (no consumer reads it:
    select_light_candidate uses position/normal/t/instance/uv only).
    """
    E = tris.shape[0]
    v0 = tris[None, :, 0:3]
    e1 = tris[None, :, 3:6] - v0
    e2 = tris[None, :, 6:9] - v0
    inst = jnp.round(tris[:, 9]).astype(jnp.int32)[None, :]
    d = rd[:, None, :]
    o = ro[:, None, :]
    u_vec = jnp.cross(d, e2)
    det = jnp.sum(e1 * u_vec, -1)
    inv_det = jnp.where(jnp.abs(det) < F32_EPSILON, 0.0, 1.0 / det)
    ao = o - v0
    u = jnp.sum(ao * u_vec, -1) * inv_det
    v_vec = jnp.cross(ao, e1)
    v = jnp.sum(d * v_vec, -1) * inv_det
    t = jnp.sum(e2 * v_vec, -1) * inv_det
    ok = ((jnp.abs(det) >= F32_EPSILON)
          & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > F32_EPSILON) & (t < max_t[:, None])
          & (inst >= 0)
          & (inst != exclude_instance[:, None])
          & ((include_instance[:, None] < 0)
             | (inst == include_instance[:, None])))
    tm = jnp.where(ok, t, F32_MAX)
    prim = jnp.argmin(tm, axis=1)
    onehot = (jnp.arange(E)[None, :] == prim[:, None]).astype(jnp.float32)
    t_best = jnp.min(tm, axis=1)
    miss = t_best >= F32_MAX
    uw = jnp.sum(onehot * u, axis=1)
    vw = jnp.sum(onehot * v, axis=1)
    a = onehot @ attrs  # [N, 17]: normals 0:9, uvs 9:15, inst 15, mat 16
    normal = (a[:, 0:3] + uw[:, None] * (a[:, 3:6] - a[:, 0:3])
              + vw[:, None] * (a[:, 6:9] - a[:, 0:3]))
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-10)
    uv = jnp.stack(
        [a[:, 9] + uw * (a[:, 11] - a[:, 9]) + vw * (a[:, 13] - a[:, 9]),
         a[:, 10] + uw * (a[:, 12] - a[:, 10]) + vw * (a[:, 14] - a[:, 10])],
        -1)
    tt = jnp.where(miss, 65535.0, t_best)  # DISTANCE_MAX (light.wgsl:23)
    pos = ro + rd * tt[:, None]
    return {
        "t": jnp.where(miss, F32_MAX, t_best),
        "prim": jnp.where(miss, -1, prim.astype(jnp.int32)),
        "instance": jnp.where(
            miss, -1, jnp.round(a[:, 15]).astype(jnp.int32)),
        "position": jnp.concatenate(
            [pos, jnp.where(miss, 0.0, 1.0)[:, None]], -1),
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "uv": jnp.where(miss[:, None], 0.0, uv),
        "material": jnp.where(
            miss, -1, jnp.round(a[:, 16]).astype(jnp.int32)),
    }


def _attach_probe(trace, use_pallas: bool, brute_force_max: int):
    """Fast light-probe engine: the probe ray is include-masked to one
    emissive instance (light.wgsl:672-683), so only emissive instances'
    triangles can win — stream scene["em_tri_pos_flat"] (tiny) instead of
    the whole scene."""

    def probe_info(scene, ro, rd, max_t, exclude_instance=None,
                   include_instance=None, shape2d=None, incoherent=False):
        del shape2d, incoherent  # probe tables are tiny; no culling needed
        n = ro.shape[0]
        if exclude_instance is None:
            exclude_instance = jnp.full((n,), -1, jnp.int32)
        if include_instance is None:
            include_instance = jnp.full((n,), -1, jnp.int32)
        em = scene.get("em_tri_pos_flat") if hasattr(scene, "get") else None
        if em is None:
            return trace.with_info(scene, ro, rd, max_t, exclude_instance,
                                   include_instance)
        if use_pallas and em.shape[0] <= brute_force_max:
            from hikari_tpu.ops.trace_pallas import pallas_brute_force_full

            return pallas_brute_force_full(em, scene["em_tri_attr"], ro, rd,
                                           max_t, exclude_instance,
                                           include_instance)
        if em.shape[0] <= 256:
            return _probe_all_pairs(em, scene["em_tri_attr"], ro, rd, max_t,
                                    exclude_instance, include_instance)
        return trace.with_info(scene, ro, rd, max_t, exclude_instance,
                               include_instance)

    trace.probe_info = probe_info


def _default_with_info(trace_fn):
    """hit + hit_info composition for engines without a fused variant."""

    def with_info(scene, ro, rd, max_t, exclude_instance=None,
                  include_instance=None, shape2d=None, incoherent=False):
        del shape2d, incoherent
        hit = trace_fn(scene, ro, rd, max_t, exclude_instance, include_instance)
        info = hit_info(scene, ro, rd, hit)
        info["t"] = hit["t"]
        info["prim"] = hit["prim"]
        return info

    return with_info


def make_tracer(num_triangles: int, brute_force_max: int = 768, tile: int = 512):
    """Pick the traversal engine at pipeline-build time (static specialization,
    the analog of the reference's pipeline keys).

    Small scenes: Pallas brute force on TPU (streams every triangle over a
    VMEM-resident ray tile), XLA scan elsewhere. Above ~700 triangles the
    tile-cull engine wins (measured crossover, tools/probe_crossover.py:
    brute8 scales ~0.035 ns/pair linearly; cull is ~10-18 ns/ray flat —
    equal at T~700 for 720p primaries). This study also retires the PERF.md
    MXU all-pairs design: its min-reduction epilogue is VPU-bound in the
    same class as the 8-packed loop, so the MXU matmuls cannot beat the
    cull engine's flat cost where brute force loses.
    """
    try:
        on_tpu = any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        on_tpu = False
    use_pallas = on_tpu and num_triangles <= brute_force_max

    if use_pallas:
        from hikari_tpu.ops.trace_pallas import (
            pallas_brute_force,
            pallas_brute_force_full,
            pallas_shadow,
        )

        def trace(scene, ro, rd, max_t, exclude_instance=None, include_instance=None,
                  early_distance=None, shape2d=None, incoherent=False):
            del early_distance, shape2d, incoherent  # order-independent
            n = ro.shape[0]
            if exclude_instance is None:
                exclude_instance = jnp.full((n,), -1, jnp.int32)
            if include_instance is None:
                include_instance = jnp.full((n,), -1, jnp.int32)
            return pallas_brute_force(scene["tri_pos_flat"], ro, rd, max_t,
                                      exclude_instance, include_instance)

        def with_info(scene, ro, rd, max_t, exclude_instance=None,
                      include_instance=None, shape2d=None, incoherent=False):
            del shape2d, incoherent
            n = ro.shape[0]
            if exclude_instance is None:
                exclude_instance = jnp.full((n,), -1, jnp.int32)
            if include_instance is None:
                include_instance = jnp.full((n,), -1, jnp.int32)
            # small tables: plain kernel + one-hot MXU attr resolve beats the
            # fused-attr kernel (extra in-loop interpolation ~doubles its
            # cost); the [N, P] one-hot only stays cheap for small P
            if scene["tri_attr"].shape[0] <= 256:
                h = pallas_brute_force(
                    scene["tri_pos_flat"], ro, rd, max_t, exclude_instance,
                    include_instance)
                info = hit_info_onehot(scene, ro, rd, h)
                info["t"] = h["t"]
                info["prim"] = h["prim"]
                return info
            return pallas_brute_force_full(
                scene["tri_pos_flat"], scene["tri_attr"], ro, rd, max_t,
                exclude_instance, include_instance)

        def shadow(scene, ro, rd, max_t, exclude_instance=None,
                   include_instance=None, early_distance=None, shape2d=None,
                   incoherent=False):
            del early_distance, shape2d, incoherent
            n = ro.shape[0]
            if exclude_instance is None:
                exclude_instance = jnp.full((n,), -1, jnp.int32)
            if include_instance is None:
                include_instance = jnp.full((n,), -1, jnp.int32)
            return pallas_shadow(scene["tri_pos_flat"], ro, rd, max_t,
                                 exclude_instance, include_instance)

        trace.with_info = with_info
        trace.shadow = shadow
        trace.kind = "brute_force_pallas"
    elif num_triangles <= brute_force_max:
        def trace(scene, ro, rd, max_t, exclude_instance=None, include_instance=None,
                  early_distance=None, shape2d=None, incoherent=False):
            del early_distance, shape2d, incoherent
            # bound the [rays x tile] intermediate to ~2^25 elements so big
            # resolutions don't exhaust HBM with scan temporaries
            n = ro.shape[0]
            t = max(8, min(tile, (1 << 25) // max(n, 1),
                           scene["tri_pos"].shape[0]))
            t = max(8, t - t % 8)
            return brute_force_intersect(
                scene, ro, rd, max_t, exclude_instance, include_instance,
                tile=t,
            )
        trace.with_info = _default_with_info(trace)
        trace.kind = "brute_force"
    elif on_tpu:
        # large scenes on TPU: tile-cull engine (ops/trace_cull.py) — dense
        # per-tile cluster culling + fixed-block Pallas intersection; no
        # per-ray gathers (measured ~100x the lockstep-BVH throughput)
        from hikari_tpu.ops.trace_cull import cull_trace

        def trace(scene, ro, rd, max_t, exclude_instance=None,
                  include_instance=None, early_distance=None, shape2d=None,
                  incoherent=False):
            del early_distance
            if "cl_tri_packed" not in scene:
                return traverse_bvh(scene, ro, rd, max_t, exclude_instance,
                                    include_instance)
            return cull_trace(scene, ro, rd, max_t, exclude_instance,
                              include_instance, mode="hit", shape2d=shape2d,
                              incoherent=incoherent)

        def with_info(scene, ro, rd, max_t, exclude_instance=None,
                      include_instance=None, shape2d=None, incoherent=False):
            if "cl_tri_packed" not in scene:
                f = _default_with_info(traverse_bvh)
                return f(scene, ro, rd, max_t, exclude_instance,
                         include_instance)
            return cull_trace(scene, ro, rd, max_t, exclude_instance,
                              include_instance, mode="full", shape2d=shape2d,
                              incoherent=incoherent)

        def shadow(scene, ro, rd, max_t, exclude_instance=None,
                   include_instance=None, early_distance=None, shape2d=None,
                   incoherent=False):
            del early_distance
            if "cl_tri_packed" not in scene:
                return traverse_bvh(scene, ro, rd, max_t, exclude_instance,
                                    include_instance)
            return cull_trace(scene, ro, rd, max_t, exclude_instance,
                              include_instance, mode="shadow",
                              shape2d=shape2d, incoherent=incoherent)

        trace.with_info = with_info
        trace.shadow = shadow
        trace.kind = "cull"
    else:
        def trace(scene, ro, rd, max_t, exclude_instance=None, include_instance=None,
                  early_distance=None, shape2d=None, incoherent=False):
            del shape2d, incoherent
            return traverse_bvh(scene, ro, rd, max_t, exclude_instance,
                                include_instance, early_distance)
        trace.with_info = _default_with_info(trace)
        trace.kind = "bvh"
    _attach_probe(trace, on_tpu, brute_force_max)
    return trace


def hit_info_onehot(scene, ro, rd, hit):
    """hit_info with the winner-attribute fetch as a one-hot matmul on the
    MXU instead of a table sweep: for small tables (P <= ~256) the
    [N, P] @ [P, 17] product beats both the 17-wide select sweep (~6.6 ms at
    1080p x 40 rows, tools/probe_channel.py s5) and the fused-attr Pallas
    kernel's extra in-loop work (~6 ms, s7 vs s2). Same contract as
    hit_info."""
    import jax

    DISTANCE_MAX = 65535.0
    attrs = scene["tri_attr"]
    P = attrs.shape[0]
    prim = jnp.maximum(hit["prim"], 0)
    miss = hit["instance"] < 0
    onehot = (prim[:, None] == jnp.arange(P, dtype=prim.dtype)[None, :])
    a = jax.lax.dot_general(
        onehot.astype(jnp.float32), attrs, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # [N, 17]
    u = hit["u"][:, None]
    v = hit["v"][:, None]
    n0, n1, n2 = a[:, 0:3], a[:, 3:6], a[:, 6:9]
    normal = n0 + u * (n1 - n0) + v * (n2 - n0)
    normal = normal * jax.lax.rsqrt(
        jnp.maximum(dot3(normal, normal), 1e-20))[:, None]
    uv0, uv1, uv2 = a[:, 9:11], a[:, 11:13], a[:, 13:15]
    uv_i = uv0 + u * (uv1 - uv0) + v * (uv2 - uv0)
    t = jnp.where(miss, DISTANCE_MAX, hit["t"])
    pos = ro + rd * t[:, None]
    position = jnp.concatenate(
        [pos, jnp.where(miss, 0.0, 1.0)[:, None]], axis=-1)
    material = jnp.where(miss, -1, jnp.round(a[:, 16]).astype(jnp.int32))
    return {
        "position": position,
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "uv": jnp.where(miss[:, None], 0.0, uv_i),
        "instance": hit["instance"],
        "material": material,
    }


def hit_info(scene, ro, rd, hit):
    """Interpolate hit attributes (light.wgsl:496-523 `hit_info`).

    Returns dict: position [N,4] (w=1 hit / 0 miss at DISTANCE_MAX), normal,
    uv, instance, material (-1 on miss). One packed-table lookup
    (utils.math.table_gather) serves all attributes.
    """
    from hikari_tpu.utils.math import table_gather

    DISTANCE_MAX = 65535.0
    prim = jnp.maximum(hit["prim"], 0)
    miss = hit["instance"] < 0
    attr = table_gather(scene["tri_attr"], prim)  # [N,17]
    nrm = attr[:, 0:9].reshape(-1, 3, 3)
    uv = attr[:, 9:15].reshape(-1, 3, 2)
    u = hit["u"][:, None]
    v = hit["v"][:, None]
    normal = nrm[:, 0] + u * (nrm[:, 1] - nrm[:, 0]) + v * (nrm[:, 2] - nrm[:, 0])
    normal = normal * jax.lax.rsqrt(jnp.maximum(dot3(normal, normal), 1e-20))[:, None]
    uv_i = uv[:, 0] + u * (uv[:, 1] - uv[:, 0]) + v * (uv[:, 2] - uv[:, 0])
    t = jnp.where(miss, DISTANCE_MAX, hit["t"])
    pos = ro + rd * t[:, None]
    position = jnp.concatenate([pos, jnp.where(miss, 0.0, 1.0)[:, None]], axis=-1)
    material = jnp.where(miss, -1, jnp.round(attr[:, 16]).astype(jnp.int32))
    return {
        "position": position,
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "uv": jnp.where(miss[:, None], 0.0, uv_i),
        "instance": hit["instance"],
        "material": material,
    }
