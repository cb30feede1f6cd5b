"""Next-event-estimation light candidate selection (light.wgsl:599-708).

Per pixel: (1) sample the solar cone of the single directional light;
(2) walk the emissive light BVH, reservoir-picking uniformly among emissives
whose bounding sphere AABB contains the shading point; (3) pick one of the
chosen emitter's triangles via its alias table, sample a barycentric point,
and probe-trace a ray restricted to that emitter to find the actual surface
point and the area-to-solid-angle pdf. Occluded/backfacing picks fall back to
the directional candidate.

The BVH containment walk runs lockstep over all pixels (one shared
while_loop), like ops.trace.traverse_bvh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.utils.math import (
    F32_MAX,
    GOLDEN_RATIO,
    apply_normal_basis,
    dot3,
    normalize,
    sample_uniform_cone,
    sample_uniform_triangle_barycentric,
)

RAY_BIAS = 0.02
DISTANCE_MAX = 65535.0


def empty_hit_info(position, direction):
    """light.wgsl:488-494."""
    n = position.shape[0]
    pos = position + direction * DISTANCE_MAX
    return {
        "position": jnp.concatenate([pos, jnp.zeros((n, 1))], -1),
        "normal": jnp.zeros((n, 3)),
        "uv": jnp.zeros((n, 2)),
        "instance": jnp.full((n,), -1, jnp.int32),
        "material": jnp.full((n,), -1, jnp.int32),
    }


SMALL_EMISSIVE_MAX = 8


def _walk_emissive_unrolled(scene, position, rand_x, exclude_instance):
    """Small-E specialization of the emissive-BVH walk: visit every leaf in
    DFS order (em_leaf_order). Identical result to the walk — interior-node
    culling only skips leaves whose sphere-AABB test would fail anyway (leaf
    AABBs nest inside interior AABBs) — but with zero per-lane gathers and
    no while_loop."""
    em_packed = scene["em_packed"]
    order = scene["em_leaf_order"]
    n = position.shape[0]
    picked = jnp.full((n,), -1, jnp.int32)
    count = jnp.zeros((n,), jnp.float32)
    rand_1d = rand_x
    for k in range(em_packed.shape[0]):
        em_idx = order[k]  # scalar (traced), not per-lane
        em_row = jax.lax.dynamic_index_in_dim(em_packed, em_idx,
                                              keepdims=False)
        c = em_row[4:7]
        r = em_row[7]
        inside = jnp.all((position > c - r) & (position < c + r), axis=-1)
        inst = jnp.round(em_row[8]).astype(jnp.int32)
        take_leaf = inside & (inst != exclude_instance)
        new_rand = jnp.mod(rand_1d + GOLDEN_RATIO, 1.0)
        rand_1d = jnp.where(take_leaf, new_rand, rand_1d)
        count = jnp.where(take_leaf, count + 1.0, count)
        take = take_leaf & (rand_1d < 1.0 / jnp.maximum(count, 1.0))
        picked = jnp.where(take, em_idx, picked)
    return picked, count


def walk_emissive_bvh(scene, position, rand_x, exclude_instance):
    """Streaming uniform pick among emissives containing `position`
    (light.wgsl:624-657). Returns (picked emissive idx [-1 none], count)."""
    from hikari_tpu.utils.math import table_gather

    if (scene["em_packed"].shape[0] <= SMALL_EMISSIVE_MAX
            and "em_leaf_order" in scene):
        return _walk_emissive_unrolled(scene, position, rand_x,
                                       exclude_instance)

    n = position.shape[0]
    node_count = scene["em_bvh_packed"].shape[0]
    nodes = scene["em_bvh_packed"]
    em_packed = scene["em_packed"]  # rgba 0:4, pos 4:7, radius 7, inst 8,
    #                                 alias off 9, alias count 10, area 11

    def cond(state):
        return jnp.any(state[0] < node_count)

    def body(state):
        idx, picked, count, rand_1d = state
        safe = jnp.minimum(idx, node_count - 1)
        node = table_gather(nodes, safe)
        active = idx < node_count
        is_leaf = node[:, 6] > 0.5
        em_idx = jnp.where(is_leaf, jnp.round(node[:, 7]).astype(jnp.int32), 0)
        exit_ = jnp.round(node[:, 8]).astype(jnp.int32)

        em_row = table_gather(em_packed, em_idx)
        # leaf AABB = emitter sphere bounds (instance.rs:405-409)
        c = em_row[:, 4:7]
        r = em_row[:, 7:8]
        lo = jnp.where(is_leaf[:, None], c - r, node[:, 0:3])
        hi = jnp.where(is_leaf[:, None], c + r, node[:, 3:6])
        inside = jnp.all((position > lo) & (position < hi), axis=-1)

        em_instance_i = jnp.round(em_row[:, 8]).astype(jnp.int32)
        take_leaf = active & is_leaf & inside & (em_instance_i != exclude_instance)
        new_rand = jnp.mod(rand_1d + GOLDEN_RATIO, 1.0)
        rand_1d = jnp.where(take_leaf, new_rand, rand_1d)
        count = jnp.where(take_leaf, count + 1.0, count)
        take = take_leaf & (rand_1d < 1.0 / jnp.maximum(count, 1.0))
        picked = jnp.where(take, em_idx, picked)

        entry_idx = jnp.round(node[:, 7]).astype(jnp.int32)
        next_idx = jnp.where(is_leaf, exit_,
                             jnp.where(inside, entry_idx, exit_))
        idx = jnp.where(active, next_idx, idx)
        return idx, picked, count, rand_1d

    state = (
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        rand_x,
    )
    _, picked, count, _ = jax.lax.while_loop(cond, body, state)
    return picked, count


def select_light_candidate(scene, tracer, rand4, position, normal,
                           exclude_instance, solar_angle,
                           sample_emissive: bool):
    """Returns (candidate, info).

    candidate: {direction [N,3], p [N], max_distance, min_distance,
    emissive_instance [N] (-1 == directional)}. info: hit-info dict for the
    sampled light point (used by input_radiance after the shadow trace).

    `sample_emissive=False` reproduces the direct channel's
    instance == DONT_SAMPLE_EMISSIVE early-out (light.wgsl:619-621).
    """
    n = position.shape[0]
    cone_dir = jnp.broadcast_to(scene["dir_to_light"], (n, 3))
    cos_solar = jnp.cos(solar_angle)
    local_dir, _pdf = sample_uniform_cone(rand4[:, 2:4], cos_solar)
    rand_direction = apply_normal_basis(cone_dir, local_dir)

    candidate = {
        "direction": rand_direction,
        "p": jnp.ones((n,)),
        "max_distance": jnp.full((n,), F32_MAX),
        "min_distance": jnp.full((n,), DISTANCE_MAX),
        "emissive_instance": jnp.full((n,), -1, jnp.int32),
    }
    info = empty_hit_info(position, rand_direction)

    if not sample_emissive:
        return candidate, info

    from hikari_tpu.utils.math import table_gather

    picked, count = walk_emissive_bvh(scene, position, rand4[:, 0], exclude_instance)
    has_pick = picked >= 0
    em = jnp.maximum(picked, 0)
    em_row = table_gather(scene["em_packed"], em)

    # alias-table triangle pick (light.wgsl:662-669)
    a_count_f = em_row[:, 10]
    a_count = jnp.round(a_count_f).astype(jnp.int32)
    a_offset = jnp.round(em_row[:, 9]).astype(jnp.int32)
    alias_index = jnp.minimum(
        (rand4[:, 0] * a_count_f).astype(jnp.int32),
        jnp.maximum(a_count - 1, 0),
    )
    slot = a_offset + alias_index
    alias_row = table_gather(scene["alias_packed"], slot)
    take_alias = rand4[:, 1] < alias_row[:, 0]
    prim_local = jnp.where(take_alias,
                           jnp.round(alias_row[:, 1]).astype(jnp.int32),
                           alias_index)
    em_inst = jnp.round(em_row[:, 8]).astype(jnp.int32)
    # gather the sampled triangle's vertices from the emissive-only table
    # when available (tiny sweep) instead of the full scene table
    em_table = scene.get("em_tri_pos_flat") if hasattr(scene, "get") else None
    if em_table is not None and "em_inst_tri_offset_f" in scene:
        em_prim = (jnp.round(
            table_gather(scene["em_inst_tri_offset_f"], em_inst))
            .astype(jnp.int32) + prim_local)
        v = table_gather(em_table, em_prim)[:, :9].reshape(-1, 3, 3)
    else:
        prim = (jnp.round(table_gather(scene["inst_prim_offset_f"], em_inst))
                .astype(jnp.int32) + prim_local)
        v = table_gather(scene["tri_pos_flat"], prim)[:, :9].reshape(-1, 3, 3)
    b = sample_uniform_triangle_barycentric(rand4[:, 2:4])
    p = (b[:, 0:1] * v[:, 0] + b[:, 1:2] * v[:, 1]
         + (1.0 - b[:, 0:1] - b[:, 1:2]) * v[:, 2])

    ro = position + normal * RAY_BIAS
    rd = normalize(p - position)

    # include-masked to the sampled emitter, so the probe engine streams the
    # emissive-only triangle table (ops/trace.py _attach_probe) — identical
    # result, ~10x fewer triangles for typical scenes
    probe_trace = getattr(tracer, "probe_info", tracer.with_info)
    pinfo = probe_trace(scene, ro, rd, jnp.full((n,), F32_MAX),
                        None, jnp.where(has_pick, em_inst, jnp.int32(-2)))
    probe = pinfo
    probe_ok = has_pick & (dot3(rd, normal) > 0.0) & (probe["instance"] >= 0)

    delta = pinfo["position"][:, :3] - position
    d2 = dot3(delta, delta)
    denom = jnp.abs(dot3(rd, pinfo["normal"]) * em_row[:, 11])
    p_em = d2 / jnp.maximum(denom, 1e-20) / jnp.maximum(count, 1.0)

    sel = probe_ok
    sel3 = sel[:, None]
    candidate = {
        "direction": jnp.where(sel3, rd, rand_direction),
        "p": jnp.where(sel, p_em, 1.0),
        "max_distance": jnp.where(sel, probe["t"], F32_MAX),
        "min_distance": jnp.where(sel, probe["t"] - 0.1, DISTANCE_MAX),
        "emissive_instance": jnp.where(sel, em_inst, jnp.int32(-1)),
    }
    # on probe failure, fall back to the *probe ray origin* empty info
    # (light.wgsl:697-704 uses ray.origin there)
    fallback = empty_hit_info(jnp.where(sel3, position, ro), rand_direction)
    info = {
        k: jnp.where(sel3 if pinfo[k].ndim == 2 else sel, pinfo[k], fallback[k])
        for k in fallback
    }
    return candidate, info


def occlude_hit_info(ro, rd, shadow_hit, info):
    """Overwrite info where the shadow ray hit an occluder
    (light.wgsl:526-533)."""
    occluded = shadow_hit["instance"] >= 0
    o3 = occluded[:, None]
    pos = ro + rd * shadow_hit["t"][:, None]
    pos4 = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], -1)
    return {
        "position": jnp.where(o3, pos4, info["position"]),
        "normal": jnp.where(o3, 0.0, info["normal"]),
        "uv": info["uv"],
        "instance": jnp.where(occluded, shadow_hit["instance"], info["instance"]),
        "material": jnp.where(occluded, -1, info["material"]),
    }
