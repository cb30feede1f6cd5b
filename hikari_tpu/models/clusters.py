"""Cluster tables for the tile-cull trace engine (ops/trace_cull.py).

The reference traverses a per-thread stackless BVH on the GPU
(light.wgsl:400-486). On TPU, per-ray node gathers cost ~30 ns each (the
measured XLA row-gather floor), ~100x the cost of one dense ray-triangle
test (~0.05 ns/pair in the 8-packed Pallas intersector) — so the TPU-native
large-scene design replaces per-ray traversal with:

  1. HOST (this module): collapse the LBVH into spatial *clusters* of
     <= `cluster_size` triangles. Cluster triangle ranges are contiguous in
     Morton-sorted primitive order (models/packet_bvh.py), so each cluster
     is a fixed-size padded block in one flat table.
  2. DEVICE phase 1 (XLA): conservative interval slab test of every ray
     TILE's bounds against every cluster AABB -> per-tile cluster list.
  3. DEVICE phase 2 (Pallas): per ray tile, DMA the listed clusters'
     fixed-size blocks HBM->VMEM and intersect densely.

Table layout: 8 triangles per 128-lane row (16 f32 fields each) so every
DMA slice is lane-aligned (Mosaic requires 128-aligned slices of VMEM/HBM
buffers). Fields per triangle:
  pos row:  v0(3) v1(3) v2(3) instance(1) prim_id(1) pad(5)
  attr row: n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) material(1)
"""

from __future__ import annotations

import numpy as np

from hikari_tpu.models.packet_bvh import collapse_bvh

CLUSTER_SIZE = 64  # triangles per cluster block (8 packed rows)


def build_cluster_tables(bvh, tri_pos_flat: np.ndarray, tri_attr: np.ndarray,
                         cluster_size: int = CLUSTER_SIZE) -> dict:
    """Returns arrays for the cull engine:

    cl_tri_packed  [C*cluster_size/8, 128] f32 — 8-packed pos rows
    cl_attr_packed [C*cluster_size/8, 128] f32 — 8-packed attr rows
    cl_aabb        [Cpad, 8] f32 — min(3) max(3) pad(2); padding rows are
                   inverted AABBs, rejected by cull_phase's explicit
                   min<=max check (the interval slab test alone would
                   let them survive at enter t=0)
    cl_count       int — real cluster count C
    """
    assert cluster_size % 8 == 0
    pb = collapse_bvh(bvh, max_leaf=cluster_size)
    nodes = pb.nodes
    leaf = nodes[:, 6] > 0.5
    starts = nodes[leaf, 7].astype(np.int64)   # into SORTED prim space
    counts = nodes[leaf, 9].astype(np.int64)
    aabb_min = nodes[leaf, 0:3]
    aabb_max = nodes[leaf, 3:6]
    c = len(starts)

    # padded per-cluster triangle blocks in sorted order; the table is
    # padded to the same cpad block count as cl_aabb so the kernel's
    # overflow sweep (all clusters) never DMAs out of bounds
    cpad = max(8, -(-c // 8) * 8)
    rows = cpad * cluster_size
    pos = np.zeros((rows, 16), np.float32)
    pos[:, 9] = -1.0  # padding: instance -1 never intersects
    attr = np.zeros((rows, 16), np.float32)
    # destination rows for every sorted primitive
    cluster_of = np.repeat(np.arange(c), counts)
    within = np.arange(len(cluster_of)) - np.repeat(
        np.cumsum(counts) - counts, counts)
    dst = cluster_of * cluster_size + within
    src_sorted = np.concatenate(
        [np.arange(s, s + n) for s, n in zip(starts, counts)]
    ) if c else np.zeros(0, np.int64)
    gpid = pb.prim_order[src_sorted]           # original primitive ids
    pos[dst, 0:9] = tri_pos_flat[gpid, 0:9]
    pos[dst, 9] = tri_pos_flat[gpid, 9]        # instance
    pos[dst, 10] = gpid.astype(np.float32)     # original prim id
    attr[dst, 0:9] = tri_attr[gpid, 0:9]       # vertex normals
    attr[dst, 9:15] = tri_attr[gpid, 9:15]     # vertex uvs
    attr[dst, 15] = tri_attr[gpid, 16]         # material id

    aabb = np.zeros((cpad, 8), np.float32)
    aabb[:, 0:3] = 1e30   # inverted: never hit
    aabb[:, 3:6] = -1e30
    aabb[:c, 0:3] = aabb_min
    aabb[:c, 3:6] = aabb_max
    # stash each cluster's AABB in its block's padding lanes (triangle slot
    # 0 cols 11-13 = min, slot 1 cols 11-13 = max) so the kernel can run a
    # per-ray slab pre-test without a separate table
    blocks = pos.reshape(cpad, cluster_size * 16)
    blocks[:, 11:14] = aabb[:, 0:3]
    blocks[:, 16 + 11:16 + 14] = aabb[:, 3:6]
    # no scalar entries: consumers derive the (static) cluster size from
    # the table shapes — 8 * (tri rows / aabb rows) — so the whole dict can
    # ride the jit pytree
    return {
        "cl_tri_packed": pos.reshape(rows // 8, 128),
        "cl_attr_packed": attr.reshape(rows // 8, 128),
        "cl_aabb": aabb,
    }
