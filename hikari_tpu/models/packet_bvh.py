"""Packet-traversal BVH: collapse the binary LBVH into ranged leaves.

Consumed by the tile-cull engine (models/clusters.py -> ops/trace_cull.py):
collapsing every binary subtree with <= max_leaf primitives into ONE leaf
holding a contiguous primitive range (contiguous because the flatten orders
leaves in DFS order — models/bvh.py `prim_order`) yields the fixed-size
Morton-ordered spatial clusters the cull phase tests as units.

Node row layout [N, 10] f32 (padded to 16 for the VMEM table):
    min(3), max(3), is_leaf, payload, exit, count
    payload = leaf: START index into the SORTED triangle table
              inner: entry (next preorder node)
    count   = leaf: number of primitives (<= max_leaf)

Reference traversal semantics preserved (light.wgsl:400-440); only the
leaf granularity changes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hikari_tpu.models.bvh import BVH_LEAF_FLAG, Bvh


@dataclasses.dataclass
class PacketBvh:
    nodes: np.ndarray       # [M, 10] f32 packed rows (see module docstring)
    prim_order: np.ndarray  # [P] i64: sorted slot -> original primitive id
    max_leaf: int

    @property
    def count(self) -> int:
        return len(self.nodes)


def collapse_bvh(bvh: Bvh, max_leaf: int = 8) -> PacketBvh:
    """Vectorized collapse: mark topmost subtrees with <= max_leaf prims as
    ranged leaves, drop their descendants, remap entry/exit pointers."""
    n = bvh.count
    size = bvh.last - bvh.first + 1  # prims under each node
    collapsible = size <= max_leaf

    # parent array: preorder flatten puts the left child at i+1 and the
    # right child at exit[left] (the left subtree's skip pointer)
    is_inner = bvh.entry < BVH_LEAF_FLAG
    parent = np.full(n, -1, np.int64)
    inner_idx = np.nonzero(is_inner)[0]
    c1 = inner_idx + 1
    c2 = bvh.exit[c1].astype(np.int64)
    parent[c1] = inner_idx
    ok2 = c2 < n
    parent[c2[ok2]] = inner_idx[ok2]

    has_parent = parent >= 0
    parent_collapsible = np.zeros(n, bool)
    parent_collapsible[has_parent] = collapsible[parent[has_parent]]
    topmost = collapsible & ~parent_collapsible

    # descendants of a topmost node occupy preorder slots
    # [t+1, t + 2*size[t] - 1) (binary subtree with L leaves has 2L-1 nodes)
    cover = np.zeros(n + 1, np.int64)
    t_idx = np.nonzero(topmost)[0]
    span_end = t_idx + 2 * size[t_idx] - 1
    np.add.at(cover, t_idx + 1, 1)
    np.add.at(cover, np.minimum(span_end, n), -1)
    covered = np.cumsum(cover[:-1]) > 0
    keep = ~covered

    new_idx = np.cumsum(keep) - 1
    m = int(keep.sum())
    idx_map = np.concatenate([new_idx, [m]])  # old index (or n) -> new

    k = np.nonzero(keep)[0]
    is_leaf_new = topmost[k] | (~is_inner[k])
    # leaf payload: start slot in SORTED prim space; inner payload: entry
    old_leaf_prim_start = bvh.first[k]  # sorted slot of first prim
    inner_entry = idx_map[np.minimum(bvh.entry[k].astype(np.int64), n)]
    payload = np.where(is_leaf_new, old_leaf_prim_start, inner_entry)
    exit_new = idx_map[np.minimum(bvh.exit[k].astype(np.int64), n)]
    count_new = np.where(is_leaf_new, size[k], 0)

    nodes = np.concatenate([
        bvh.node_min[k], bvh.node_max[k],
        is_leaf_new.astype(np.float32)[:, None],
        payload.astype(np.float32)[:, None],
        exit_new.astype(np.float32)[:, None],
        count_new.astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    return PacketBvh(nodes=nodes, prim_order=bvh.prim_order.copy(),
                     max_leaf=max_leaf)


def reference_traverse(pb: PacketBvh, tri_min: np.ndarray, tri_max: np.ndarray,
                       ro: np.ndarray, rd: np.ndarray):
    """Slow single-ray oracle over the collapsed tree: returns the list of
    SORTED primitive slots whose leaf AABB the ray enters (superset of true
    hits). Used by tests to check the collapse preserves reachability."""
    inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)
    out = []
    i = 0
    n = pb.count
    while i < n:
        row = pb.nodes[i]
        t1 = (row[0:3] - ro) * inv
        t2 = (row[3:6] - ro) * inv
        tmin = np.minimum(t1, t2).max()
        tmax = np.maximum(t1, t2).min()
        hit = (tmax >= tmin) and (tmax >= 0)
        if row[6] > 0.5:  # leaf
            if hit:
                start, cnt = int(row[7]), int(row[9])
                out.extend(range(start, start + cnt))
            i = int(row[8])
        else:
            i = int(row[7]) if hit else int(row[8])
    return out
