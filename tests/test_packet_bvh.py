"""Packet-BVH collapse: structure invariants + reachability vs brute force."""

import numpy as np

from hikari_tpu.models.bvh import build_bvh
from hikari_tpu.models.packet_bvh import collapse_bvh, reference_traverse


def random_tris(rng, p):
    v0 = rng.uniform(-5, 5, (p, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.5, 0.5, (p, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.5, 0.5, (p, 3)).astype(np.float32)
    tri = np.stack([v0, v1, v2], axis=1)
    return tri, tri.min(axis=1), tri.max(axis=1)


def test_collapse_invariants(rng):
    tri, amin, amax = random_tris(rng, 333)
    bvh = build_bvh(amin, amax)
    for k in (1, 4, 8, 16):
        pb = collapse_bvh(bvh, max_leaf=k)
        nodes = pb.nodes
        is_leaf = nodes[:, 6] > 0.5
        counts = nodes[is_leaf, 9].astype(int)
        starts = nodes[is_leaf, 7].astype(int)
        assert (counts >= 1).all() and (counts <= k).all()
        # every sorted slot appears in exactly one leaf range
        slots = np.concatenate([np.arange(s, s + c)
                                for s, c in zip(starts, counts)])
        assert sorted(slots.tolist()) == list(range(333))
        # pointers in range and acyclic in preorder (exit strictly greater)
        m = len(nodes)
        assert (nodes[:, 8] <= m).all()
        entry = nodes[~is_leaf, 7].astype(int)
        assert (entry == np.nonzero(~is_leaf)[0] + 1).all()
        assert (nodes[:, 8] > np.arange(m)).all()
    # k=1 keeps the binary tree node count
    assert collapse_bvh(bvh, max_leaf=1).count == bvh.count


def test_collapse_preserves_reachability(rng):
    """Every primitive the ray actually hits must be inside a visited
    leaf range (compared against exhaustive AABB intersection)."""
    tri, amin, amax = random_tris(rng, 257)
    bvh = build_bvh(amin, amax)
    pb = collapse_bvh(bvh, max_leaf=8)
    slot_of_prim = np.argsort(pb.prim_order)

    inv_rays = 0
    for i in range(40):
        ro = rng.uniform(-8, 8, 3).astype(np.float32)
        rd = rng.normal(size=3).astype(np.float32)
        rd /= np.linalg.norm(rd)
        visited = set(reference_traverse(pb, amin, amax, ro, rd))
        # brute-force: which prim AABBs does the ray hit?
        inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)
        t1 = (amin - ro) * inv
        t2 = (amax - ro) * inv
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        hit = (tmax >= tmin) & (tmax >= 0)
        for p in np.nonzero(hit)[0]:
            assert int(slot_of_prim[p]) in visited, (i, p)
        inv_rays += int(hit.sum())
    assert inv_rays > 0
