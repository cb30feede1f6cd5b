"""BVH builder invariants + traversal-vs-brute-force oracle.

Mirrors SURVEY.md §4 test plan item 1 (BVH flatten invariants with CPU
oracles)."""

import numpy as np
import pytest

from hikari_tpu.models.bvh import BVH_LEAF_FLAG, build_bvh, refit_bvh


def random_aabbs(rng, n, scale=10.0):
    lo = rng.uniform(-scale, scale, (n, 3))
    ext = rng.uniform(0.01, 1.0, (n, 3))
    return lo, lo + ext


def walk_preorder(bvh):
    """Reconstruct DFS order via entry/exit and check consistency."""
    n_nodes = bvh.count
    visited = np.zeros(n_nodes, bool)
    leaves = []

    def visit(i):
        stack = [i]
        while stack:
            i = stack.pop()
            if i >= n_nodes:
                continue
            assert not visited[i]
            visited[i] = True
            entry = bvh.entry[i]
            if entry >= BVH_LEAF_FLAG:
                leaves.append(entry - BVH_LEAF_FLAG)
                nxt = bvh.exit[i]
                if nxt < n_nodes and not visited[nxt]:
                    stack.append(nxt)
            else:
                stack.append(entry)

    visit(0)
    return visited, leaves


@pytest.mark.parametrize("n", [1, 2, 3, 7, 100, 1000])
def test_bvh_structure(rng, n):
    lo, hi = random_aabbs(rng, n)
    bvh = build_bvh(lo, hi)
    assert bvh.count == 2 * n - 1
    # Every primitive appears exactly once as a leaf.
    leaf_mask = bvh.entry >= BVH_LEAF_FLAG
    assert leaf_mask.sum() == n
    prims = np.sort(bvh.entry[leaf_mask] - BVH_LEAF_FLAG)
    assert np.array_equal(prims, np.arange(n))
    # exit pointers are strictly forward and <= count
    assert (bvh.exit > np.arange(bvh.count)).all()
    assert (bvh.exit <= bvh.count).all()
    # inner entry is the next node (pre-order child)
    inner = ~leaf_mask
    assert np.array_equal(bvh.entry[inner], np.arange(bvh.count)[inner] + 1)


@pytest.mark.parametrize("n", [2, 10, 257])
def test_bvh_aabbs_contain_children(rng, n):
    lo, hi = random_aabbs(rng, n)
    bvh = build_bvh(lo, hi)
    leaf_mask = bvh.entry >= BVH_LEAF_FLAG
    prims = bvh.entry[leaf_mask] - BVH_LEAF_FLAG
    assert np.allclose(bvh.node_min[leaf_mask], lo[prims].astype(np.float32))
    assert np.allclose(bvh.node_max[leaf_mask], hi[prims].astype(np.float32))
    # every node bounds the primitives in its subtree range
    for i in range(bvh.count):
        f, l = bvh.first[i], bvh.last[i]
        sel = bvh.prim_order[f : l + 1]
        assert (bvh.node_min[i] <= lo[sel].min(0) + 1e-5).all()
        assert (bvh.node_max[i] >= hi[sel].max(0) - 1e-5).all()


def test_bvh_traversal_matches_brute_force(rng):
    n = 200
    lo, hi = random_aabbs(rng, n, scale=5.0)
    centers = 0.5 * (lo + hi)
    bvh = build_bvh(lo, hi)

    # "intersect" = point containment; walk entry/exit and collect leaf hits
    for _ in range(20):
        p = rng.uniform(-5, 5, 3)
        expected = set(np.nonzero(((p >= lo) & (p <= hi)).all(1))[0])
        found = set()
        idx = 0
        steps = 0
        while idx < bvh.count:
            steps += 1
            assert steps < 10 * bvh.count
            entry = bvh.entry[idx]
            if entry >= BVH_LEAF_FLAG:
                prim = entry - BVH_LEAF_FLAG
                if ((p >= lo[prim]) & (p <= hi[prim])).all():
                    found.add(int(prim))
                idx = bvh.exit[idx]
            else:
                inside = ((p >= bvh.node_min[idx]) & (p <= bvh.node_max[idx])).all()
                idx = entry if inside else bvh.exit[idx]
        assert found == expected


def test_refit(rng):
    n = 64
    lo, hi = random_aabbs(rng, n)
    bvh = build_bvh(lo, hi)
    lo2 = lo + rng.uniform(-0.5, 0.5, (n, 3))
    hi2 = lo2 + (hi - lo)
    bvh2 = refit_bvh(bvh, lo2, hi2)
    for i in range(bvh2.count):
        sel = bvh2.prim_order[bvh2.first[i] : bvh2.last[i] + 1]
        assert (bvh2.node_min[i] <= lo2[sel].min(0).astype(np.float32) + 1e-5).all()
        assert (bvh2.node_max[i] >= hi2[sel].max(0).astype(np.float32) - 1e-5).all()
