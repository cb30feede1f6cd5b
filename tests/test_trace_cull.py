"""Tile-cull trace engine vs the brute-force oracle (CPU interpret mode).

The cull engine (ops/trace_cull.py) must reproduce the exact hit contract of
ops/trace.py (light.wgsl:364-398 Möller-Trumbore + exclude/include masks of
light.wgsl:459,682-687) for ANY ray set — coherence only affects speed.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hikari_tpu.models.bvh import build_bvh
from hikari_tpu.models.clusters import build_cluster_tables
from hikari_tpu.ops.trace import brute_force_intersect, hit_info
from hikari_tpu.ops.trace_cull import cull_trace, cull_phase, _prep_rays

F32_MAX = 3.402823466e38


def _soup(rng, p, spread=10.0, size=0.6, instances=4):
    base = rng.uniform(0, spread, (p, 3)).astype(np.float32)
    v1 = base + rng.uniform(-size, size, (p, 3)).astype(np.float32)
    v2 = base + rng.uniform(-size, size, (p, 3)).astype(np.float32)
    tri_pos = np.stack([base, v1, v2], axis=1)
    inst = rng.integers(0, instances, p).astype(np.int32)
    tri_pos_flat = np.concatenate(
        [tri_pos.reshape(p, 9), inst.astype(np.float32)[:, None]], axis=1)
    nrm = rng.normal(size=(p, 9)).astype(np.float32)
    uv = rng.uniform(0, 1, (p, 6)).astype(np.float32)
    mat = rng.integers(0, 3, p).astype(np.float32)
    tri_attr = np.concatenate(
        [nrm, uv, inst.astype(np.float32)[:, None], mat[:, None]], axis=1)
    return tri_pos, tri_pos_flat.astype(np.float32), tri_attr.astype(np.float32), inst


def _scene(tri_pos, tri_pos_flat, tri_attr, cluster=16):
    bvh = build_bvh(tri_pos.min(axis=1), tri_pos.max(axis=1))
    cl = build_cluster_tables(bvh, tri_pos_flat, tri_attr,
                              cluster_size=cluster)
    return {
        "cl_tri_packed": jnp.asarray(cl["cl_tri_packed"]),
        "cl_attr_packed": jnp.asarray(cl["cl_attr_packed"]),
        "cl_aabb": jnp.asarray(cl["cl_aabb"]),
        # oracle tables
        "tri_pos": jnp.asarray(tri_pos),
        "tri_instance": jnp.asarray(
            np.round(tri_pos_flat[:, 9]).astype(np.int32)),
        "tri_pos_flat": jnp.asarray(tri_pos_flat),
        "tri_attr": jnp.asarray(tri_attr),
    }


def _rays(rng, n, spread=10.0):
    ro = rng.uniform(-2, spread + 2, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _check_hits(got, want, n, atol=1e-3):
    gi = np.asarray(got["instance"])
    wi = np.asarray(want["instance"])
    # ties between coincident triangles may resolve differently; compare t
    gt = np.where(gi >= 0, np.asarray(got["t"]), np.inf)
    wt = np.where(wi >= 0, np.asarray(want["t"]), np.inf)
    both_miss = (gi < 0) & (wi < 0)
    close = np.isclose(gt, wt, rtol=1e-4, atol=atol)
    assert np.mean(both_miss | close) > 0.999, (
        f"{np.sum(~(both_miss | close))} of {n} rays disagree")
    hit = ~both_miss & close
    same_prim = np.asarray(got["prim"])[hit] == np.asarray(want["prim"])[hit]
    assert np.mean(same_prim) > 0.995


def test_hit_matches_brute_force():
    rng = np.random.default_rng(1)
    tri_pos, tpf, tattr, _ = _soup(rng, 700)
    scene = _scene(tri_pos, tpf, tattr)
    ro, rd = _rays(rng, 2500)
    mt = jnp.full((2500,), F32_MAX)
    got = cull_trace(scene, ro, rd, mt, mode="hit", interpret=True)
    want = brute_force_intersect(scene, ro, rd, mt)
    _check_hits(got, want, 2500)
    # u/v parity on agreeing prims
    agree = (np.asarray(got["prim"]) == np.asarray(want["prim"])) & (
        np.asarray(got["instance"]) >= 0)
    assert np.allclose(np.asarray(got["u"])[agree],
                       np.asarray(want["u"])[agree], atol=1e-3)


def test_full_matches_hit_info():
    rng = np.random.default_rng(2)
    tri_pos, tpf, tattr, _ = _soup(rng, 300)
    scene = _scene(tri_pos, tpf, tattr)
    ro, rd = _rays(rng, 1100)
    mt = jnp.full((1100,), F32_MAX)
    got = cull_trace(scene, ro, rd, mt, mode="full", interpret=True)
    hit = brute_force_intersect(scene, ro, rd, mt)
    want = hit_info(scene, ro, rd, hit)
    agree = (np.asarray(got["prim"]) == np.asarray(hit["prim"]))
    assert agree.mean() > 0.995
    for k in ("position", "normal", "uv"):
        assert np.allclose(np.asarray(got[k])[agree],
                           np.asarray(want[k])[agree], atol=2e-2), k
    assert (np.asarray(got["material"])[agree]
            == np.asarray(want["material"])[agree]).all()


def test_exclude_include_and_max_t():
    rng = np.random.default_rng(3)
    tri_pos, tpf, tattr, inst = _soup(rng, 400)
    scene = _scene(tri_pos, tpf, tattr)
    n = 1024
    ro, rd = _rays(rng, n)
    mt = jnp.asarray(rng.uniform(1.0, 20.0, n).astype(np.float32))
    ex = jnp.asarray(rng.integers(-1, 4, n).astype(np.int32))
    inc = jnp.asarray(rng.integers(-1, 4, n).astype(np.int32))
    got = cull_trace(scene, ro, rd, mt, exclude_instance=ex,
                     include_instance=inc, mode="hit", interpret=True)
    want = brute_force_intersect(scene, ro, rd, mt, exclude_instance=ex,
                                 include_instance=inc)
    _check_hits(got, want, n)


def test_shadow_matches():
    rng = np.random.default_rng(4)
    tri_pos, tpf, tattr, _ = _soup(rng, 500)
    scene = _scene(tri_pos, tpf, tattr)
    n = 2048
    ro, rd = _rays(rng, n)
    mt = jnp.full((n,), 30.0)
    got = cull_trace(scene, ro, rd, mt, mode="shadow", interpret=True)
    want = brute_force_intersect(scene, ro, rd, mt)
    gi = np.asarray(got["instance"])
    wi = np.asarray(want["instance"])
    assert np.mean((gi >= 0) == (wi >= 0)) > 0.999
    hit = (gi >= 0) & (wi >= 0)
    assert np.allclose(np.asarray(got["t"])[hit], np.asarray(want["t"])[hit],
                       rtol=1e-3, atol=1e-3)


def test_overflow_sweeps_all_clusters():
    """cap smaller than the surviving count -> count sentinel -1 -> kernel
    sweeps every cluster; result must stay exact."""
    rng = np.random.default_rng(5)
    tri_pos, tpf, tattr, _ = _soup(rng, 600, spread=2.0)  # dense: no culling
    scene = _scene(tri_pos, tpf, tattr)
    n = 1024
    ro, rd = _rays(rng, n, spread=2.0)
    mt = jnp.full((n,), F32_MAX)
    got = cull_trace(scene, ro, rd, mt, mode="hit", cap=8, interpret=True)
    want = brute_force_intersect(scene, ro, rd, mt)
    _check_hits(got, want, n)


def test_shape2d_tiling_roundtrip():
    rng = np.random.default_rng(6)
    tri_pos, tpf, tattr, _ = _soup(rng, 300)
    scene = _scene(tri_pos, tpf, tattr)
    h, w = 40, 52  # not multiples of the 32x32 tile
    n = h * w
    ro, rd = _rays(rng, n)
    mt = jnp.full((n,), F32_MAX)
    flat = cull_trace(scene, ro, rd, mt, mode="hit", interpret=True)
    tiled = cull_trace(scene, ro, rd, mt, mode="hit", shape2d=(h, w),
                       interpret=True)
    assert np.allclose(np.asarray(flat["t"]), np.asarray(tiled["t"]),
                       rtol=1e-5, atol=1e-5)
    assert (np.asarray(flat["instance"]) == np.asarray(tiled["instance"])).all()


def test_cull_phase_is_conservative():
    """Every cluster containing a triangle actually hit by some ray in a
    tile must survive that tile's cull."""
    rng = np.random.default_rng(7)
    tri_pos, tpf, tattr, _ = _soup(rng, 256)
    bvh = build_bvh(tri_pos.min(axis=1), tri_pos.max(axis=1))
    cl = build_cluster_tables(bvh, tpf, tattr, cluster_size=16)
    n = 1024
    ro, rd = _rays(rng, n)
    mt = jnp.full((n,), F32_MAX)
    ray9, ro_t, rd_t, mt_t, _ = _prep_rays(ro, rd, mt, None, None, None)
    lists, counts, _, _ = cull_phase(jnp.asarray(cl["cl_aabb"]), ro_t, rd_t, mt_t)
    # brute-force hits -> cluster of each hit prim
    scene = _scene(tri_pos, tpf, tattr, cluster=16)
    want = brute_force_intersect(scene, ro, rd, mt)
    prim = np.asarray(want["prim"])
    tri_packed = np.asarray(cl["cl_tri_packed"]).reshape(-1, 16)
    prim_col = np.round(tri_packed[:, 10]).astype(np.int64)
    lists_np = np.asarray(lists)
    counts_np = np.asarray(counts)
    for r in range(0, n, 97):
        if prim[r] < 0:
            continue
        rows = np.nonzero(prim_col == prim[r])[0]
        cid = rows[0] // 16
        tile = r // 1024
        cnt = counts_np[tile]
        if cnt < 0:
            continue  # overflow tile sweeps everything
        assert cid in lists_np[tile, :cnt], (r, cid)
