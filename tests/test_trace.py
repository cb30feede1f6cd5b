"""Tracing engines: Moller-Trumbore oracle, BVH vs brute-force agreement,
exclude/include instance masks, early-out shadow rays."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.material import StandardMaterial
from hikari_tpu.models.scene import Scene, make_transform
from hikari_tpu.ops.trace import (
    brute_force_intersect,
    hit_info,
    intersect_triangle,
    traverse_bvh,
)


def simple_scene():
    sc = Scene()
    cube_id = sc.add_mesh(shapes.cube(1.0))
    plane_id = sc.add_mesh(shapes.plane(8.0))
    m0 = sc.add_material(StandardMaterial.from_color(0.8, 0.7, 0.6))
    m1 = sc.add_material(StandardMaterial.from_color(0.3, 0.5, 0.3))
    sc.spawn(cube_id, m0, make_transform((0, 0.5, 0)))
    sc.spawn(plane_id, m1, make_transform((0, 0, 0)))
    return sc


def np_brute_force(tri_pos, tri_inst, ro, rd, exclude=None, include=None):
    """Pure-numpy nearest-hit oracle."""
    v0, v1, v2 = tri_pos[:, 0], tri_pos[:, 1], tri_pos[:, 2]
    ab, ac = v1 - v0, v2 - v0
    n_rays = len(ro)
    t_best = np.full(n_rays, np.float32(3.4e38))
    prim_best = np.full(n_rays, -1)
    for p in range(len(tri_pos)):
        if tri_inst[p] < 0:
            continue
        if exclude is not None and tri_inst[p] == exclude:
            continue
        if include is not None and include >= 0 and tri_inst[p] != include:
            continue
        u_vec = np.cross(rd, ac[p])
        det = (ab[p] * u_vec).sum(-1)
        ok = np.abs(det) >= 1.19e-7
        inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        ao = ro - v0[p]
        u = (ao * u_vec).sum(-1) * inv
        v_vec = np.cross(ao, ab[p])
        v = (rd * v_vec).sum(-1) * inv
        t = (ac[p] * v_vec).sum(-1) * inv
        ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1.19e-7)
        closer = ok & (t < t_best)
        t_best = np.where(closer, t, t_best)
        prim_best = np.where(closer, p, prim_best)
    return t_best, prim_best


def random_rays(rng, n):
    ro = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    ro[:, 1] = rng.uniform(0.2, 3, n)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_intersect_triangle_basic():
    ro = jnp.array([[0.0, 0.0, 1.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    v1 = jnp.array([[1.0, -1.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    t, u, v = intersect_triangle(ro, rd, v0, v1, v2)
    assert np.isclose(t[0], 1.0)
    # miss: parallel ray
    rd2 = jnp.array([[1.0, 0.0, 0.0]])
    t2, _, _ = intersect_triangle(ro, rd2, v0, v1, v2)
    assert t2[0] > 1e30


def test_engines_match_oracle(rng):
    gpu = simple_scene().compile()
    sc = gpu.as_pytree()
    ro, rd = random_rays(rng, 256)
    maxt = np.full(256, 3.4e38, np.float32)

    t_np, prim_np = np_brute_force(
        gpu.arrays["tri_pos"], gpu.arrays["tri_instance"], ro, rd
    )
    bf = brute_force_intersect(sc, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(maxt), tile=8)
    bv = traverse_bvh(sc, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(maxt))

    hit_mask = prim_np >= 0
    assert np.array_equal(np.asarray(bf["prim"]) >= 0, hit_mask)
    assert np.array_equal(np.asarray(bv["prim"]) >= 0, hit_mask)
    assert np.allclose(np.asarray(bf["t"])[hit_mask], t_np[hit_mask], rtol=1e-4)
    assert np.allclose(np.asarray(bv["t"])[hit_mask], t_np[hit_mask], rtol=1e-4)
    assert np.array_equal(np.asarray(bf["prim"]), prim_np)
    assert np.array_equal(np.asarray(bv["prim"]), prim_np)


def test_exclude_include_instance(rng):
    gpu = simple_scene().compile()
    sc = gpu.as_pytree()
    ro, rd = random_rays(rng, 128)
    maxt = np.full(128, 3.4e38, np.float32)
    excl = jnp.zeros(128, jnp.int32)  # exclude the cube (instance 0)

    t_np, prim_np = np_brute_force(
        gpu.arrays["tri_pos"], gpu.arrays["tri_instance"], ro, rd, exclude=0
    )
    for engine in (brute_force_intersect, traverse_bvh):
        res = engine(sc, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(maxt),
                     excl, None)
        assert np.array_equal(np.asarray(res["prim"]), prim_np), engine

    incl = jnp.zeros(128, jnp.int32)  # only the cube
    t_np, prim_np = np_brute_force(
        gpu.arrays["tri_pos"], gpu.arrays["tri_instance"], ro, rd, include=0
    )
    for engine in (brute_force_intersect, traverse_bvh):
        res = engine(sc, jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(maxt),
                     None, incl)
        assert np.array_equal(np.asarray(res["prim"]), prim_np), engine


def test_hit_info_normals():
    gpu = simple_scene().compile()
    sc = gpu.as_pytree()
    # straight down onto the plane
    ro = jnp.array([[2.0, 1.0, 2.0]])
    rd = jnp.array([[0.0, -1.0, 0.0]])
    res = traverse_bvh(sc, ro, rd, jnp.array([3.4e38]))
    info = hit_info(sc, ro, rd, res)
    assert np.allclose(np.asarray(info["normal"])[0], [0, 1, 0], atol=1e-5)
    assert np.allclose(np.asarray(info["position"])[0, :3], [2, 0, 2], atol=1e-4)
    assert info["instance"][0] == 1
    assert info["material"][0] == 1
    # miss
    ro = jnp.array([[0.0, 1.0, 0.0]])
    rd = jnp.array([[0.0, 1.0, 0.0]])
    res2 = traverse_bvh(sc, ro, rd, jnp.array([3.4e38]))
    info2 = hit_info(sc, ro, rd, res2)
    assert info2["instance"][0] == -1
    assert np.asarray(info2["position"])[0, 3] == 0.0


def emissive_scene():
    sc = Scene()
    cube_id = sc.add_mesh(shapes.cube(1.0))
    plane_id = sc.add_mesh(shapes.plane(8.0))
    quad_id = sc.add_mesh(shapes.quad(1.0, 1.0))
    m0 = sc.add_material(StandardMaterial.from_color(0.8, 0.7, 0.6))
    m1 = sc.add_material(StandardMaterial.from_color(0.3, 0.5, 0.3))
    me = sc.add_material(StandardMaterial(emissive=(1.0, 0.8, 0.5, 1.0)))
    sc.spawn(cube_id, m0, make_transform((0, 0.5, 0)))
    sc.spawn(plane_id, m1, make_transform((0, 0, 0)))
    sc.spawn(quad_id, me, make_transform((0, 2.5, 0)))
    return sc


def test_emissive_tri_tables():
    gpu = emissive_scene().compile()
    a = gpu.arrays
    em = a["em_tri_pos_flat"]
    inst = np.round(np.asarray(em[:, 9])).astype(int)
    real = inst[inst >= 0]
    # exactly the emissive instance's triangles, padded to a multiple of 8
    assert (real == 2).all() and len(real) == 2
    assert em.shape[0] % 8 == 0
    assert a["em_tri_attr"].shape[0] == em.shape[0]


def test_probe_info_matches_with_info():
    """probe_info must reproduce with_info exactly for include-masked rays
    (the only lanes select_light_candidate consumes)."""
    from hikari_tpu.ops.trace import make_tracer

    gpu = emissive_scene().compile()
    scene = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    tracer = make_tracer(gpu.num_triangles)

    rng = np.random.default_rng(3)
    n = 256
    ro = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    ro[:, 1] = rng.uniform(0.1, 1.5, n)
    # aim at the emissive quad (instance 2) from below
    target = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    target[:, 1] = 2.5
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    mt = np.full(n, 3.4e38, np.float32)
    inc = np.full(n, 2, np.int32)

    ref = tracer.with_info(scene, ro, rd, mt, None, inc)
    probe = tracer.probe_info(scene, ro, rd, mt, None, inc)
    hit = np.asarray(ref["instance"]) >= 0
    assert hit.any()
    assert (np.asarray(probe["instance"]) == np.asarray(ref["instance"])).all()
    np.testing.assert_allclose(np.asarray(probe["t"])[hit],
                               np.asarray(ref["t"])[hit], rtol=1e-5)
    for k in ("position", "normal", "uv"):
        np.testing.assert_allclose(np.asarray(probe[k])[hit],
                                   np.asarray(ref[k])[hit],
                                   rtol=1e-4, atol=1e-5)
    assert (np.asarray(probe["material"])[hit]
            == np.asarray(ref["material"])[hit]).all()
