"""Pallas intersector kernels vs the numpy oracle (interpret mode on CPU).

On TPU these kernels carry the whole frame (ops/trace.py make_tracer); the
CPU suite runs them through the Pallas interpreter so kernel-logic
regressions are caught without TPU hardware.
"""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.trace_pallas import (
    pallas_brute_force,
    pallas_brute_force_full,
    pallas_shadow,
)
from tests.test_trace import np_brute_force, random_rays, simple_scene


def _setup(rng, n=512):
    gpu = simple_scene().compile()
    sc = {k: jnp.asarray(v) for k, v in gpu.arrays.items()}
    ro, rd = random_rays(rng, n)
    maxt = np.full(n, 3.4e38, np.float32)
    excl = np.full(n, -1, np.int32)
    incl = np.full(n, -1, np.int32)
    t_np, prim_np = np_brute_force(
        gpu.arrays["tri_pos"], gpu.arrays["tri_instance"], ro, rd)
    return gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np


def test_pallas_brute_force_matches_oracle(rng):
    gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np = _setup(rng)
    h = pallas_brute_force(sc["tri_pos_flat"], jnp.asarray(ro),
                           jnp.asarray(rd), jnp.asarray(maxt),
                           jnp.asarray(excl), jnp.asarray(incl),
                           interpret=True)
    assert np.array_equal(np.asarray(h["prim"]), prim_np)
    hit = prim_np >= 0
    np.testing.assert_allclose(np.asarray(h["t"])[hit], t_np[hit], rtol=1e-4)


def test_pallas_full_matches_oracle(rng):
    gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np = _setup(rng)
    h = pallas_brute_force_full(sc["tri_pos_flat"], sc["tri_attr"],
                                jnp.asarray(ro), jnp.asarray(rd),
                                jnp.asarray(maxt), jnp.asarray(excl),
                                jnp.asarray(incl), interpret=True)
    assert np.array_equal(np.asarray(h["prim"]), prim_np)
    hit = prim_np >= 0
    np.testing.assert_allclose(np.asarray(h["t"])[hit], t_np[hit], rtol=1e-4)
    # attrs against the XLA hit_info path
    from hikari_tpu.ops.trace import brute_force_intersect, hit_info

    bf = brute_force_intersect(sc, jnp.asarray(ro), jnp.asarray(rd),
                               jnp.asarray(maxt), tile=8)
    info = hit_info(sc, jnp.asarray(ro), jnp.asarray(rd), bf)
    for k in ("position", "normal", "uv"):
        np.testing.assert_allclose(np.asarray(h[k])[hit],
                                   np.asarray(info[k])[hit],
                                   rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.asarray(h["material"]), np.asarray(info["material"]))


def test_hit_info_onehot_matches_hit_info(rng):
    from hikari_tpu.ops.trace import (brute_force_intersect, hit_info,
                                      hit_info_onehot)

    gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np = _setup(rng)
    bf = brute_force_intersect(sc, jnp.asarray(ro), jnp.asarray(rd),
                               jnp.asarray(maxt), tile=8)
    a = hit_info(sc, jnp.asarray(ro), jnp.asarray(rd), bf)
    b = hit_info_onehot(sc, jnp.asarray(ro), jnp.asarray(rd), bf)
    for k in ("position", "normal", "uv"):
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.asarray(b["material"]), np.asarray(a["material"]))
    assert np.array_equal(np.asarray(b["instance"]), np.asarray(a["instance"]))


def test_pallas_shadow_matches_oracle(rng):
    gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np = _setup(rng)
    h = pallas_shadow(sc["tri_pos_flat"], jnp.asarray(ro), jnp.asarray(rd),
                      jnp.asarray(maxt), jnp.asarray(excl), jnp.asarray(incl),
                      interpret=True)
    hit = prim_np >= 0
    assert np.array_equal(np.asarray(h["instance"]) >= 0, hit)
    # shadow kernel reports the closest hit's t (division-free form)
    np.testing.assert_allclose(np.asarray(h["t"])[hit], t_np[hit], rtol=2e-4)
    # instance of the closest hit must match the oracle's winner
    inst_np = np.where(hit, gpu.arrays["tri_instance"][np.maximum(prim_np, 0)], -1)
    assert np.array_equal(np.asarray(h["instance"]), inst_np)


def test_pallas_shadow_exclude_and_maxdist(rng):
    gpu, sc, ro, rd, maxt, excl, incl, t_np, prim_np = _setup(rng, n=256)
    # exclude instance 0 (the cube)
    h = pallas_shadow(sc["tri_pos_flat"], jnp.asarray(ro), jnp.asarray(rd),
                      jnp.asarray(maxt), jnp.asarray(np.zeros(256, np.int32)),
                      jnp.asarray(incl[:256]), interpret=True)
    t_np2, prim_np2 = np_brute_force(
        gpu.arrays["tri_pos"], gpu.arrays["tri_instance"], ro, rd, exclude=0)
    hit = prim_np2 >= 0
    assert np.array_equal(np.asarray(h["instance"]) >= 0, hit)
    np.testing.assert_allclose(np.asarray(h["t"])[hit], t_np2[hit], rtol=2e-4)
    # max_t cuts hits beyond it
    cap = np.where(hit, t_np2 * 0.5, 1.0).astype(np.float32)
    h2 = pallas_shadow(sc["tri_pos_flat"], jnp.asarray(ro), jnp.asarray(rd),
                       jnp.asarray(cap), jnp.asarray(np.zeros(256, np.int32)),
                       jnp.asarray(incl[:256]), interpret=True)
    assert not (np.asarray(h2["instance"])[hit] >= 0).any()
