"""Reservoir algebra: pack/unpack roundtrip, WRS statistics, clamps,
scatter/gather oracles (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.ops import reservoir as rsv


def rand_reservoir(rng, size):
    h, w = size
    r = rsv.empty_reservoir(size)
    for k, v in r.items():
        if v.dtype == jnp.int32:
            r[k] = jnp.asarray(rng.integers(0, 5, v.shape), jnp.int32)
        else:
            r[k] = jnp.asarray(rng.uniform(0, 1, v.shape), jnp.float32)
    # fields with quantized storage classes (the reference's 64-byte struct,
    # light.wgsl:35-43): normals snorm8, lifetime u8, sample_pos.w a flag
    r["visible_normal"] = r["visible_normal"] / jnp.maximum(
        jnp.linalg.norm(r["visible_normal"], axis=-1, keepdims=True), 1e-6)
    r["sample_normal"] = r["sample_normal"] / jnp.maximum(
        jnp.linalg.norm(r["sample_normal"], axis=-1, keepdims=True), 1e-6)
    r["lifetime"] = jnp.round(r["lifetime"] * 100.0)
    r["sample_position"] = r["sample_position"].at[..., 3].set(
        (r["sample_position"][..., 3] > 0.5).astype(jnp.float32))
    return r


# per-field tolerances of the packed 64-byte layout (bf16 / unorm16 /
# snorm8 storage classes — matching light.wgsl:35-43)
_PACK_TOL = {
    "visible_position": 0.0, "visible_instance": 0.0, "lifetime": 0.0,
    "sample_position": 0.0,
    "radiance": 4e-3, "count": 4e-3, "w": 4e-3, "w_sum": 4e-3,
    "w2_sum": 4e-3,
    "random": 1e-4,
    "visible_normal": 5e-3, "sample_normal": 5e-3,
}


def test_pack_unpack_roundtrip(rng):
    r = rand_reservoir(rng, (4, 6))
    packed = rsv.pack_reservoir(r)
    assert packed.shape[-1] == rsv.PACKED_WIDTH == 16  # 64 B/pixel
    r2 = rsv.unpack_reservoir(packed)
    for k in r:
        tol = _PACK_TOL[k]
        a, b = np.asarray(r[k], np.float32), np.asarray(r2[k], np.float32)
        assert np.allclose(a, b, atol=tol, rtol=tol), (
            k, np.abs(a - b).max())
    # double roundtrip is exact (quantization is idempotent)
    r3 = rsv.unpack_reservoir(rsv.pack_reservoir(r2))
    for k in r2:
        assert np.allclose(np.asarray(r2[k], np.float32),
                           np.asarray(r3[k], np.float32), atol=1e-6), k


def test_update_reservoir_statistics(rng):
    """WRS keeps each candidate with probability proportional to weight."""
    n = 20000
    size = (1, n)
    weights = [1.0, 3.0, 6.0]
    r = rsv.empty_reservoir(size)
    s0 = {k: r[k] for k in ("radiance", "random", "visible_position",
                            "visible_normal", "visible_instance",
                            "sample_position", "sample_normal")}
    for i, wgt in enumerate(weights):
        s = dict(s0)
        s["radiance"] = jnp.full((1, n, 4), float(i + 1))
        s["random"] = jnp.asarray(rng.uniform(0, 1, (1, n, 4)), jnp.float32)
        w = jnp.full((1, n), wgt)
        if i == 0:
            r = rsv.set_reservoir(s, w)
        else:
            r = rsv.update_reservoir(r, s, w)
    assert np.allclose(np.asarray(r["w_sum"]), sum(weights))
    assert np.allclose(np.asarray(r["count"]), 3.0)
    picked = np.asarray(r["radiance"][..., 0]).reshape(-1)
    for i, wgt in enumerate(weights):
        frac = (picked == i + 1).mean()
        assert abs(frac - wgt / sum(weights)) < 0.02, (i, frac)


def test_clamp(rng):
    r = rand_reservoir(rng, (2, 2))
    r["count"] = jnp.full((2, 2), 100.0)
    r["w_sum"] = jnp.full((2, 2), 10.0)
    r["w2_sum"] = jnp.full((2, 2), 4.0)
    c = rsv.clamp_reservoir(r, jnp.float32(50.0))
    assert np.allclose(np.asarray(c["count"]), 50.0)
    assert np.allclose(np.asarray(c["w_sum"]), 5.0)
    assert np.allclose(np.asarray(c["w2_sum"]), 2.0)


def test_gather_scatter_roundtrip(rng):
    size = (8, 8)
    r = rand_reservoir(rng, size)
    iy = jnp.asarray(rng.integers(0, 8, size), jnp.int32)
    ix = jnp.asarray(rng.integers(0, 8, size), jnp.int32)
    valid = jnp.ones(size, bool)
    g = rsv.gather_reservoir(r, iy, ix, valid)
    for k in r:
        expect = np.asarray(r[k], np.float32)[np.asarray(iy), np.asarray(ix)]
        tol = _PACK_TOL[k]
        assert np.allclose(np.asarray(g[k], np.float32), expect,
                           atol=tol, rtol=tol), k
    # masked gather yields empty
    g2 = rsv.gather_reservoir(r, iy, ix, jnp.zeros(size, bool))
    assert np.allclose(np.asarray(g2["count"]), 0.0)
    assert (np.asarray(g2["visible_instance"]) == -1).all()


def test_scatter_writes_masked(rng):
    size = (8, 8)
    dst = rand_reservoir(rng, size)
    src = rand_reservoir(rng, size)
    iy = jnp.asarray(np.arange(8)[:, None].repeat(8, 1), jnp.int32)
    ix = jnp.asarray(np.arange(8)[None, :].repeat(8, 0), jnp.int32)
    mask = jnp.asarray(np.arange(64).reshape(8, 8) % 2 == 0)
    out = rsv.scatter_reservoir(dst, iy, ix, src, mask)
    m = np.asarray(mask)
    for k in dst:
        o = np.asarray(out[k], np.float32)
        s = np.asarray(src[k], np.float32)
        d = np.asarray(dst[k], np.float32)
        mm = m[..., None] if o.ndim == 3 else m
        tol = _PACK_TOL[k]
        assert np.allclose(o, np.where(mm, s, d), atol=tol, rtol=tol), k


def test_check_previous_reservoir_rejects(rng):
    size = (1, 4)
    r = rand_reservoir(rng, size)
    s = {k: r[k] for k in ("radiance", "random", "visible_position",
                           "visible_normal", "visible_instance",
                           "sample_position", "sample_normal")}
    # same everything but normalized normals -> accepted
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 4, jnp.float32).reshape(1, 4, 3)
    r["visible_normal"] = n
    s = dict(s)
    s["visible_normal"] = n
    s["random"] = jnp.zeros((1, 4, 4))
    r["visible_position"] = r["visible_position"].at[..., 3].set(1.0)
    s["visible_position"] = r["visible_position"]
    s["visible_instance"] = r["visible_instance"]
    _, ok = rsv.check_previous_reservoir(r, s)
    assert np.asarray(ok).all()
    # depth mismatch -> rejected
    s2 = dict(s)
    s2["visible_position"] = s["visible_position"].at[..., 3].set(3.0)
    r2, ok2 = rsv.check_previous_reservoir(r, s2)
    assert not np.asarray(ok2).any()
    assert np.allclose(np.asarray(r2["count"]), 0.0)
