"""Checkerboard-lighting domain ops: roundtrip, masks, reconstruction."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops import checkerboard as ckb


def test_compress_expand_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 8, 3)).astype(np.float32))
    for par in (0, 1):
        mask = np.asarray(ckb.active_mask(par, (6, 8)))
        c = ckb.compress(x, jnp.int32(par))
        assert c.shape == (6, 4, 3)
        e = np.asarray(ckb.expand(c, jnp.int32(par)))
        # active pixels roundtrip exactly; inactive are zero
        assert np.array_equal(e[mask], np.asarray(x)[mask])
        assert (e[~mask] == 0).all()
        # compressed values are exactly the active pixels, row-major
        xs = np.asarray(x)
        for y in range(6):
            o = (y + par) % 2
            np.testing.assert_array_equal(np.asarray(c)[y], xs[y, o::2])


def test_active_mask_alternates():
    m0 = np.asarray(ckb.active_mask(0, (4, 4)))
    m1 = np.asarray(ckb.active_mask(1, (4, 4)))
    assert (m0 ^ m1).all()  # complementary
    assert m0[0, 0] and not m0[0, 1] and m0[1, 1]


def test_pixel_uv_matches_true_centers():
    uv = np.asarray(ckb.pixel_uv((4, 8), jnp.int32(1)))
    # row 0 with par 1: active xs are 1,3,5,7
    np.testing.assert_allclose(uv[0, :, 0], (np.array([1, 3, 5, 7]) + 0.5) / 8)
    np.testing.assert_allclose(uv[0, :, 1], 0.5 / 4)
    # row 1 with par 1: active xs are 0,2,4,6
    np.testing.assert_allclose(uv[1, :, 0], (np.array([0, 2, 4, 6]) + 0.5) / 8)


def test_reconstruct_smooth_field_exact():
    """A linear field is reproduced exactly by 4-neighbor averaging in the
    interior (left/right and up/down deltas cancel)."""
    h, w = 8, 10
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    field = (2.0 * xx + 3.0 * yy).astype(np.float32)[..., None]
    depth = jnp.ones((h, w), jnp.float32)
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (h, w, 3))
    par = jnp.int32(0)
    mask = ckb.active_mask(par, (h, w))
    half = jnp.where(mask[..., None], jnp.asarray(field), 0.0)
    out = np.asarray(ckb.reconstruct(half, mask, depth, normal))
    interior = np.s_[1:-1, 1:-1]
    np.testing.assert_allclose(out[interior], field[interior], rtol=1e-6)


def test_reconstruct_respects_depth_gate():
    """Neighbors across a depth discontinuity don't bleed."""
    h, w = 4, 6
    depth = np.ones((h, w), np.float32)
    depth[:, 3:] = 10.0  # far region
    vals = np.zeros((h, w, 1), np.float32)
    vals[:, :3] = 1.0  # near region lit
    vals[:, 3:] = 5.0
    par = jnp.int32(0)
    mask = ckb.active_mask(par, (h, w))
    half = jnp.where(mask[..., None], jnp.asarray(vals), 0.0)
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (h, w, 3))
    out = np.asarray(ckb.reconstruct(half, mask, jnp.asarray(depth), normal))
    m = np.asarray(mask)
    # inactive pixels in the interior of the near region get near values only
    assert np.allclose(out[1:-1, 1:2][~m[1:-1, 1:2]], 1.0)
    # inactive pixels in the far region interior get far values only
    assert np.allclose(out[1:-1, 4:5][~m[1:-1, 4:5]], 5.0)


def test_merge_packed_keeps_inactive():
    rng = np.random.default_rng(1)
    old = jnp.asarray(rng.normal(size=(4, 6, 5)).astype(np.float32))
    new_c = jnp.asarray(rng.normal(size=(4, 3, 5)).astype(np.float32))
    par = jnp.int32(1)
    out = np.asarray(ckb.merge_packed(new_c, old, par))
    mask = np.asarray(ckb.active_mask(par, (4, 6)))
    assert np.array_equal(out[~mask], np.asarray(old)[~mask])
    assert np.array_equal(out[mask], np.asarray(ckb.expand(new_c, par))[mask])
