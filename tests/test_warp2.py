"""Warp engine v2 (ops/warp2.py) vs the XLA warp engine (ops/warp.py) on
smooth displacement fields (where no window clamping occurs in either)."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.ops.warp import build_warp, warp_reduce
from hikari_tpu.ops.warp2 import warp_multi


def _fields(h, w, H, W, amp=3.0, seed=0):
    rng = np.random.default_rng(seed)
    yy = (np.arange(h) + 0.5)[:, None] * (H / h)
    xx = (np.arange(w) + 0.5)[None, :] * (W / w)
    sy = yy - 0.5 + amp * np.sin(yy / 37.0 + 1.3) * np.cos(xx / 53.0)
    sx = xx - 0.5 + amp * np.cos(yy / 41.0) * np.sin(xx / 29.0 + 0.7)
    sy = sy + rng.uniform(-0.5, 0.5, (h, w))
    sx = sx + rng.uniform(-0.5, 0.5, (h, w))
    return (jnp.asarray(sy.astype(np.float32)),
            jnp.asarray(sx.astype(np.float32)))


def test_warp2_matches_warp_kernels():
    rng = np.random.default_rng(1)
    H = W = 160
    h = w = 160
    F = 10
    src = jnp.asarray(rng.uniform(0, 1, (H, W, F)).astype(np.float32))
    sy, sx = _fields(h, w, H, W)

    ctx = build_warp(src, sy, sx)
    outs2 = warp_multi(src, sy, sx, [
        ("nearest", (0.0, 0.0), (3, 10)),
        ("catmull", (0.0, 0.0), (0, 3)),
        ("bilinear", (0.0, 0.0), (0, 10)),
    ])

    want_nearest = np.asarray(warp_reduce(ctx, "nearest", channels=(3, 10)))
    got = np.asarray(outs2[0])
    # interior only: the two engines clamp differently at image borders
    s = np.s_[8:-8, 8:-8]
    frac_eq = np.mean(np.abs(got[s] - want_nearest[s]) < 1e-5)
    assert frac_eq > 0.995, frac_eq  # rare half-texel rounding ties may flip

    want_cat = np.asarray(
        warp_reduce(ctx, "catmull", channels=(0, 3), precise=True))
    got = np.asarray(outs2[1])
    assert np.abs(got[s] - want_cat[s]).max() < 1e-3, \
        np.abs(got[s] - want_cat[s]).max()

    want_bil = np.asarray(
        warp_reduce(ctx, "bilinear", channels=(0, 10), precise=True))
    got = np.asarray(outs2[2])
    assert np.abs(got[s] - want_bil[s]).max() < 1e-3


def test_warp2_offsets_and_identity():
    rng = np.random.default_rng(2)
    H = W = 96
    src = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))
    # identity warp: nearest must reproduce the source exactly
    yy = jnp.asarray((np.arange(H) + 0.0)[:, None]
                     * np.ones((1, W)), jnp.float32)
    xx = jnp.asarray(np.ones((H, 1))
                     * (np.arange(W) + 0.0)[None, :], jnp.float32)
    out = warp_multi(src, yy, xx, [("nearest", (0.0, 0.0), (0, 4))])[0]
    s = np.s_[8:-8, 8:-8]
    assert np.array_equal(np.asarray(out)[s], np.asarray(src)[s])

    # +1 row offset == shifted source
    out = warp_multi(src, yy, xx, [("nearest", (1.0, 0.0), (0, 4))])[0]
    assert np.allclose(np.asarray(out)[8:-9, 8:-8],
                       np.asarray(src)[9:-8, 8:-8])


def test_warp2_nonmultiple_sizes():
    rng = np.random.default_rng(3)
    H, W = 135, 241   # not multiples of 8/16
    h, w = 67, 120
    src = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    sy, sx = _fields(h, w, H, W, amp=2.0)
    out = warp_multi(src, sy, sx, [("bilinear", (0.0, 0.0), (0, 3))])[0]
    assert out.shape == (h, w, 3)
    assert np.isfinite(np.asarray(out)).all()
