"""Warp engine v2 (ops/warp2.py) vs a pure-numpy sampling oracle on smooth
displacement fields (where no window clamping occurs in the kernel)."""

import numpy as np
import jax.numpy as jnp

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


def _w1d(dist, kernel):
    """Same weight functions as warp2._weights, in numpy."""
    if kernel == "nearest":
        return ((np.abs(dist) <= 0.5) & (dist > -0.5)).astype(np.float64)
    if kernel == "bilinear":
        return np.maximum(0.0, 1.0 - np.abs(dist))
    a = np.abs(dist)  # catmull (A = -0.5)
    return np.where(
        a < 1.0, 1.5 * a**3 - 2.5 * a**2 + 1.0,
        np.where(a < 2.0, -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0, 0.0))


def _oracle(src, sy, sx, kernel, off=(0.0, 0.0), channels=None):
    """Separable filter sample of src [H,W,F] at (sy+off_y, sx+off_x) —
    pixel centers at integer coordinates, clamp-to-edge taps."""
    src = np.asarray(src, np.float64)
    H, W, F = src.shape
    y = np.clip(np.asarray(sy, np.float64), 0.0, H - 1.0) + off[0]
    x = np.clip(np.asarray(sx, np.float64), 0.0, W - 1.0) + off[1]
    out = np.zeros(y.shape + (F,), np.float64)
    base_y = np.floor(y).astype(np.int64)
    base_x = np.floor(x).astype(np.int64)
    for ty in range(-1, 3):
        iy = np.clip(base_y + ty, 0, H - 1)
        wy = _w1d(y - (base_y + ty), kernel)
        for tx in range(-1, 3):
            ix = np.clip(base_x + tx, 0, W - 1)
            wx = _w1d(x - (base_x + tx), kernel)
            out += (wy * wx)[..., None] * src[iy, ix]
    if channels is not None:
        out = out[..., channels[0]:channels[1]]
    return out.astype(np.float32)


def test_warp2_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    H = W = 160
    h = w = 160
    F = 10
    src = jnp.asarray(rng.uniform(0, 1, (H, W, F)).astype(np.float32))
    sy, sx = _fields(h, w, H, W)

    outs2 = warp_multi(src, sy, sx, [
        ("nearest", (0.0, 0.0), (3, 10)),
        ("catmull", (0.0, 0.0), (0, 3)),
        ("bilinear", (0.0, 0.0), (0, 10)),
    ])

    want_nearest = _oracle(src, sy, sx, "nearest", channels=(3, 10))
    got = np.asarray(outs2[0])
    # interior only: the engine clamps differently at image borders
    s = np.s_[8:-8, 8:-8]
    frac_eq = np.mean(np.abs(got[s] - want_nearest[s]) < 1e-5)
    assert frac_eq > 0.995, frac_eq  # rare half-texel rounding ties may flip

    want_cat = _oracle(src, sy, sx, "catmull", channels=(0, 3))
    got = np.asarray(outs2[1])
    assert np.abs(got[s] - want_cat[s]).max() < 1e-3, \
        np.abs(got[s] - want_cat[s]).max()

    want_bil = _oracle(src, sy, sx, "bilinear", channels=(0, 10))
    got = np.asarray(outs2[2])
    assert np.abs(got[s] - want_bil[s]).max() < 1e-3


def test_warp2_offset_matches_oracle():
    rng = np.random.default_rng(4)
    H = W = 96
    src = jnp.asarray(rng.uniform(0, 1, (H, W, 6)).astype(np.float32))
    sy, sx = _fields(H, W, H, W, amp=2.0, seed=5)
    out = warp_multi(src, sy, sx, [("bilinear", (1.0, -1.0), (0, 6))])[0]
    want = _oracle(src, sy, sx, "bilinear", off=(1.0, -1.0), channels=(0, 6))
    s = np.s_[8:-8, 8:-8]
    assert np.abs(np.asarray(out)[s] - want[s]).max() < 1e-3


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
