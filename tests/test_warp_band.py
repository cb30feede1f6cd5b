"""Banded channel-plane warp (ops/warp_band.py) vs a pure-numpy separable
filter oracle. In-band (smooth displacement fields) the kernel must match
the direct per-pixel filter everywhere INCLUDING image borders (the edge
padding replicates clamp-to-edge tap semantics)."""

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.warp_band import R, warp_band


def _fields(h, w, amp, seed=0):
    """Smooth displacement field whose offsets stay within +-R of each
    8x128 group's mean: gradient bounded so group-wide variation (+-64 px
    from the group center) plus jitter plus mean rounding stays under R."""
    rng = np.random.default_rng(seed)
    yy = (np.arange(h, dtype=np.float64))[:, None].repeat(w, 1)
    xx = (np.arange(w, dtype=np.float64))[None, :].repeat(h, 0)
    sy = yy + amp * np.sin(yy / 401.0 + 1.3) * np.cos(xx / 487.0)
    sx = xx + amp * np.cos(yy / 419.0) * np.sin(xx / 449.0 + 0.7)
    sy = sy + rng.uniform(-0.25, 0.25, (h, w))
    sx = sx + rng.uniform(-0.25, 0.25, (h, w))
    return (jnp.asarray(sy.astype(np.float32)),
            jnp.asarray(sx.astype(np.float32)))


def _w1d(dist, kind):
    if kind == "nearest":
        return ((dist <= 0.5) & (dist > -0.5)).astype(np.float64)
    if kind == "bilinear":
        return np.maximum(0.0, 1.0 - np.abs(dist))
    a = np.abs(dist)
    return np.where(
        a < 1.0, 1.5 * a**3 - 2.5 * a**2 + 1.0,
        np.where(a < 2.0, -0.5 * a**3 + 2.5 * a**2 - 4.0 * a + 2.0, 0.0))


def _oracle(src, sy, sx, kind):
    """src: [H, F, W] channel-plane; separable 4-tap filter with
    clamp-to-edge taps at clamped coords."""
    src = np.asarray(src, np.float64)
    H, F, W = src.shape
    y = np.clip(np.asarray(sy, np.float64), 0.0, H - 1.0)
    x = np.clip(np.asarray(sx, np.float64), 0.0, W - 1.0)
    by = np.floor(y).astype(np.int64)
    bx = np.floor(x).astype(np.int64)
    out = np.zeros(y.shape + (F,), np.float64)
    for ty in range(-1, 3):
        iy = np.clip(by + ty, 0, H - 1)
        wy = _w1d(y - (by + ty), kind)
        for tx in range(-1, 3):
            ix = np.clip(bx + tx, 0, W - 1)
            wx = _w1d(x - (bx + tx), kind)
            out += (wy * wx)[..., None] * src[iy, :, ix]
    return np.moveaxis(out.astype(np.float32), -1, 1)


def test_warp_band_matches_oracle_all_kinds():
    rng = np.random.default_rng(3)
    H = W = 256
    s1 = jnp.asarray(rng.uniform(0, 1, (H, 3, W)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0, 1, (H, 6, W)).astype(np.float32))
    sy, sx = _fields(H, W, amp=1.0)

    outs = warp_band([s1, s2, s1], ("catmull", "nearest", "bilinear"),
                     sy, sx, interpret=True)

    want = _oracle(s1, sy, sx, "catmull")
    err = np.abs(np.asarray(outs[0]) - want).max()
    assert err < 1e-3, err

    want = _oracle(s2, sy, sx, "nearest")
    frac = np.mean(np.abs(np.asarray(outs[1]) - want) < 1e-6)
    assert frac > 0.995, frac  # half-texel rounding ties may flip

    want = _oracle(s1, sy, sx, "bilinear")
    err = np.abs(np.asarray(outs[2]) - want).max()
    assert err < 1e-4, err


def test_warp_band_borders():
    """Border contract: a sub-band border overlap (|shift| < 1) is exact
    EVERYWHERE (edge-replicated margin taps = clamp-to-edge semantics);
    a large shift is exact wherever coords don't clamp (the clamp ramp at
    the border exceeds the +-R band — callers reject via boundary tests)."""
    rng = np.random.default_rng(5)
    H, W = 64, 256
    src = jnp.asarray(rng.uniform(0, 1, (H, 4, W)).astype(np.float32))
    yy = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)

    # sub-band overlap: exact at every pixel, borders included
    for dy, dx in ((-0.7, 0.6), (0.8, -0.9)):
        sy, sx = yy + dy, xx + dx
        out, = warp_band([src], ("catmull",), sy, sx, interpret=True)
        want = _oracle(src, sy, sx, "catmull")
        err = np.abs(np.asarray(out) - want).max()
        assert err < 1e-3, (dy, dx, err)

    # large shift: exact on whole groups whose coords never clamp
    out, = warp_band([src], ("catmull",), yy - 7.3, xx + 5.1,
                     interpret=True)
    want = _oracle(src, yy - 7.3, xx + 5.1, "catmull")
    o = np.asarray(out)
    assert np.isfinite(o).all()
    s = np.s_[8:, :, :128]   # y-groups fully unclamped, x-group 0
    err = np.abs(o[s] - want[s]).max()
    assert err < 1e-3, err


def test_warp_band_out_of_band_clamps():
    """A displacement step bigger than the band: out-of-band pixels clamp
    to the band edge and yield a REAL band-edge sample — for 'nearest' a
    value actually present in the source window (never a fabricated 0),
    for weighted kinds a partition-of-unity blend (catmull weights sum
    to 1, so outputs stay within the source's value range). In-band pixels
    stay exact."""
    rng = np.random.default_rng(7)
    H, W = 32, 128
    # sources bounded AWAY from zero so a fabricated 0.0 is detectable
    src = jnp.asarray(rng.uniform(0.5, 1.0, (H, 2, W)).astype(np.float32))
    yy = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    # half the rows jump +9 rows: the 8-row groups they share with
    # unjumped rows get a split mean -> both sides partially out of band
    sy = yy + jnp.where(yy < 16, 0.0, 9.0 * (R + 1))
    sx = xx
    for kind in ("bilinear", "nearest", "catmull"):
        out, = warp_band([src], (kind,), sy, sx, interpret=True)
        o = np.asarray(out)
        assert np.isfinite(o).all(), kind
        # no out-of-band pixel may output 0.0 (the source has none):
        # 'nearest' must hit a real mask tap, weighted kinds must keep
        # their full 4-tap support inside the window (weights sum to 1)
        assert o.min() >= 0.4, (kind, o.min())
        if kind == "nearest":
            assert np.isin(np.round(o, 5),
                           np.round(np.asarray(src), 5)).mean() > 0.999
        want = _oracle(src, sy, sx, kind)
        # rows far from the step are in-band and exact
        err = np.abs(o[:8] - want[:8]).max()
        tol = 5e-3 if kind == "nearest" else 1e-3
        assert err < tol, (kind, err)
