"""Banded reprojection gather (ops/reproj_gather.py) vs jnp.take.

In-band pixels (residual within +-R of the group-mean offset) must match
the exact row gather bit-for-bit; out-of-band pixels return zeros (the
empty-reservoir rejection contract)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from hikari_tpu.ops.reproj_gather import reproj_gather


def _field(h, w, pan_y, pan_x, grad=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    piy = np.clip(np.round(yy + pan_y + grad * xx), 0, h - 1).astype(np.int32)
    pix = np.clip(np.round(xx + pan_x - grad * yy), 0, w - 1).astype(np.int32)
    return piy, pix


@pytest.mark.parametrize("pan", [(0.0, 0.0), (-3.2, 5.7), (12.0, -40.0)])
def test_reproj_gather_matches_take(pan):
    rng = np.random.default_rng(0)
    h, w, F = 48, 384, 16
    srcs = [rng.normal(size=(h, F, w)).astype(np.float32) for _ in range(2)]
    piy, pix = _field(h, w, *pan, grad=0.002)
    outs = reproj_gather([jnp.asarray(s) for s in srcs],
                         jnp.asarray(piy), jnp.asarray(pix))
    # interior = pixels a full group away from any coordinate-clipped band
    # (groups straddling a clipped frame edge have polluted mean offsets
    # and legitimately reject -> the disocclusion contract)
    yy, xx = np.mgrid[0:h, 0:w]
    interior = ((yy + pan[0] >= 8) & (yy + pan[0] <= h - 9)
                & (xx + pan[1] >= 128) & (xx + pan[1] <= w - 129))
    for s, o in zip(srcs, outs):
        ref = np.moveaxis(s[piy, :, pix], -1, 1)
        got = np.asarray(o)
        match = (got == ref).all(axis=1)
        # every pixel either matches the exact gather or is rejected to 0
        assert ((got == ref) | (got == 0)).all()
        assert match[interior].mean() > 0.93, (pan, match[interior].mean())


def test_reproj_gather_sharded_matches_single():
    """The shard_map island (row blocks + SHARD_HALO ppermuted rows) must
    reproduce the single-device gather for motion within the halo."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hikari_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    h, w, F = 64, 256, 16
    src = jnp.asarray(rng.normal(size=(h, F, w)).astype(np.float32))
    piy, pix = _field(h, w, -5.3, 9.1, grad=0.001)
    ref, = reproj_gather([src], jnp.asarray(piy), jnp.asarray(pix))
    got, = reproj_gather([src], jnp.asarray(piy), jnp.asarray(pix),
                         mesh=make_mesh(8))
    # sharded group boundaries differ (8-row shards regroup the mean
    # windows identically here since groups are 8 rows) -> expect equality
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("kind,mag,min_frac", [
    # the symmetric +-2 x band (XT=5, round-5) absorbs the 2%-zoom ramp
    # completely (x varies +-1.3 px across a 128-lane group + rounding);
    # rotation at 2% additionally ramps dy across the group's 128 lanes,
    # which the +-1 y band only mostly covers (band sim: 0.94 on this
    # frame) — at production rates (<=1%/frame) everything is in-band
    ("zoom", 0.01, 0.999),    # 1%/frame scale ramp
    ("rotate", 0.01, 0.999),  # 0.57 deg/frame roll
    ("zoom", 0.02, 0.99),
    ("rotate", 0.02, 0.90),
])
def test_reproj_gather_non_translational_motion(kind, mag, min_frac):
    """Zoom/rotation produce offsets that vary linearly across a group —
    the group-mean band must still accept the overwhelming majority of
    pixels (match-or-zero everywhere; tools/probe_reproj_band.py has the
    1080p table: >=99% in-band at these rates)."""
    rng = np.random.default_rng(7)
    h, w, F = 64, 384, 8
    src = rng.normal(size=(h, F, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    if kind == "zoom":
        py = cy + (1.0 + mag) * (yy - cy)
        px = cx + (1.0 + mag) * (xx - cx)
    else:
        c, s = np.cos(mag), np.sin(mag)
        py = cy + c * (yy - cy) - s * (xx - cx)
        px = cx + s * (yy - cy) + c * (xx - cx)
    piy = np.round(py).astype(np.int32)
    pix = np.round(px).astype(np.int32)
    out, = reproj_gather([jnp.asarray(src)], jnp.asarray(piy),
                         jnp.asarray(pix))
    got = np.asarray(out)
    live = (piy >= 0) & (piy < h) & (pix >= 0) & (pix < w)
    ref = np.moveaxis(src[np.clip(piy, 0, h - 1), :,
                          np.clip(pix, 0, w - 1)], -1, 1)
    # contract: every live pixel either matches the exact gather or
    # rejects to zero; accepted fraction stays high
    match = (got == ref).all(axis=1)
    zero = (got == 0).all(axis=1)
    assert (match | zero)[live].all()
    assert match[live].mean() > min_frac, match[live].mean()


def test_reproj_gather_wide_source_decodes_exactly():
    """w=2560 exceeds the old 4-bit cx pack field (ADVICE r3 low): the
    widened encoding must keep the match-or-zero contract at wide
    renders instead of silently returning wrong reservoir data."""
    rng = np.random.default_rng(3)
    h, w, F = 32, 2560, 4
    src = rng.normal(size=(h, F, w)).astype(np.float32)
    piy, pix = _field(h, w, -2.0, 37.0)
    out, = reproj_gather([jnp.asarray(src)], jnp.asarray(piy),
                         jnp.asarray(pix))
    ref = np.moveaxis(src[piy, :, pix], -1, 1)
    got = np.asarray(out)
    assert ((got == ref) | (got == 0)).all()
    yy, xx = np.mgrid[0:h, 0:w]
    interior = ((yy - 2.0 >= 8) & (yy - 2.0 <= h - 9)
                & (xx + 37.0 >= 128) & (xx + 37.0 <= w - 129))
    match = (got == ref).all(axis=1)
    assert match[interior].mean() > 0.93, match[interior].mean()


def test_reproj_gather_static_identity_is_exact():
    """Zero motion: every pixel in-band -> bit-exact everywhere."""
    rng = np.random.default_rng(1)
    h, w, F = 40, 256, 16
    src = rng.normal(size=(h, F, w)).astype(np.float32)
    piy, pix = _field(h, w, 0.0, 0.0)
    out, = reproj_gather([jnp.asarray(src)], jnp.asarray(piy),
                         jnp.asarray(pix))
    np.testing.assert_array_equal(np.asarray(out), src)
