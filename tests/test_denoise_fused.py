"""Pallas fused a-trous denoiser vs the XLA shift-stencil oracle
(ops/denoise.py level loop) — same inputs, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.denoise import denoise_channels


def _inputs(h, w, nch, seed=0):
    rng = np.random.default_rng(seed)
    normal = rng.normal(size=(h, w, 3)).astype(np.float32)
    normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True),
                         1e-6)
    depth = rng.uniform(0.05, 1.0, size=(h, w)).astype(np.float32)
    g = {
        "position": np.concatenate(
            [rng.normal(size=(h, w, 3)).astype(np.float32),
             depth[..., None]], -1),
        "normal": normal * rng.uniform(0.5, 2.0, size=(h, w, 1)),
        "depth_gradient": (rng.normal(size=(h, w, 2)) * 0.01).astype(
            np.float32),
        "instance_material": np.stack(
            [rng.integers(0, 5, size=(h, w)).astype(np.float32) + 0.5,
             np.zeros((h, w), np.float32)], -1),
    }
    # a few invalid pixels (depth < eps) and a few NaN/inf radiance pixels
    g["position"][2, 3, 3] = 0.0
    g["position"][5, 9, 3] = 0.0
    albedo = rng.uniform(0.05, 1.0, size=(h, w, 4)).astype(np.float32)
    chans = []
    for c in range(nch):
        render = rng.uniform(0.0, 3.0, size=(h, w, 4)).astype(np.float32)
        render[1, 1, 0] = np.nan
        render[4, 7, 1] = np.inf
        if c > 0:
            render[6, 11, :3] = 400.0  # firefly outlier
        var = rng.uniform(0.0, 0.5, size=(h, w)).astype(np.float32)
        chans.append((jnp.asarray(render), jnp.asarray(var), c > 0))
    return jax.tree.map(jnp.asarray, g), jnp.asarray(albedo), chans


def test_fused_matches_xla_three_channels():
    h, w = 24, 128
    g, albedo, chans = _inputs(h, w, 3)
    frame = {"number": jnp.uint32(7)}
    ref = denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                           fused=False)
    got = denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                           fused=True)
    for r, o in zip(ref, got):
        r, o = np.asarray(r), np.asarray(o)
        assert np.isfinite(o).all()
        # bf16 gradient/denominator rounding perturbs the weights slightly
        assert np.abs(r - o).max() < 0.05, np.abs(r - o).max()


def test_fused_single_channel_odd_height():
    h, w = 21, 128  # exercises the row padding path (hp=32)
    g, albedo, chans = _inputs(h, w, 1, seed=3)
    frame = {"number": jnp.uint32(0)}
    ref = denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                           fused=False)
    got = denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                           fused=True)
    r, o = np.asarray(ref[0]), np.asarray(got[0])
    assert np.isfinite(o).all()
    assert np.abs(r - o).max() < 0.05, np.abs(r - o).max()
