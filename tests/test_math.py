"""Pure-function oracles: Halton constants, normal basis, YCoCg, tonemap,
BRDF sanity, alias of utils.math vs reference constants."""

import numpy as np
import jax.numpy as jnp

from hikari_tpu.config import HALTON_JITTER, halton
from hikari_tpu.utils import math as m


def test_halton_matches_reference_table():
    # reference src/view.rs:130-139 HALTON constants
    expected = [
        (0.000000, 0.000000), (0.500000, 0.333333),
        (0.250000, 0.666667), (0.750000, 0.111111),
        (0.125000, 0.444444), (0.625000, 0.777778),
        (0.375000, 0.222222), (0.875000, 0.555556),
        (0.062500, 0.888889), (0.562500, 0.037037),
        (0.312500, 0.370370), (0.812500, 0.703704),
        (0.187500, 0.148148), (0.687500, 0.481481),
        (0.437500, 0.814815), (0.937500, 0.259259),
    ]
    assert np.allclose(HALTON_JITTER, expected, atol=1e-5)


def test_normal_basis_orthonormal(rng):
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    basis = np.asarray(m.normal_basis(jnp.asarray(n, jnp.float32)))
    # columns are (t, b, n)
    assert np.allclose(basis[..., 2], n, atol=1e-5)
    for i in range(3):
        for j in range(3):
            dots = np.einsum("nk,nk->n", basis[..., i], basis[..., j])
            expect = 1.0 if i == j else 0.0
            assert np.allclose(dots, expect, atol=1e-4), (i, j)


def test_ycocg_roundtrip(rng):
    rgb = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    back = np.asarray(m.ycocg_to_rgb(m.rgb_to_ycocg(jnp.asarray(rgb))))
    assert np.allclose(back, rgb, atol=1e-5)


def test_reinhard_inverse_roundtrip(rng):
    rgb = rng.uniform(0.01, 0.9, (128, 3)).astype(np.float32)
    fwd = np.asarray(m.reinhard_luminance(jnp.asarray(rgb)))
    back = np.asarray(m.inverse_reinhard_luminance(jnp.asarray(fwd)))
    assert np.allclose(back, rgb, rtol=1e-3, atol=1e-4)


def test_cosine_hemisphere_distribution(rng):
    r = rng.uniform(size=(200_000, 2)).astype(np.float32)
    d, pdf = m.sample_cosine_hemisphere(jnp.asarray(r))
    d = np.asarray(d)
    assert (d[:, 2] >= -1e-6).all()
    # mean of cos(theta) for cosine-weighted = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3
    assert np.allclose(np.asarray(pdf), d[:, 2] / np.pi * np.pi * 2 * m.INV_TAU,
                       atol=1e-5)


def test_cone_sampling_within_cone(rng):
    r = rng.uniform(size=(10_000, 2)).astype(np.float32)
    cos_a = np.cos(0.3)
    d, pdf = m.sample_uniform_cone(jnp.asarray(r), cos_a)
    d = np.asarray(d)
    assert (d[:, 2] >= cos_a - 1e-5).all()
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_env_brdf_approx_bounds(rng):
    f0 = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    rough = rng.uniform(0, 1, 64).astype(np.float32)
    nov = rng.uniform(0.01, 1, 64).astype(np.float32)
    out = np.asarray(m.env_brdf_approx(jnp.asarray(f0), jnp.asarray(rough),
                                       jnp.asarray(nov)))
    assert np.isfinite(out).all()
    assert (out >= -0.05).all() and (out <= 1.5).all()


def test_luminance_rec709():
    assert np.isclose(float(m.luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0)
    assert np.isclose(float(m.luminance(jnp.array([1.0, 0.0, 0.0]))), 0.2126)
