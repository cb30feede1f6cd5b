"""Alias table: probabilities reproduce the area distribution."""

import numpy as np

from hikari_tpu.models.alias_table import (
    build_alias_table,
    sample_alias_table,
    triangle_areas,
)


def test_uniform_areas_identity():
    prob, index = build_alias_table(np.ones(7))
    # all ratios == 1 -> nothing poured
    assert np.allclose(prob, 0.0)
    assert np.array_equal(index, np.arange(7))


def test_distribution_matches_areas(rng):
    areas = rng.uniform(0.1, 5.0, 64)
    prob, index = build_alias_table(areas)
    n = 2_000_000
    rx = rng.uniform(size=n)
    ry = rng.uniform(size=n)
    picks = sample_alias_table(prob, index, rx, ry)
    counts = np.bincount(picks, minlength=len(areas)) / n
    expected = areas / areas.sum()
    assert np.abs(counts - expected).max() < 5e-3


def test_triangle_areas_transform():
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    indices = np.array([[0, 1, 2]], np.int64)
    eye = np.eye(4)
    assert np.allclose(triangle_areas(positions, indices, eye), [0.5])
    scale2 = np.diag([2.0, 2.0, 2.0, 1.0])
    assert np.allclose(triangle_areas(positions, indices, scale2), [2.0])


def test_extreme_skew(rng):
    areas = np.array([1e-6, 1.0, 1e-6, 1e-6])
    prob, index = build_alias_table(areas)
    rx = rng.uniform(size=200_000)
    ry = rng.uniform(size=200_000)
    picks = sample_alias_table(prob, index, rx, ry)
    frac1 = (picks == 1).mean()
    assert frac1 > 0.99
