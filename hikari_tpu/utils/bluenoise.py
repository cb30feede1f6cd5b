"""Blue-noise texture generation (void-and-cluster, Ulichney 1993).

The reference ships 16 prebuilt 64x64 RGBA blue-noise PNGs
(src/noise/LDR_RGBA_*.png, loaded in src/lib.rs:189-219) used to decorrelate
per-pixel sampling (light.wgsl:1075-1079). We generate an equivalent set
ourselves (64 independent 64x64 planes = 16 textures x RGBA) and cache the
result under hikari_tpu/assets/blue_noise.npz.
"""

from __future__ import annotations

import os

import numpy as np

SIZE = 64
COUNT = 16  # textures
CHANNELS = 4

_ASSET = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets", "blue_noise.npz")


def _toroidal_gaussian(size: int, sigma: float) -> np.ndarray:
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    dx, dy = np.meshgrid(d, d)
    return np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))


def _rank_plane(rng: np.random.Generator, size: int = SIZE, sigma: float = 1.9) -> np.ndarray:
    """One blue-noise plane of ranks in [0, size*size)."""
    n = size * size
    kernel = _toroidal_gaussian(size, sigma)

    def energy_add(energy, y, x, sign):
        energy += sign * np.roll(np.roll(kernel, y, axis=0), x, axis=1)

    # --- initial binary pattern: 10% random ones, relaxed
    ones = n // 10
    pattern = np.zeros((size, size), bool)
    idx = rng.choice(n, ones, replace=False)
    pattern.flat[idx] = True
    energy = np.zeros((size, size))
    for i in idx:
        energy_add(energy, i // size, i % size, +1.0)

    for _ in range(n):
        e_ones = np.where(pattern, energy, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e_ones), e_ones.shape)
        pattern[cy, cx] = False
        energy_add(energy, cy, cx, -1.0)
        e_zeros = np.where(pattern, np.inf, energy)
        vy, vx = np.unravel_index(np.argmin(e_zeros), e_zeros.shape)
        pattern[vy, vx] = True
        energy_add(energy, vy, vx, +1.0)
        if (vy, vx) == (cy, cx):
            break

    rank = np.zeros((size, size), np.int32)

    # --- phase 1: remove tightest clusters, rank ones-1 .. 0
    p = pattern.copy()
    e = energy.copy()
    for r in range(ones - 1, -1, -1):
        masked = np.where(p, e, -np.inf)
        y, x = np.unravel_index(np.argmax(masked), masked.shape)
        p[y, x] = False
        energy_add(e, y, x, -1.0)
        rank[y, x] = r

    # --- phase 2: fill largest voids, rank ones .. n/2-1
    p = pattern.copy()
    e = energy.copy()
    half = n // 2
    for r in range(ones, half):
        masked = np.where(p, np.inf, e)
        y, x = np.unravel_index(np.argmin(masked), masked.shape)
        p[y, x] = True
        energy_add(e, y, x, +1.0)
        rank[y, x] = r

    # --- phase 3: treat 0s as the minority, remove their tightest clusters
    q = ~p
    e = np.zeros((size, size))
    ys, xs = np.nonzero(q)
    for y, x in zip(ys, xs):
        energy_add(e, y, x, +1.0)
    for r in range(half, n):
        masked = np.where(q, e, -np.inf)
        y, x = np.unravel_index(np.argmax(masked), masked.shape)
        q[y, x] = False
        energy_add(e, y, x, -1.0)
        rank[y, x] = r

    return rank


def generate(seed: int = 0) -> np.ndarray:
    """[COUNT, SIZE, SIZE, CHANNELS] float32 in [0, 1)."""
    rng = np.random.default_rng(seed)
    planes = np.stack(
        [_rank_plane(rng) for _ in range(COUNT * CHANNELS)]
    ).astype(np.float32) / float(SIZE * SIZE)
    return planes.reshape(COUNT, CHANNELS, SIZE, SIZE).transpose(0, 2, 3, 1).copy()


def load_blue_noise() -> np.ndarray:
    """Load (or generate+cache) the blue-noise stack."""
    if os.path.exists(_ASSET):
        return np.load(_ASSET)["noise"]
    noise = generate()
    os.makedirs(os.path.dirname(_ASSET), exist_ok=True)
    np.savez_compressed(_ASSET, noise=noise)
    return noise


if __name__ == "__main__":
    n = load_blue_noise()
    print("blue noise:", n.shape, n.dtype, n.min(), n.max())
