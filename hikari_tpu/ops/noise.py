"""Per-pixel blue-noise randoms (light.wgsl:1075-1079).

value = noise_texture[frame % 16][(pixel + frame) % 64].rgba, then
golden-ratio scrambled by frame number so sequences decorrelate over time.
"""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils.bluenoise import load_blue_noise
from hikari_tpu.utils.math import GOLDEN_RATIO

NOISE_TEXTURE_COUNT = 16
NOISE_SIZE = 64


def noise_constant():
    """[16, 64, 64, 4] f32 constant, baked into the module once."""
    return jnp.asarray(load_blue_noise())


def sample_blue_noise(noise, frame_number, size):
    """[H, W, 4] randoms for this frame. `noise` = noise_constant()."""
    h, w = size
    tex = noise[frame_number % NOISE_TEXTURE_COUNT]
    fy = (jnp.arange(h, dtype=jnp.uint32) + frame_number) % NOISE_SIZE
    fx = (jnp.arange(w, dtype=jnp.uint32) + frame_number) % NOISE_SIZE
    r = tex[fy[:, None], fx[None, :]]
    scramble = frame_number.astype(jnp.float32) * GOLDEN_RATIO
    return jnp.mod(r + scramble, 1.0)
