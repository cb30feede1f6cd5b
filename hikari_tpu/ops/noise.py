"""Per-pixel blue-noise randoms (light.wgsl:1075-1079).

value = noise_texture[frame % 16][(pixel + frame) % 64].rgba, then
golden-ratio scrambled by frame number so sequences decorrelate over time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hikari_tpu.utils.bluenoise import load_blue_noise
from hikari_tpu.utils.math import GOLDEN_RATIO

NOISE_TEXTURE_COUNT = 16
NOISE_SIZE = 64


def noise_constant():
    """[16, 64, 64, 4] f32 constant, baked into the module once."""
    return jnp.asarray(load_blue_noise())


def sample_blue_noise(noise, frame_number, size):
    """[H, W, 4] randoms for this frame. `noise` = noise_constant().

    The texture wrap `tex[(pixel + frame) % 64]` is a TILED pattern: roll
    the 64x64 tile by the frame shift, then broadcast-tile it over the
    screen. The naive advanced-index formulation lowered to a 2M-row XLA
    gather costing ~11.9 ms/frame at 1080p (profiled); this is ~0.1 ms.
    """
    h, w = size
    tex = jax.lax.dynamic_index_in_dim(
        noise, (frame_number % NOISE_TEXTURE_COUNT).astype(jnp.int32),
        keepdims=False)
    shift = (frame_number % NOISE_SIZE).astype(jnp.int32)
    # rolled[y, x] = tex[(y + shift) % 64, (x + shift) % 64]
    rolled = jnp.roll(tex, shift=(-shift, -shift), axis=(0, 1))
    reps_y = -(-h // NOISE_SIZE)
    reps_x = -(-w // NOISE_SIZE)
    r = jnp.tile(rolled, (reps_y, reps_x, 1))[:h, :w]
    scramble = frame_number.astype(jnp.float32) * GOLDEN_RATIO
    return jnp.mod(r + scramble, 1.0)
