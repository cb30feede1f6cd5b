"""Channel combine + Reinhard tone mapping (tone_mapping.wgsl:21-31)."""

from __future__ import annotations

import jax.numpy as jnp

from hikari_tpu.utils.math import reinhard_luminance


def tone_mapping(direct, emissive, indirect, clear_color):
    color = direct + emissive + indirect
    rgb = reinhard_luminance(jnp.maximum(color[..., :3], 0.0039))
    out = jnp.concatenate([rgb, color[..., 3:4]], -1)
    return jnp.where(color[..., 3:4] > 0.0, out,
                     jnp.broadcast_to(clear_color, out.shape))
