"""Checkerboard lighting: trace lighting for half the pixels per frame.

TPU-idiomatic ray-count reduction (the analog — and extension — of the
reference's quarter-res lighting default, lib.rs:436-455 SmaaTu4x{2.0} +
smaa.wgsl:93-103 checkerboard upscaling): each frame, lighting channels run
only for pixels with (x + y + frame) % 2 == 0, laid out densely as an
[h, w/2] "compressed" domain so every kernel keeps full vector utilization.
The other half is reconstructed depth/normal-aware from same-frame
neighbors; with temporal reuse on, the full-res reservoir carry keeps the
inactive half's reservoirs alive so temporal/spatial ReSTIR still sees every
pixel (each pixel's reservoir refreshes every 2 frames).

All index maps here are affine (strided slices + row-parity selects) — no
gathers (see PERF.md: arbitrary row gathers cost ~24-40 ns/row on this TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_parity(frame_number):
    """Traced scalar parity in {0, 1}."""
    return (frame_number & 1).astype(jnp.int32)


def _row_even(par, h, ndim_tail):
    """[h, 1, ...] bool: True where the row's active pixels sit at even x."""
    rowpar = (jnp.arange(h, dtype=jnp.int32) + par) % 2
    return (rowpar == 0).reshape((h, 1) + (1,) * ndim_tail)


def active_mask(par, size):
    """[h, w] bool: True at pixels lit this frame ((x+y+par) % 2 == 0)."""
    h, w = size
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    return ((xx + yy + par) % 2) == 0


def compress(x, par):
    """[h, w, ...] -> [h, w/2, ...]: keep each row's active pixels
    (out[y, i] = x[y, 2i + (y+par)%2]). Requires even w."""
    h, w = x.shape[:2]
    assert w % 2 == 0, "checkerboard needs an even render width"
    # NOTE: `x[:, 0::2]` lowers to a gather on this jax, but in-context it
    # FUSES with its producers; the "faster" isolated variants (reshape-pair
    # 3.6 ms vs gather 5.9 ms, tools/probe_compress.py) regressed the full
    # frame 44.2 -> ~53 ms by breaking that fusion. Measured, not guessed.
    even = x[:, 0::2]
    odd = x[:, 1::2]
    return jnp.where(_row_even(par, h, x.ndim - 2), even, odd)


def expand(a, par, fill=0.0):
    """[h, w/2, ...] -> [h, w, ...] with `fill` at inactive pixels."""
    h, hw = a.shape[:2]
    z = jnp.full_like(a, fill)
    at_even = jnp.stack([a, z], axis=2).reshape((h, 2 * hw) + a.shape[2:])
    at_odd = jnp.stack([z, a], axis=2).reshape((h, 2 * hw) + a.shape[2:])
    return jnp.where(_row_even(par, h, a.ndim - 2), at_even, at_odd)


def pixel_uv(render_size, par):
    """True-pixel-center uv of each compressed-domain pixel [h, w/2, 2]."""
    h, w = render_size
    o = (jnp.arange(h, dtype=jnp.int32)[:, None] + par) % 2
    xs = 2 * jnp.arange(w // 2, dtype=jnp.int32)[None, :] + o  # [h, w/2]
    u = (xs.astype(jnp.float32) + 0.5) / w
    v = jnp.broadcast_to(
        ((jnp.arange(h, dtype=jnp.float32) + 0.5) / h)[:, None], u.shape)
    return jnp.stack([u, v], axis=-1)


def _shift(x, dy, dx):
    """Static shift with edge clamp: out[p] = x[p + (dy, dx)].

    Slice+concat formulation — the index-array form lowered to gathers and
    layout-changing copies on TPU (profiled ~0.2 ms each at 1080p)."""
    if dy > 0:
        x = jnp.concatenate([x[dy:], jnp.repeat(x[-1:], dy, axis=0)], axis=0)
    elif dy < 0:
        x = jnp.concatenate([jnp.repeat(x[:1], -dy, axis=0), x[:dy]], axis=0)
    if dx > 0:
        x = jnp.concatenate(
            [x[:, dx:], jnp.repeat(x[:, -1:], dx, axis=1)], axis=1)
    elif dx < 0:
        x = jnp.concatenate(
            [jnp.repeat(x[:, :1], -dx, axis=1), x[:, :dx]], axis=1)
    return x


def reconstruct(full, mask, depth, normal):
    """Fill inactive pixels of `full` [h, w, c] from their 4 active
    neighbors, gated by depth ratio and normal agreement (the same gates the
    reference's spatial reuse uses, light.wgsl:1586-1599).

    mask: [h, w] bool active. depth/normal: full-res G-buffer planes.
    Inactive pixels with no admissible neighbor keep 0.
    """
    num = jnp.zeros_like(full)
    den = jnp.zeros((full.shape[0], full.shape[1]), full.dtype)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = _shift(full, dy, dx)
        nb_depth = _shift(depth, dy, dx)
        nb_normal = _shift(normal, dy, dx)
        ratio = depth / jnp.where(nb_depth == 0.0, 1e-30, nb_depth)
        ok = (nb_depth > 0.0) & (ratio >= 0.9) & (ratio <= 1.1)
        ok &= jnp.sum(normal * nb_normal, -1) >= 0.866
        wgt = ok.astype(full.dtype)
        num = num + wgt[..., None] * nb
        den = den + wgt
    # fallback: plain 4-neighbor average when all gates fail (edges)
    num_f = jnp.zeros_like(full)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        num_f = num_f + _shift(full, dy, dx)
    recon = jnp.where(den[..., None] > 0.0, num / jnp.maximum(den, 1.0)[..., None],
                      num_f * 0.25)
    return jnp.where(mask[..., None], full, recon)


def merge_packed(new_packed_c, old_packed_full, par):
    """Scatter a compressed packed-reservoir tensor into the full-res carry:
    active pixels take this frame's reservoirs, inactive keep last frame's."""
    h, w = old_packed_full.shape[:2]
    mask = active_mask(par, (h, w))
    return jnp.where(mask[..., None], expand(new_packed_c, par),
                     old_packed_full)


def merge_packed_planes(new_c, old_full, par):
    """merge_packed for the channel-plane layout: new_c [h, F, w/2],
    old_full [h, F, w]."""
    h, F, w = old_full.shape
    a = new_c
    z = jnp.zeros_like(a)
    at_even = jnp.stack([a, z], axis=3).reshape(h, F, w)
    at_odd = jnp.stack([z, a], axis=3).reshape(h, F, w)
    expanded = jnp.where(_row_even(par, h, 0)[:, None, :1], at_even, at_odd)
    mask = active_mask(par, (h, w))[:, None, :]
    return jnp.where(mask, expanded, old_full)
