"""In-band fraction of the banded reprojection gather under camera paths.

The banded gather (ops/reproj_gather.py) accepts a pixel only when its
source offset deviates <= +-R px from its 8x128-group mean (x) / row-group
mean (y). Pans are exact; zoom and rotation produce offsets that vary
LINEARLY across a group — this probe measures the accepted ("in-band")
fraction per motion type at 1080p so the history-loss exposure is a
number, not a guess (VERDICT r3 item 4).

Motion model (per frame, screen-space source coords):
  pan:    (py, px) = (y + ty, x + tx)
  zoom:   (py, px) = c + (1 + s) * (p - c)        [s = scale/frame]
  rotate: (py, px) = c + R(theta) (p - c)         [theta rad/frame]

Prints a table of in-band fraction vs motion magnitude. Pure host-side
geometry (reuses _group_pack), no TPU needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# pure host geometry: force CPU (the container's sitecustomize overrides
# JAX_PLATFORMS and would queue behind TPU work otherwise)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops import reproj_gather as rg


def in_band_fraction(piy, pix, h, w):
    """Fraction of pixels the banded gather accepts (code >= 0), computed
    with the kernel's own _group_pack (margins + clamps included)."""
    my, mx = rg.GROUP_H, rg.CHUNK
    hs_p = h + 2 * my
    ws_p = -(-(w + 2 * mx) // rg.CHUNK) * rg.CHUNK
    hp = -(-h // rg.GROUP_H) * rg.GROUP_H
    wp = -(-w // rg.GROUP_W) * rg.GROUP_W
    piy_p = jnp.pad(jnp.asarray(piy, jnp.int32) + my,
                    ((0, hp - h), (0, wp - w)), constant_values=-1)
    pix_p = jnp.pad(jnp.asarray(pix, jnp.int32) + mx,
                    ((0, hp - h), (0, wp - w)), constant_values=-1)
    _, code = rg._group_pack(piy_p, pix_p, my + h, mx + w, hp, wp,
                             hs_p, ws_p)
    code = np.asarray(code)[:h, :w]
    live = (np.asarray(piy) >= 0) & (np.asarray(piy) < h) \
        & (np.asarray(pix) >= 0) & (np.asarray(pix) < w)
    return (code[live] >= 0).mean(), live.mean()


def motion_coords(kind, mag, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    if kind == "pan":
        py, px = yy + mag, xx + 2.0 * mag
    elif kind == "zoom":
        py = cy + (1.0 + mag) * (yy - cy)
        px = cx + (1.0 + mag) * (xx - cx)
    elif kind == "rotate":
        c, s = np.cos(mag), np.sin(mag)
        py = cy + c * (yy - cy) - s * (xx - cx)
        px = cx + s * (yy - cy) + c * (xx - cx)
    else:
        raise ValueError(kind)
    return np.round(py).astype(np.int32), np.round(px).astype(np.int32)


def main():
    h, w = 1080, 1920
    rows = []
    for kind, mags, unit in (
            ("pan", [0.0, 3.7, 17.2], "px/frame"),
            ("zoom", [0.002, 0.005, 0.01, 0.02], "scale/frame"),
            ("rotate", [0.002, 0.005, 0.01, 0.02], "rad/frame")):
        for m in mags:
            piy, pix = motion_coords(kind, m, h, w)
            frac, live = in_band_fraction(piy, pix, h, w)
            rows.append((kind, m, unit, frac, live))
            print(f"{kind:7s} {m:7.3f} {unit:12s} in-band {frac*100:6.2f}% "
                  f"(live {live*100:5.1f}%)", flush=True)
    return rows


if __name__ == "__main__":
    main()
