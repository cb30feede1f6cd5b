"""warp_band on REAL TPU (Mosaic) vs the CPU oracle — isolates
Mosaic-vs-interpret divergences (the kernel was interpret-only until
round 5 wired it into TAA/SMAA).

Usage: python tools/debug_warp_band_tpu.py [amp]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.warp_band import R, warp_band


def _fields(h, w, amp, seed=0):
    rng = np.random.default_rng(seed)
    gy = np.linspace(0, 2 * np.pi, h)[:, None]
    gx = np.linspace(0, 2 * np.pi, w)[None, :]
    dy = amp * np.sin(gy + 0.7) * np.cos(0.5 * gx)
    dx = amp * np.cos(0.8 * gy) * np.sin(gx + 0.3)
    dy += rng.uniform(-0.2, 0.2, (h, w))
    dx += rng.uniform(-0.2, 0.2, (h, w))
    yy = np.arange(h, dtype=np.float32)[:, None] + dy
    xx = np.arange(w, dtype=np.float32)[None, :] + dx
    return jnp.asarray(yy, jnp.float32), jnp.asarray(xx, jnp.float32)


def main():
    amp = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    rng = np.random.default_rng(3)
    H, W = 192, 384
    s1 = jnp.asarray(rng.uniform(0, 1, (H, 3, W)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0, 1, (H, 6, W)).astype(np.float32))
    sy, sx = _fields(H, W, amp)

    print("devices:", jax.devices())
    got = warp_band([s1, s2, s1], ("catmull", "nearest", "bilinear"),
                    sy, sx)
    got = [np.asarray(o) for o in got]
    want = warp_band([s1, s2, s1], ("catmull", "nearest", "bilinear"),
                     sy, sx, interpret=True)
    want = [np.asarray(o) for o in want]
    for i, (o, wn) in enumerate(zip(got, want)):
        d = np.abs(o - wn)
        frac = (d > 1e-3).mean()
        print(f"src{i}: max {d.max():.3e} frac>{1e-3:g} {frac:.2%}")
        if d.max() > 1e-3:
            bad = np.argwhere(d > 1e-3)
            print("   first bad:", bad[:5].tolist())
            r0, c0, x0 = bad[0]
            print("   got", o[r0, c0, x0], "want", wn[r0, c0, x0])


if __name__ == "__main__":
    main()
