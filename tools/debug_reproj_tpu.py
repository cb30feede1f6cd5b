"""reproj_gather on REAL TPU (Mosaic) vs interpret oracle — checks the
round-5 kernel changes (3-chunk window, wide/narrow branches, packed o
radix) on hardware.

Usage: python tools/debug_reproj_tpu.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.reproj_gather import reproj_gather


def main():
    rng = np.random.default_rng(5)
    H, W, F = 192, 384, 16
    srcs = [jnp.asarray(rng.uniform(0, 1, (H, F, W)).astype(np.float32))
            for _ in range(2)]
    yy = np.arange(H, dtype=np.int32)[:, None] + rng.integers(
        -2, 3, (H, 1), endpoint=False)
    xx = np.arange(W, dtype=np.int32)[None, :] + rng.integers(
        -2, 3, (1, W), endpoint=False)
    piy = jnp.asarray(np.broadcast_to(yy, (H, W)).copy())
    pix = jnp.asarray(np.broadcast_to(xx, (H, W)).copy())

    print("devices:", jax.devices())
    got = [np.asarray(o) for o in reproj_gather(srcs, piy, pix)]
    want = [np.asarray(o)
            for o in reproj_gather(srcs, piy, pix, interpret=True)]
    for i, (o, wn) in enumerate(zip(got, want)):
        d = np.abs(o - wn)
        print(f"src{i}: max {np.nanmax(d):.3e} "
              f"frac>{1e-5:g} {(d > 1e-5).mean():.2%}")


if __name__ == "__main__":
    main()
