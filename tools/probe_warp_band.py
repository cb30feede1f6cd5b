"""On-chip probe: banded channel-plane warp vs warp2 at the TAA shape.

The reference-default frame's TAA history fetch is a 1080p warp of a
10-channel pack (catmull rgb + nearest aux). warp2 serves it in ~14 ms of
kernel + ~10 ms of HWC<->lane-pack relayouts (round-4 profile). This probe
times warp_band on the same workload split into its natural channel-plane
sources, including the source-construction cost from 2-D planes.

Usage: python tools/probe_warp_band.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from hikari_tpu.ops.warp2 import warp_multi  # noqa: E402
from hikari_tpu.ops.warp_band import warp_band  # noqa: E402


def _fields(h, w, amp=1.0, seed=0):
    rng = np.random.default_rng(seed)
    yy = (np.arange(h, dtype=np.float64))[:, None].repeat(w, 1)
    xx = (np.arange(w, dtype=np.float64))[None, :].repeat(h, 0)
    sy = yy + amp * np.sin(yy / 401.0 + 1.3) * np.cos(xx / 487.0)
    sx = xx + amp * np.cos(yy / 419.0) * np.sin(xx / 449.0 + 0.7)
    sy = sy + rng.uniform(-0.25, 0.25, (h, w))
    sx = sx + rng.uniform(-0.25, 0.25, (h, w))
    return (jnp.asarray(sy.astype(np.float32)),
            jnp.asarray(sx.astype(np.float32)))


def _time(fn, *args, reps=20):
    """Chained timing: each rep's first arg depends on the previous rep's
    output (identical independent dispatches can be collapsed by the
    runtime, reading as free)."""
    first = jnp.asarray(args[0])

    def step(x, _):
        outs = fn(x, *args[1:])
        leaf = jax.tree_util.tree_leaves(outs)[0]
        bump = (leaf.sum() * 0.0).astype(first.dtype)
        return x + bump, None

    chained = jax.jit(lambda x: jax.lax.scan(step, x, None, length=reps)[0])
    jax.block_until_ready(chained(first))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained(first))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    h, w = 1080, 1920
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.uniform(0, 1, (h, 3, w)).astype(np.float32))
    aux = jnp.asarray(rng.uniform(0, 1, (h, 6, w)).astype(np.float32))
    sy, sx = _fields(h, w)

    ms = _time(lambda a, b, y, x: warp_band(
        [a, b], ("catmull", "nearest"), y, x), rgb, aux, sy, sx)
    print(f"warp_band kernel-only (3+6ch, catmull+nearest): {ms:.2f} ms")

    # including channel-plane construction from 2-D planes (the TAA-side
    # cost replacing the HWC pack)
    planes = jnp.asarray(rng.uniform(0, 1, (9, h, w)).astype(np.float32))

    def from_planes(ps, y, x):
        a = jnp.stack([ps[i] for i in range(3)], axis=1)
        b = jnp.stack([ps[i] for i in range(3, 9)], axis=1)
        return warp_band([a, b], ("catmull", "nearest"), y, x)

    ms = _time(from_planes, planes, sy, sx)
    print(f"warp_band + plane-stack build: {ms:.2f} ms")

    # including HWC source slicing (worst case: sources arrive HWC)
    hwc = jnp.asarray(rng.uniform(0, 1, (h, w, 10)).astype(np.float32))

    def from_hwc(src, y, x):
        a = jnp.moveaxis(src[..., :3], -1, 1)
        b = jnp.moveaxis(src[..., 3:9], -1, 1)
        return warp_band([a, b], ("catmull", "nearest"), y, x)

    ms = _time(from_hwc, hwc, sy, sx)
    print(f"warp_band + HWC transpose build: {ms:.2f} ms")

    # warp2 on the same workload (its kernel + pack path)
    def w2(src, y, x):
        return warp_multi(src, y, x, [
            ("nearest", (0.0, 0.0), (3, 10)),
            ("catmull", (0.0, 0.0), (0, 3)),
        ], dtype=jnp.bfloat16)

    ms = _time(w2, hwc, sy, sx)
    print(f"warp2 (incl. pack from HWC, bf16): {ms:.2f} ms")


if __name__ == "__main__":
    main()
