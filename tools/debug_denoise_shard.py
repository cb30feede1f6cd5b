"""Standalone sharded-vs-single parity check of the fused denoiser island
at a non-divisible row count (h=44, 8 shards, nch=3) — isolates the 44-row
in-frame delta from the rest of the pipeline.

Usage: python tools/debug_denoise_shard.py [h] [w] [nch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
_fl = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _fl:
    os.environ["XLA_FLAGS"] = (
        _fl + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops.denoise import denoise_channels
from hikari_tpu.parallel import shard as _sh
from hikari_tpu.parallel.mesh import make_mesh


def _inputs(h, w, nch, seed=0):
    rng = np.random.default_rng(seed)
    if os.environ.get("DBG_FLAT", "1") == "1":
        # FLAT geometry: constant normal / single instance / smooth depth
        # so every tap's edge-stopping weight ~ 1 (random geometry buries
        # cross-shard deltas under ~0 weights)
        normal = np.broadcast_to(
            np.asarray([0.0, 0.0, 1.0], np.float32), (h, w, 3)).copy()
        depth = (0.5 + 0.001 * np.arange(h, dtype=np.float32))[:, None]
        depth = np.broadcast_to(depth, (h, w)).copy()
        g = {
            "position": np.concatenate(
                [rng.normal(size=(h, w, 3)).astype(np.float32),
                 depth[..., None]], -1),
            "normal": normal,
            "depth_gradient": np.full((h, w, 2), 0.001, np.float32),
            "instance_material": np.stack(
                [np.full((h, w), 2.5, np.float32),
                 np.zeros((h, w), np.float32)], -1),
        }
        albedo = rng.uniform(0.05, 1.0, size=(h, w, 4)).astype(np.float32)
        chans = []
        for c in range(nch):
            render = rng.uniform(0.0, 3.0, size=(h, w, 4)).astype(
                np.float32)
            var = rng.uniform(0.0, 0.5, size=(h, w)).astype(np.float32)
            chans.append((jnp.asarray(render), jnp.asarray(var), c > 0))
        return jax.tree.map(jnp.asarray, g), jnp.asarray(albedo), chans
    normal = rng.normal(size=(h, w, 3)).astype(np.float32)
    normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True),
                         1e-6)
    depth = rng.uniform(0.05, 1.0, size=(h, w)).astype(np.float32)
    g = {
        "position": np.concatenate(
            [rng.normal(size=(h, w, 3)).astype(np.float32),
             depth[..., None]], -1),
        "normal": normal * rng.uniform(0.5, 2.0, size=(h, w, 1)),
        "depth_gradient": (rng.normal(size=(h, w, 2)) * 0.01).astype(
            np.float32),
        "instance_material": np.stack(
            [rng.integers(0, 5, size=(h, w)).astype(np.float32) + 0.5,
             np.zeros((h, w), np.float32)], -1),
    }
    albedo = rng.uniform(0.05, 1.0, size=(h, w, 4)).astype(np.float32)
    chans = []
    for c in range(nch):
        render = rng.uniform(0.0, 3.0, size=(h, w, 4)).astype(np.float32)
        var = rng.uniform(0.0, 0.5, size=(h, w)).astype(np.float32)
        chans.append((jnp.asarray(render), jnp.asarray(var), c > 0))
    return jax.tree.map(jnp.asarray, g), jnp.asarray(albedo), chans


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 44
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nch = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    g, albedo, chans = _inputs(h, w, nch)
    frame = {"number": jnp.uint32(7)}

    ref = denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                           fused=True)

    mesh = make_mesh(8)
    ffs = tuple(ff for _, _, ff in chans)

    def run(g, albedo, rvs):
        cl = [(r, v, ff) for (r, v), ff in zip(rvs, ffs)]
        return denoise_channels(g, albedo, cl, frame, (h, w), 1.0,
                                fused=True)

    rvs = [(r, v) for r, v, _ in chans]
    with _sh.row_mesh(mesh):
        got = jax.jit(run)(g, albedo, rvs)

    for c, (r, o) in enumerate(zip(ref, got)):
        r, o = np.asarray(r), np.asarray(o)
        d = np.abs(r - o)
        rows = np.nonzero(d.max(axis=(1, 2)) > 1e-4)[0].tolist()
        print(f"ch{c}: max delta {d.max():.3e} rows>{1e-4:g}: {rows[:24]}")


if __name__ == "__main__":
    main()
