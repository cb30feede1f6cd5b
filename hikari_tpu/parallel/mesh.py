"""Device mesh + sharding rules for the frame pipeline.

Sharding model (the TPU-native replacement for the reference's 8x8 GPU
workgroups over the pixel grid, SURVEY.md §2.4):

* axis "sp" (spatial/scanline parallelism): image rows. Every per-pixel
  tensor ([H,W,...] or [h,w,...]) is sharded along dim 0.
* the scene (triangle megabuffer, BVH, materials, atlas) is replicated —
  every chip traces its own rays against a full local copy, exactly like
  every GPU workgroup reads the same scene buffers.
* spatial footprints (a-trous taps <= 8px x step, spatial-reuse taps <= 20px,
  temporal reprojection gathers) become XLA-inserted halo exchanges /
  collective permutes over ICI under GSPMD — no hand-written NCCL analog.

A "dp" axis (independent cameras/frames in a batch) can be layered on top;
for the renderer the wide axis is sp.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _row_sharded(mesh: Mesh, rows: int, ndim: int, axis: str = "sp"):
    n = mesh.shape[axis]
    if ndim >= 2 and rows % n == 0 and rows >= n:
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


def pixel_sharding(mesh: Mesh, tree, row_sizes):
    """Sharding pytree: shard dim-0 of arrays whose first dim is one of
    `row_sizes` (the image heights in play); replicate everything else."""
    def spec(x):
        shape = np.shape(x)
        if len(shape) >= 2 and shape[0] in row_sizes:
            return _row_sharded(mesh, shape[0], len(shape))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def replicated(mesh: Mesh, tree):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_frame(frame_fn, mesh: Mesh, scene, view, frame, noise, carry,
                row_sizes):
    """jit the frame function with row sharding over the mesh.

    Returns (jitted_fn, sharded_args). GSPMD partitions every per-pixel pass
    by rows and inserts halo collectives for the stencil/reprojection
    gathers.
    """
    from hikari_tpu.parallel import shard as _shard

    in_shardings = (
        replicated(mesh, scene),
        replicated(mesh, view),
        replicated(mesh, frame),
        replicated(mesh, noise),
        pixel_sharding(mesh, carry, row_sizes),
    )

    def fn_meshed(*a):
        # trace-time mesh context: the fused Pallas kernels read it and
        # run as shard_map islands (parallel/shard.py) — GSPMD cannot
        # partition a custom-call, so without this a real multi-chip run
        # would all-gather every kernel input and replicate the work
        with _shard.row_mesh(mesh):
            return frame_fn(*a)

    jfn = jax.jit(fn_meshed, in_shardings=in_shardings)
    args = jax.tree.map(jax.device_put, (scene, view, frame, noise, carry),
                        in_shardings)
    return jfn, args
