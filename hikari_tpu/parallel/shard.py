"""Manual row-sharding (shard_map islands) for the fused Pallas kernels.

GSPMD cannot partition a Pallas custom-call: on a real multi-chip TPU a
row-sharded jit would all-gather every kernel input and replicate the
kernel work, erasing the scaling the rest of the pipeline gets for free
(SURVEY.md §2.4). Each fused kernel therefore runs inside a
`jax.shard_map` island over the row axis when a mesh is active:

* pixel-local kernels (fused prepass, fused lighting): plain row blocks,
  plus a global-row offset fed to the kernels that generate rays from
  their row index;
* stencil kernels (fused a-trous level): ppermute halo rows before the
  call (zero halos at the frame edge — the kernels' own out-of-image tap
  masks cover them);
* window kernels (banded reprojection gather): bounded halo rows with
  coordinate rebasing; sources beyond the halo band reject exactly like
  single-chip out-of-band residuals.

The mesh context is set at trace time (`with row_mesh(mesh): ...` around
the frame trace — parallel/mesh.py:shard_frame does this); single-chip
traces leave it unset and every kernel takes its plain path.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

AXIS = "sp"

_MESH = contextvars.ContextVar("hikari_row_mesh", default=None)


def active_mesh():
    return _MESH.get()


@contextlib.contextmanager
def row_mesh(mesh):
    tok = _MESH.set(mesh)
    try:
        yield
    finally:
        _MESH.reset(tok)


def nshards(mesh) -> int:
    return mesh.shape[AXIS]


def smap(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def row_spec(ndim: int, axis: int = 0):
    spec = [None] * ndim
    spec[axis] = AXIS
    return P(*spec)


def pad_rows_to(x, mult: int, axis: int = 0):
    """Edge-pad rows so the row count divides `mult` (sharding needs equal
    blocks). Returns (padded, original_rows)."""
    h = x.shape[axis]
    hp = -(-h // mult) * mult
    if hp == h:
        return x, h
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, hp - h)
    return jnp.pad(x, pad, mode="edge"), h


def halo_rows(x, up: int, down: int, n: int, axis: int = 0,
              edge: str = "zero"):
    """Inside a shard_map body: extend the local row block with `up` rows
    from the previous shard and `down` rows from the next.

    edge="zero": zeros at the mesh edges — callers mask or reject reads
    there (reservoir gathers: a zero decodes as the empty reservoir).
    edge="replicate": the mesh-edge shards replicate their own boundary
    row into the missing halo — bit-matching the single-device samplers'
    clamp-to-edge padding (value warps MUST use this: a zero halo under a
    catmull/nearest tap fabricates in-gamut 0.0s at the image border)."""
    if up == 0 and down == 0:
        return x
    assert up <= x.shape[axis] and down <= x.shape[axis], (
        "halo exceeds the local shard extent (single-hop ppermute)")

    def take(a, sl):
        idx = [slice(None)] * a.ndim
        idx[axis] = sl
        return a[tuple(idx)]

    def rep(sl, count):
        row = take(x, sl)
        reps = [1] * x.ndim
        reps[axis] = count
        return jnp.tile(row, reps)

    idx = jax.lax.axis_index(AXIS)
    parts = []
    if up:
        top = jax.lax.ppermute(take(x, slice(-up, None)), AXIS,
                               [(i, i + 1) for i in range(n - 1)])
        if edge == "replicate":
            top = jnp.where(idx == 0, rep(slice(0, 1), up), top)
        parts.append(top)
    parts.append(x)
    if down:
        bot = jax.lax.ppermute(take(x, slice(0, down)), AXIS,
                               [(i + 1, i) for i in range(n - 1)])
        if edge == "replicate":
            bot = jnp.where(idx == n - 1,
                            rep(slice(x.shape[axis] - 1, None), down), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=axis)
