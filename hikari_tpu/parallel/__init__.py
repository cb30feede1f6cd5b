"""Multi-chip scale-out: device mesh + sharding specs + sharded frame step.

The reference is single-GPU (SURVEY.md §2.4); its pixel-grid workgroups map
to SPMD sharding of the image rows across a TPU mesh via `jax.sharding`,
with the scene (triangles, BVH, materials) replicated and XLA inserting the
halo/reprojection collectives over ICI.
"""

from hikari_tpu.parallel.mesh import make_mesh, shard_frame  # noqa: F401
