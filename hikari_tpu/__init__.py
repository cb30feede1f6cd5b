"""hikari_tpu — a TPU-native realtime deferred hybrid path tracer.

A ground-up rebuild of the capabilities of `cryscan/bevy-hikari` (a Rust/WGSL
realtime path tracer plugin for Bevy) as an idiomatic JAX/XLA/Pallas renderer:

* Scene compiler (CPU, numpy/C++): meshes -> world-space triangle megabuffer,
  stackless entry/exit BVH arrays, alias tables for emissive triangle sampling,
  emissive light BVH, packed material table + texture atlas.
* Frame pipeline (device, one jit program): primary-ray G-buffer prepass,
  direct/emissive/indirect lighting with next-event estimation and ReSTIR
  temporal + spatial reservoir reuse, SVGF-style a-trous denoiser, tone
  mapping, TAA, SMAA TU4X / FSR1 upscaling, bloom, overlay composite.
* Parallel scale-out: `jax.sharding.Mesh` over image rows/batch with XLA
  collectives (see `hikari_tpu.parallel`).

Reference behavior (feature parity target): /root/reference (bevy-hikari
v0.3.15); see SURVEY.md at the repo root for the layer map and citations.
"""

import os as _os

if not _os.environ.get("HIKARI_NO_COMPILE_CACHE"):
    # The full frame program is large and this environment's TPU backend
    # compiles remotely (~minutes cold). A persistent on-disk executable
    # cache makes that a one-time cost per program shape.
    import jax as _jax

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax
        pass

from hikari_tpu.config import (
    HikariSettings,
    HikariUniversalSettings,
    Taa,
    Upscale,
    UpscaleMode,
)
from hikari_tpu.camera import Camera, PerspectiveProjection, look_at
from hikari_tpu.models.material import StandardMaterial
from hikari_tpu.models.mesh import Mesh
from hikari_tpu.models.scene import Scene, DirectionalLight, AmbientLight
from hikari_tpu.renderer import Renderer

__version__ = "0.1.0"

__all__ = [
    "HikariSettings",
    "HikariUniversalSettings",
    "Taa",
    "Upscale",
    "UpscaleMode",
    "Camera",
    "PerspectiveProjection",
    "look_at",
    "StandardMaterial",
    "Mesh",
    "Scene",
    "DirectionalLight",
    "AmbientLight",
    "Renderer",
]
