"""Renderer configuration.

Mirrors the reference's per-camera settings surface (`HikariSettings`,
reference src/lib.rs:402-513) and global toggles
(`HikariUniversalSettings`, src/lib.rs:375-397).

Design note (TPU): fields that pick *pipeline structure* (taa, upscale,
denoise, reuse toggles, indirect bounce count) are static — they select which
ops get traced into the jitted frame program, exactly like the reference's
shader-def pipeline specialization (src/light.rs:96-174,
src/post_process.rs:365-399). Numeric knobs (validation intervals, caps,
solar angle, clamps) are dynamic scalars in the `FrameUniform` pytree so they
can change per frame without recompiling (src/view.rs:105-193).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax.numpy as jnp
import numpy as np


class Taa(enum.Enum):
    """Temporal anti-aliasing method (reference src/lib.rs:467-472)."""

    JASMINE = "jasmine"
    NONE = "none"


class UpscaleMode(enum.Enum):
    FSR1 = "fsr1"
    SMAA_TU4X = "smaa_tu4x"
    # True pass-through (lighting at full res, no upscale pass). The reference
    # removed Upscale::None (CHANGELOG 0.3.16) in favor of SmaaTu4x ratio 1
    # (which supersamples 2x); we keep an explicit off switch for the
    # benchmark matrix ("denoise/TAA/upscale off").
    NONE = "none"


@dataclasses.dataclass(frozen=True)
class Upscale:
    """Upscaler selection (reference src/lib.rs:474-513).

    `ratio` is clamped to [1, 2]; lighting & post run at full_res / ratio and
    the upscaler fills in the rest. `sharpness` only applies to FSR1
    (0.0 = max sharpness, range [0, 2]).
    """

    mode: UpscaleMode = UpscaleMode.SMAA_TU4X
    ratio: float = 2.0
    sharpness: float = 0.0

    @staticmethod
    def fsr1(ratio: float = 2.0, sharpness: float = 0.0) -> "Upscale":
        return Upscale(UpscaleMode.FSR1, ratio, sharpness)

    @staticmethod
    def smaa_tu4x(ratio: float = 2.0) -> "Upscale":
        return Upscale(UpscaleMode.SMAA_TU4X, ratio)

    @staticmethod
    def none() -> "Upscale":
        """No upscaling: lighting runs at full resolution, no upscale pass."""
        return Upscale(UpscaleMode.NONE, 1.0)

    @property
    def clamped_ratio(self) -> float:
        return float(min(2.0, max(1.0, self.ratio)))


@dataclasses.dataclass(frozen=True)
class HikariSettings:
    """Per-camera renderer settings (reference src/lib.rs:402-464).

    Defaults match reference src/lib.rs:436-455.
    """

    direct_validate_interval: int = 3
    emissive_validate_interval: int = 5
    max_temporal_reuse_count: int = 50
    max_spatial_reuse_count: int = 800
    max_reservoir_lifetime: float = 100.0
    solar_angle: float = 0.046
    indirect_bounces: int = 1
    max_indirect_luminance: float = 10.0
    clear_color: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 1.0)
    temporal_reuse: bool = True
    emissive_spatial_reuse: bool = False
    indirect_spatial_reuse: bool = True
    denoise: bool = True
    taa: Taa = Taa.JASMINE
    upscale: Upscale = dataclasses.field(default_factory=Upscale)
    # TPU extension (not in the reference's 15 fields): trace lighting for
    # half the pixels per frame on an alternating checkerboard and
    # reconstruct the rest depth/normal-aware (ops/checkerboard.py). The
    # reference's own default already runs lighting at quarter resolution
    # (SmaaTu4x ratio 2, lib.rs:436-455); this is the same ray-count lever
    # expressed TPU-natively. Off by default for reference parity.
    checkerboard_lighting: bool = False
    # TPU extension: per-pixel decorrelation of the spatial-reuse spiral via
    # blue-noise-selected 90-degree spiral rotations (the gather-free analog
    # of light.wgsl:1566-1572's per-pixel scramble; see
    # ops/restir.spatial_reuse). Off by default: the per-frame rotation +
    # denoiser is visually close and cheaper.
    spatial_tap_scramble: bool = False

    @property
    def upscale_ratio(self) -> float:
        return self.upscale.clamped_ratio

    def static_key(self) -> tuple:
        """Fields that specialize the compiled frame program.

        Analogous to the reference's pipeline-key bitfields
        (src/light.rs:88-174, src/post_process.rs:365-399,
        src/prepass.rs:170-199).
        """
        return (
            self.taa,
            self.upscale.mode,
            self.upscale.clamped_ratio,
            self.denoise,
            self.temporal_reuse,
            self.emissive_spatial_reuse,
            self.indirect_spatial_reuse,
            self.indirect_bounces,
            self.checkerboard_lighting,
            self.spatial_tap_scramble,
        )


@dataclasses.dataclass(frozen=True)
class HikariUniversalSettings:
    """Global toggles (reference src/lib.rs:375-397)."""

    build_mesh_acceleration_structure: bool = True
    build_instance_acceleration_structure: bool = True


# 3x3 a-trous kernel, reference src/view.rs:125-129.
ATROUS_KERNEL = np.array(
    [
        [0.0625, 0.125, 0.0625],
        [0.125, 0.25, 0.125],
        [0.0625, 0.125, 0.0625],
    ],
    dtype=np.float32,
)


def halton(base: int, index: int) -> float:
    """Halton low-discrepancy sequence (reference src/shaders/utils.wgsl:52-61)."""
    result = 0.0
    f = 1.0
    i = index
    while i > 0:
        f /= base
        result += f * (i % base)
        i //= base
    return result


# 16 sub-pixel jitter points (halton bases 2 and 3, indices 0..15), stored as
# 8 vec4s of two points each — reference src/view.rs:130-139.
HALTON_JITTER = np.array(
    [[halton(2, i), halton(3, i)] for i in range(16)], dtype=np.float32
)


def make_frame_uniform(settings: HikariSettings, frame_number: int):
    """Dynamic per-frame scalar pytree (reference `FrameUniform`, src/view.rs:105-193).

    Static-specialization fields (taa/upscale/denoise/reuse toggles) are NOT
    in here — they shape the traced program instead.
    """
    return {
        "number": jnp.uint32(frame_number),
        "direct_validate_interval": jnp.uint32(settings.direct_validate_interval),
        "emissive_validate_interval": jnp.uint32(settings.emissive_validate_interval),
        "indirect_bounces": jnp.uint32(settings.indirect_bounces),
        "max_temporal_reuse_count": jnp.float32(settings.max_temporal_reuse_count),
        "max_spatial_reuse_count": jnp.float32(settings.max_spatial_reuse_count),
        # packed reservoirs store lifetime as u8 (ops/reservoir.py lane 12),
        # so a configured lifetime above the representable range would never
        # fire the expiry purge (carried lifetime saturates at 255); clamp
        # to 254 so saturated reservoirs always expire. <=1 keeps its
        # "never expire" sentinel meaning (ops/restir.py spatial_reuse).
        "max_reservoir_lifetime": jnp.float32(
            min(settings.max_reservoir_lifetime, 254.0)),
        "solar_angle": jnp.float32(settings.solar_angle),
        "max_indirect_luminance": jnp.float32(settings.max_indirect_luminance),
        "clear_color": jnp.asarray(settings.clear_color, dtype=jnp.float32),
        "upscale_ratio": jnp.float32(settings.upscale_ratio),
    }
