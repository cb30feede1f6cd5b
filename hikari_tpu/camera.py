"""Camera, projection, and per-view uniforms.

Matches the Bevy camera conventions the reference relies on:
* right-handed, camera looks down -Z, +Y up;
* infinite reverse-Z perspective projection (depth in (0, 1], near plane at
  depth 1, GreaterEqual depth test — reference src/prepass.rs:251-266);
* `view.view_proj = projection * inverse(camera_transform)`;
* `PreviousViewUniform` carries last frame's view_proj for velocity /
  reprojection (reference src/view.rs:37-73).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def perspective_infinite_reverse_rh(fov_y: float, aspect: float, near: float) -> np.ndarray:
    """Infinite reverse-Z RH projection (glam's Mat4::perspective_infinite_reverse_rh)."""
    f = 1.0 / np.tan(0.5 * fov_y)
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = 0.0
    m[2, 3] = near
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass(frozen=True)
class PerspectiveProjection:
    """Bevy default: fov π/4, near 0.1."""

    fov_y: float = np.pi / 4.0
    near: float = 0.1

    def matrix(self, width: int, height: int) -> np.ndarray:
        return perspective_infinite_reverse_rh(self.fov_y, width / height, self.near)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """Camera-to-world matrix, looking from eye at target (RH, -Z forward)."""
    eye = np.asarray(eye, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float64)
    m[:3, 0] = right
    m[:3, 1] = true_up
    m[:3, 2] = -fwd
    m[:3, 3] = eye
    return m


@dataclasses.dataclass
class Camera:
    """A camera: world transform + projection + output resolution."""

    transform: np.ndarray  # camera-to-world 4x4
    projection: PerspectiveProjection = dataclasses.field(
        default_factory=PerspectiveProjection
    )
    width: int = 1280
    height: int = 720
    hdr: bool = False

    @staticmethod
    def from_look_at(eye, target, up=(0.0, 1.0, 0.0), **kw) -> "Camera":
        return Camera(transform=look_at(eye, target, up), **kw)

    def view_uniform(self) -> dict:
        """Per-view matrices as float32 numpy — mirrors Bevy's View uniform.

        Keys mirror the fields light.wgsl consumes: `view_proj` (projection *
        world-to-view), `inverse_view_proj`, `projection`, `inverse_projection`,
        `world_position`, `viewport` (x, y, w, h).
        """
        proj = self.projection.matrix(self.width, self.height)
        world_from_view = self.transform
        view_from_world = np.linalg.inv(world_from_view)
        view_proj = proj @ view_from_world
        return {
            "view_proj": view_proj.astype(np.float32),
            "inverse_view_proj": np.linalg.inv(view_proj).astype(np.float32),
            "projection": proj.astype(np.float32),
            "inverse_projection": np.linalg.pinv(proj).astype(np.float32),
            "view": world_from_view.astype(np.float32),
            "inverse_view": view_from_world.astype(np.float32),
            "world_position": world_from_view[:3, 3].astype(np.float32),
            "viewport": np.array(
                [0.0, 0.0, self.width, self.height], dtype=np.float32
            ),
        }


def generate_camera_rays(view: dict, size: Tuple[int, int], pixel_offset):
    """Primary ray origins/directions for every pixel (numpy reference impl).

    `pixel_offset` is the sub-pixel jitter in pixels (2,). Returns
    (origins [H,W,3], directions [H,W,3] (normalized)).

    This is the rasterizer replacement's ray generation: inverting the same
    view_proj the reference's vertex shader multiplies by
    (prepass.wgsl vertex), so G-buffer contents agree.
    """
    h, w = size
    inv_vp = view["inverse_view_proj"].astype(np.float64)
    xs = (np.arange(w) + 0.5 + pixel_offset[0]) / w
    ys = (np.arange(h) + 0.5 + pixel_offset[1]) / h
    u, v = np.meshgrid(xs, ys)
    ndc_x = u * 2.0 - 1.0
    ndc_y = (1.0 - v) * 2.0 - 1.0
    # Reverse-Z: sample the ray at two depths and take the difference.
    p_near = np.stack([ndc_x, ndc_y, np.full_like(ndc_x, 0.9), np.ones_like(ndc_x)], -1)
    p_far = np.stack([ndc_x, ndc_y, np.full_like(ndc_x, 0.1), np.ones_like(ndc_x)], -1)
    a = p_near @ inv_vp.T
    b = p_far @ inv_vp.T
    a = a[..., :3] / a[..., 3:4]
    b = b[..., :3] / b[..., 3:4]
    origin = np.broadcast_to(view["world_position"].astype(np.float64), a.shape)
    d = b - a
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return origin.astype(np.float32), d.astype(np.float32)
