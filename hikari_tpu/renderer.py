"""Top-level Renderer: owns the compiled scene, per-settings jitted frame
program, and the frame carry. The analog of attaching `HikariSettings` to a
camera driving the "hikari" render graph (reference src/lib.rs:95-370).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from hikari_tpu.camera import Camera
from hikari_tpu.config import HikariSettings, make_frame_uniform
from hikari_tpu.frame import build_render_frame, init_carry
from hikari_tpu.models.scene import GpuScene, Scene
from hikari_tpu.ops.noise import noise_constant
from hikari_tpu.ops.post import overlay_compose
from hikari_tpu.ops.trace import make_tracer


class Renderer:
    def __init__(self, scene: Union[Scene, GpuScene], camera: Camera,
                 settings: Optional[HikariSettings] = None,
                 brute_force_max: int = 4096):
        self.settings = settings or HikariSettings()
        self.camera = camera
        self.host_scene = scene if isinstance(scene, Scene) else None
        self.gpu_scene = scene.compile() if isinstance(scene, Scene) else scene
        self.scene_dev = self.gpu_scene.as_pytree()
        self.noise = noise_constant()
        self.full_size = (camera.height, camera.width)
        self.no_texture = self.gpu_scene.num_textures == 0
        self.tracer = make_tracer(self.gpu_scene.num_triangles,
                                  brute_force_max=brute_force_max)
        self._frame_fn = jax.jit(build_render_frame(
            self.settings, self.full_size, self.tracer, self.no_texture))
        self.carry = init_carry(self.full_size, self.settings)
        self._frame_index = 0
        self._prev_view_initialized = False

    # ------------------------------------------------------------------
    def _views(self):
        vu = self.camera.view_uniform()
        return {k: jnp.asarray(v) for k, v in vu.items()}

    def reset(self):
        self.carry = init_carry(self.full_size, self.settings)
        self._frame_index = 0
        self._prev_view_initialized = False

    def update_scene(self, scene: Scene):
        """Recompile the scene (transform changes, asset churn)."""
        self.gpu_scene = scene.compile()
        self.scene_dev = self.gpu_scene.as_pytree()

    def render_frame(self) -> jnp.ndarray:
        """Render one frame; returns the final [H,W,4] image (device array).

        The first frame seeds the previous-view matrices with the current
        ones (zero velocity), like the reference's PreviousViewUniform
        initialization.
        """
        view = self._views()
        if not self._prev_view_initialized:
            self.carry["prev_view_proj"] = view["view_proj"]
            self.carry["prev_inverse_view_proj"] = view["inverse_view_proj"]
            self._prev_view_initialized = True
        frame = make_frame_uniform(self.settings, self._frame_index)
        image, albedo, self.carry = self._frame_fn(
            self.scene_dev, view, frame, self.noise, self.carry)
        self._frame_index += 1
        return overlay_compose(image, albedo, self.camera.hdr)

    def render(self, frames: int = 1) -> np.ndarray:
        """Render `frames` frames, return the last as [H,W,4] float numpy."""
        img = None
        for _ in range(frames):
            img = self.render_frame()
        return np.asarray(img)

    @staticmethod
    def to_srgb_u8(img: np.ndarray) -> np.ndarray:
        rgb = np.clip(img[..., :3], 0.0, 1.0)
        srgb = np.where(rgb <= 0.0031308, 12.92 * rgb,
                        1.055 * rgb ** (1 / 2.4) - 0.055)
        return (srgb * 255.0 + 0.5).astype(np.uint8)

    def save_png(self, path: str, img: Optional[np.ndarray] = None):
        from PIL import Image

        if img is None:
            img = np.asarray(self.render_frame())
        Image.fromarray(self.to_srgb_u8(img)).save(path)
