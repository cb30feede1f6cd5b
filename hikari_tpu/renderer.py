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
from hikari_tpu.frame import (build_render_frame, init_carry,
                              spatial_fused_active)
from hikari_tpu.models.scene import GpuScene, Scene
from hikari_tpu.ops.noise import noise_constant
from hikari_tpu.ops.post import overlay_compose
from hikari_tpu.ops.trace import make_tracer


class Renderer:
    """Owns the per-camera pipeline.

    The post-overlay chain mirrors the reference's graph tail
    (OVERLAY -> BLOOM -> TONEMAPPING -> FXAA -> UPSCALING, lib.rs:342-365):
    for HDR cameras the overlay un-maps Reinhard, bloom runs on HDR, then
    the final tonemap re-maps; `bloom_settings`/`fxaa` control the Bevy-node
    equivalents.
    """

    def __init__(self, scene: Union[Scene, GpuScene], camera: Camera,
                 settings: Optional[HikariSettings] = None,
                 brute_force_max: Optional[int] = None,
                 bloom_settings=None, fxaa: bool = False):
        self.settings = settings or HikariSettings()
        self.camera = camera
        self.bloom_settings = bloom_settings
        self.fxaa = fxaa
        self.host_scene = scene if isinstance(scene, Scene) else None
        self.gpu_scene = scene.compile() if isinstance(scene, Scene) else scene
        self.scene_dev = self.gpu_scene.as_pytree()
        self.noise = noise_constant()
        self.full_size = (camera.height, camera.width)
        self.no_texture = self.gpu_scene.num_textures == 0
        tracer_kw = ({} if brute_force_max is None
                     else dict(brute_force_max=brute_force_max))
        self.tracer = make_tracer(self.gpu_scene.num_triangles, **tracer_kw)
        # donate the carry: the previous frame's reservoirs/history buffers
        # are dead once the new carry exists (the functional analog of the
        # reference's in-place ping-pong buffers)
        self._frame_fn = jax.jit(
            build_render_frame(self.settings, self.full_size, self.tracer,
                               self.no_texture,
                               num_emissives=self.gpu_scene.num_emissives,
                               has_sun=self.gpu_scene.has_sun),
            donate_argnums=(4,))
        self._post_fn = jax.jit(self._build_post_overlay())
        self.carry = self._fresh_carry()
        self._frame_index = 0
        self._prev_view_initialized = False

    def _fresh_carry(self):
        # distinct buffers everywhere: the carry is donated each frame, and
        # aliased/deduped constants would trip XLA's donation checks.
        # The spatial-carry layout must match the pipeline the frame fn
        # picks (channel-plane for the fused spatial path) — same predicate
        sp_planes = spatial_fused_active(
            self.scene_dev, self.settings, self.tracer, self.no_texture,
            self.gpu_scene.num_emissives, self.gpu_scene.has_sun,
            self.full_size)
        return jax.tree.map(
            lambda a: a + jnp.zeros_like(a),
            init_carry(self.full_size, self.settings,
                       spatial_planes=sp_planes))

    # ------------------------------------------------------------------
    def _views(self):
        # cached on camera pose/projection bytes: re-uploading 4 matrices per
        # frame costs ~2 ms of host->device traffic through the axon tunnel.
        # Camera is a mutable dataclass, so identity alone is not a safe key.
        cam = self.camera
        key = (cam.transform.tobytes(), cam.width, cam.height,
               cam.projection.fov_y, cam.projection.near)
        if getattr(self, "_view_cache_key", None) != key:
            vu = cam.view_uniform()
            self._view_cache = {k: jnp.asarray(v) for k, v in vu.items()}
            self._view_cache_key = key
        return self._view_cache

    def reset(self):
        self.carry = self._fresh_carry()
        self._frame_index = 0
        self._prev_view_initialized = False

    def update_settings(self, **changes):
        """Live settings retune — the functional analog of the reference's
        egui inspector (examples/cornell.rs:26 WorldInspectorPlugin).

        Dynamic fields (validation intervals, reuse caps, lifetime, solar
        angle, bounce clamp, clear color) ride the per-frame FrameUniform,
        so they apply NEXT frame with zero recompilation. Changing a
        static-key field (taa/upscale/denoise/reuse toggles/bounce count —
        config.static_key) rebuilds the pipeline like the reference's
        pipeline-cache respecialization."""
        import dataclasses

        old_key = self.settings.static_key()
        self.settings = dataclasses.replace(self.settings, **changes)
        if self.settings.static_key() != old_key:
            self._frame_fn = jax.jit(
                build_render_frame(
                    self.settings, self.full_size, self.tracer,
                    self.no_texture,
                    num_emissives=self.gpu_scene.num_emissives,
                    has_sun=self.gpu_scene.has_sun),
                donate_argnums=(4,))
            # settings-specialized caches must respecialize too — a stale
            # _debug_fn would run the OLD pipeline (and crash on a carry
            # shape change)
            if hasattr(self, "_debug_fn"):
                del self._debug_fn
            self.carry = self._fresh_carry()
            self._frame_index = 0

    def update_scene(self, scene: Scene, fast: bool = False,
                     device: bool = True):
        """Refresh the device scene. fast=True keeps topology and refits
        (per-frame animation path); otherwise full recompile.

        fast + device=True runs the whole retransform + BVH refit ON DEVICE
        (models/refit_device.py): one jitted update, zero host traffic — the
        TPU answer to the reference's O(#instances) TLAS rebuild
        (instance.rs:352-371). device=False keeps the host numpy path
        (also used as its test oracle)."""
        old_arrays = self.gpu_scene.arrays
        old_dev = self.scene_dev
        if fast and device:
            from hikari_tpu.ops.sampling import SMALL_EMISSIVE_MAX

            # DeviceRefitter does not refit em_bvh_packed interior AABBs;
            # that is only sound for <= SMALL_EMISSIVE_MAX emissives (the
            # unrolled walk never reads interiors). Larger scenes fall back
            # to the host refit so moved emitters are never culled against
            # stale AABBs (refit_device.py "Limitation").
            if self.gpu_scene.num_emissives > SMALL_EMISSIVE_MAX:
                device = False
        if fast and device:
            from hikari_tpu.models.refit_device import DeviceRefitter

            if getattr(self, "_refitter", None) is None:
                self._refitter = DeviceRefitter(self.gpu_scene)
                self._refit_fn = jax.jit(self._refitter.update)
            visible = [i for i in scene.instances if i.visible]
            cur = jnp.asarray(np.stack(
                [np.asarray(i.transform, np.float32) for i in visible]))
            prev = jnp.asarray(np.stack(
                [np.asarray(i.transform if i.prev_transform is None
                            else i.prev_transform, np.float32)
                 for i in visible]))
            self.scene_dev = {**old_dev, **self._refit_fn(cur, prev)}
        elif fast:
            self.gpu_scene = self.gpu_scene.update_transforms(scene)
            # update_transforms only replaces the host arrays it touched;
            # reuse device buffers for the untouched ones (textures etc. —
            # re-uploading all ~100 MB per frame costs more than the refit)
            self.scene_dev = {
                k: old_dev[k]
                if k in old_dev and old_arrays.get(k) is v else jnp.asarray(v)
                for k, v in self.gpu_scene.arrays.items()
            }
        else:
            self.gpu_scene = scene.compile()
            self.scene_dev = self.gpu_scene.as_pytree()
            self._refitter = None

    def render_frame(self) -> jnp.ndarray:
        """Render one frame; returns the final [H,W,4] image (device array).

        The first frame seeds the previous-view matrices with the current
        ones (zero velocity), like the reference's PreviousViewUniform
        initialization.
        """
        view = self._views()
        if not self._prev_view_initialized:
            self.carry["prev_view_proj"] = view["view_proj"] + 0.0
            self.carry["prev_inverse_view_proj"] = view["inverse_view_proj"] + 0.0
            self._prev_view_initialized = True
        # frame uniform: only `number` changes frame-to-frame; cache the
        # settings-derived scalars on device (one tiny upload per frame
        # instead of ~14 through the tunnel)
        if getattr(self, "_frame_uniform_key", None) is not self.settings:
            self._frame_uniform_cache = make_frame_uniform(self.settings, 0)
            self._frame_uniform_key = self.settings
        frame = dict(self._frame_uniform_cache)
        frame["number"] = jnp.uint32(self._frame_index)
        image, albedo, self.carry = self._frame_fn(
            self.scene_dev, view, frame, self.noise, self.carry)
        self._frame_index += 1
        return self._post_overlay(image, albedo)

    def _build_post_overlay(self):
        """Overlay + the Bevy core-node tail (bloom/tonemap/fxaa) as ONE
        jitted program per (hdr, bloom, fxaa) configuration — no eager
        per-frame ops outside the two cached XLA programs."""
        hdr = self.camera.hdr
        bloom_settings = self.bloom_settings
        use_fxaa = self.fxaa

        def post_overlay(image, albedo):
            out = overlay_compose(image, albedo, hdr)
            if hdr:
                from hikari_tpu.ops.bloom import bloom
                from hikari_tpu.utils.math import reinhard_luminance

                if bloom_settings is not None:
                    out = bloom(out, bloom_settings)
                rgb = reinhard_luminance(out[..., :3])
                out = jnp.concatenate([rgb, out[..., 3:4]], -1)
            if use_fxaa:
                from hikari_tpu.ops.fxaa import fxaa as fxaa_op

                out = fxaa_op(out)
            return out

        return post_overlay

    def _post_overlay(self, image, albedo):
        return self._post_fn(image, albedo)

    # ------------------------------------------------------------------
    # checkpoint/resume of the persistent frame state (SURVEY.md §5: the
    # carry pytree is trivially serializable — used for reproducible
    # goldens and warm restarts)
    def save_state(self, path: str):
        import pickle

        state = {
            "carry": jax.tree.map(np.asarray, self.carry),
            "frame_index": self._frame_index,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_state(self, path: str):
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.carry = jax.tree.map(jnp.asarray, state["carry"])
        self._frame_index = state["frame_index"]
        self._prev_view_initialized = True

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

    # ------------------------------------------------------------------
    def render_dissection(self, out_dir: Optional[str] = None):
        """Render one frame returning (and optionally dumping) per-pass
        intermediates — the analog of the reference's
        assets/screenshots/dissection/ debugging images."""
        if not hasattr(self, "_debug_fn"):
            self._debug_fn = jax.jit(build_render_frame(
                self.settings, self.full_size, self.tracer,
                self.no_texture, debug=True,
                num_emissives=self.gpu_scene.num_emissives,
                has_sun=self.gpu_scene.has_sun))
        view = self._views()
        if not self._prev_view_initialized:
            self.carry["prev_view_proj"] = view["view_proj"] + 0.0
            self.carry["prev_inverse_view_proj"] = view["inverse_view_proj"] + 0.0
            self._prev_view_initialized = True
        frame = make_frame_uniform(self.settings, self._frame_index)
        # the debug pipeline is always modular and expects packed [h,w,16]
        # spatial carries; the fused-spatial carry stores channel planes
        # [h,16,w] — same packed data, transposed
        carry = self.carry
        from hikari_tpu.ops import reservoir as _rsv

        def _to_packed(a):
            return (jnp.swapaxes(a, 1, 2)
                    if a.ndim == 3 and a.shape[1] == _rsv.PACKED_WIDTH
                    else a)

        def _like(a, ref):
            return (jnp.swapaxes(a, 1, 2)
                    if ref.ndim == 3 and ref.shape[1] == _rsv.PACKED_WIDTH
                    else a)

        sp_keys = ("spatial_de", "spatial_indirect")
        orig = {k: carry[k] for k in sp_keys}
        carry = {**carry, **{k: _to_packed(carry[k]) for k in sp_keys}}
        image, albedo, carry, dbg = self._debug_fn(
            self.scene_dev, view, frame, self.noise, carry)
        carry = {**carry,
                 **{k: _like(carry[k], orig[k]) for k in sp_keys}}
        self.carry = carry
        self._frame_index += 1
        dbg = {k: np.asarray(v) for k, v in dbg.items()}
        dbg["final"] = np.asarray(self._post_overlay(image, albedo))
        if out_dir:
            import os

            from hikari_tpu.utils.image import save_png

            os.makedirs(out_dir, exist_ok=True)
            for k, v in dbg.items():
                if v.ndim == 2:
                    v = np.repeat(v[..., None], 3, axis=-1) / max(v.max(), 1e-6)
                if "normal" in k:
                    v = v * 0.5 + 0.5
                save_png(os.path.join(out_dir, f"{k}.png"), v)
        return dbg
