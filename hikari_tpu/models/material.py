"""Materials and the texture atlas.

`StandardMaterial` mirrors the subset of Bevy's StandardMaterial the
reference packs into its GPU material array (`GpuStandardMaterial`,
src/mesh_material/mod.rs:202-218): base color, emissive, perceptual
roughness, metallic, reflectance + 5 texture slots with u32::MAX as the
"no texture" sentinel (src/mesh_material/material.rs:78-87).

TPU design: per-pixel dynamic `textures[id]` indexing (a Vulkan
binding_array, light.wgsl:14-18) does not exist on TPU, so all textures are
shelf-packed into ONE atlas tensor and sampled by computed offset + bilinear
gather (SURVEY.md §7 hard part 2). Texture colors are stored linear-light
(sRGB decoded at pack time for color/emissive maps).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

NO_TEXTURE = -1


@dataclasses.dataclass
class Texture:
    """Host-side image: [h, w, 4] uint8 (or float32 already-linear)."""

    data: np.ndarray
    is_srgb: bool = True  # decode to linear when packed
    repeat: bool = True  # wrap addressing (glTF default)

    @property
    def height(self):
        return self.data.shape[0]

    @property
    def width(self):
        return self.data.shape[1]


@dataclasses.dataclass
class StandardMaterial:
    base_color: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    base_color_texture: Optional[Texture] = None
    emissive: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    emissive_texture: Optional[Texture] = None
    perceptual_roughness: float = 0.5
    metallic: float = 0.01
    metallic_roughness_texture: Optional[Texture] = None
    reflectance: float = 0.5
    normal_map_texture: Optional[Texture] = None
    occlusion_texture: Optional[Texture] = None

    @staticmethod
    def from_color(r, g, b, a=1.0) -> "StandardMaterial":
        return StandardMaterial(base_color=(r, g, b, a))

    @property
    def emissive_intensity(self) -> float:
        """Reference emissive strength test (src/mesh_material/instance.rs:381-383):
        intensity = 255 * emissive.a * |emissive.rgb|."""
        e = np.asarray(self.emissive, dtype=np.float64)
        return float(255.0 * e[3] * np.linalg.norm(e[:3]))


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = c.astype(np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _to_linear_f32(tex: Texture) -> np.ndarray:
    d = tex.data
    if d.dtype == np.uint8:
        f = d.astype(np.float32) / 255.0
    else:
        f = d.astype(np.float32)
    if f.ndim == 2:
        f = f[..., None]
    if f.shape[-1] < 4:
        pad = np.ones(f.shape[:-1] + (4 - f.shape[-1],), np.float32)
        f = np.concatenate([f, pad], axis=-1)
    if tex.is_srgb:
        rgb = srgb_to_linear(f[..., :3])
        f = np.concatenate([rgb, f[..., 3:4]], axis=-1)
    return f


def pack_atlas(textures: List[Texture], max_side: int = 8192):
    """Shelf-pack textures into one [A, A, 4] float32 atlas.

    Returns (atlas, rects [T,4] int32 as (x, y, w, h)). Empty texture list
    yields a 1x1 white atlas (the NO_TEXTURE specialization uses none of it).

    Every texture is stored with a 1-texel WRAPPED border (rects point at
    the inner rect): the xy-addressed samplers (ops/shading.sample_atlas)
    mod every tap into the inner rect and never read the border, while the
    banded window sampler (ops/texture_pallas.py) reads contiguous ix in
    [-1, w] so its wrapped bilinear taps hit real texels.
    """
    if not textures:
        return np.ones((8, 128, 4), dtype=np.float32), np.zeros((1, 4), np.int32)

    imgs = [_to_linear_f32(t) for t in textures]
    order = sorted(range(len(imgs)), key=lambda i: -imgs[i].shape[0])

    side = 128
    total_area = sum((im.shape[0] + 2) * (im.shape[1] + 2) for im in imgs)
    while side * side < total_area * 1.2 and side < max_side:
        side *= 2

    while True:
        rects = np.zeros((len(imgs), 4), np.int32)
        x = y = shelf_h = 0
        ok = True
        for i in order:
            h, w = imgs[i].shape[0] + 2, imgs[i].shape[1] + 2
            if w > side:
                ok = False
                break
            if x + w > side:
                x = 0
                y += shelf_h
                shelf_h = 0
            if y + h > side:
                ok = False
                break
            rects[i] = (x + 1, y + 1, w - 2, h - 2)  # inner rect
            x += w
            shelf_h = max(shelf_h, h)
        if ok:
            break
        side *= 2
        if side > max_side:
            raise ValueError("textures do not fit in the atlas")

    atlas = np.zeros((side, side, 4), dtype=np.float32)
    for i, im in enumerate(imgs):
        x0, y0, w, h = rects[i]
        atlas[y0 : y0 + h, x0 : x0 + w] = im
        # wrapped 1-texel border (repeat addressing)
        atlas[y0 - 1, x0 : x0 + w] = im[-1]
        atlas[y0 + h, x0 : x0 + w] = im[0]
        atlas[y0 : y0 + h, x0 - 1] = im[:, -1]
        atlas[y0 : y0 + h, x0 + w] = im[:, 0]
        atlas[y0 - 1, x0 - 1] = im[-1, -1]
        atlas[y0 - 1, x0 + w] = im[-1, 0]
        atlas[y0 + h, x0 - 1] = im[0, -1]
        atlas[y0 + h, x0 + w] = im[0, 0]
    return atlas, rects


def pack_materials(materials: List[StandardMaterial]):
    """Dedup textures and pack the material table (SoA numpy dict).

    Mirrors `prepare_material_textures` dedup (material.rs:54-87) and the
    GpuStandardMaterial array upload (material.rs:139-203).
    """
    textures: List[Texture] = []
    tex_ids = {}

    def tex_id(t: Optional[Texture]) -> int:
        if t is None:
            return NO_TEXTURE
        key = id(t)
        if key not in tex_ids:
            tex_ids[key] = len(textures)
            textures.append(t)
        return tex_ids[key]

    n = len(materials)
    table = {
        "base_color": np.zeros((n, 4), np.float32),
        "emissive": np.zeros((n, 4), np.float32),
        "perceptual_roughness": np.zeros(n, np.float32),
        "metallic": np.zeros(n, np.float32),
        "reflectance": np.zeros(n, np.float32),
        "base_color_texture": np.full(n, NO_TEXTURE, np.int32),
        "emissive_texture": np.full(n, NO_TEXTURE, np.int32),
        "metallic_roughness_texture": np.full(n, NO_TEXTURE, np.int32),
        "normal_map_texture": np.full(n, NO_TEXTURE, np.int32),
        "occlusion_texture": np.full(n, NO_TEXTURE, np.int32),
    }
    for i, m in enumerate(materials):
        table["base_color"][i] = m.base_color
        table["emissive"][i] = m.emissive
        table["perceptual_roughness"][i] = m.perceptual_roughness
        table["metallic"][i] = m.metallic
        table["reflectance"][i] = m.reflectance
        table["base_color_texture"][i] = tex_id(m.base_color_texture)
        table["emissive_texture"][i] = tex_id(m.emissive_texture)
        table["metallic_roughness_texture"][i] = tex_id(m.metallic_roughness_texture)
        table["normal_map_texture"][i] = tex_id(m.normal_map_texture)
        table["occlusion_texture"][i] = tex_id(m.occlusion_texture)

    atlas, rects = pack_atlas(textures)
    return table, atlas, rects, len(textures)
