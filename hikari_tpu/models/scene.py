"""Scene assembly and the GPU-scene compiler.

The reference keeps meshes in local space and traverses a two-level
TLAS→BLAS hierarchy, transforming each ray into instance space at TLAS
leaves (light.wgsl:442-486). That design suits per-thread scalar GPU loops;
on TPU a data-dependent two-level loop serializes VPU lanes. So the compiler
here *flattens the scene*: every instance's triangles are pre-transformed to
world space into one triangle megabuffer with per-triangle instance/material
ids, and ONE world-space LBVH is built over all of them. Semantics preserved:

* `exclude_instance` (shadow rays skip the emitter, light.wgsl:459) →
  per-hit instance-id mask;
* per-instance BLAS probe for emissive sampling (light.wgsl:682-687) →
  masked brute-force over that instance's triangle range (stored per
  instance);
* TLAS rebuild on transform change (instance.rs:352-371) → retransform the
  instance's triangle slice + LBVH rebuild/refit (vectorized numpy).

Emissive list + light BVH + alias tables follow instance.rs:381-428.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from hikari_tpu.models.alias_table import build_alias_table, triangle_areas
from hikari_tpu.models.bvh import BVH_LEAF_FLAG, build_bvh, refit_bvh
from hikari_tpu.models.material import StandardMaterial, pack_materials
from hikari_tpu.models.mesh import Mesh

TRI_PAD = 8  # pad triangle count to a multiple of this (TPU sublane)


@dataclasses.dataclass
class DirectionalLight:
    """Single directional (sun) light — the only one honored
    (light.wgsl:611 reads directional_lights[0])."""

    illuminance: float = 100000.0
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # direction the light *travels*; direction_to_light = -direction
    direction: Tuple[float, float, float] = (0.0, -1.0, 0.0)

    @staticmethod
    def from_euler(x: float, y: float, z: float, illuminance: float = 100000.0,
                   color=(1.0, 1.0, 1.0)) -> "DirectionalLight":
        """Bevy-style XYZ euler rotation of a light looking down -Z."""
        cx, sx = np.cos(x), np.sin(x)
        cy, sy = np.cos(y), np.sin(y)
        cz, sz = np.cos(z), np.sin(z)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz
        fwd = rot @ np.array([0.0, 0.0, -1.0])
        return DirectionalLight(illuminance=illuminance, color=color,
                                direction=tuple(fwd))

    def gpu_color(self) -> np.ndarray:
        # Bevy uploads color_linear * illuminance * exposure, with a fixed
        # physical-camera exposure (aperture f/4, shutter 1/250s, ISO 100:
        # ev100 ~= 11.97, exposure = 1/(2^ev100 * 1.2) ~= 1/4800).
        ev100 = np.log2(4.0 * 4.0 / (1.0 / 250.0))
        exposure = 1.0 / (2.0 ** ev100 * 1.2)
        c = (np.asarray(self.color, np.float32)
             * np.float32(self.illuminance * exposure))
        return np.concatenate([c, [1.0]]).astype(np.float32)


@dataclasses.dataclass
class AmbientLight:
    """Bevy AmbientLight default: white x 0.05 brightness."""

    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    brightness: float = 0.05

    def gpu_color(self) -> np.ndarray:
        c = np.asarray(self.color, np.float32) * np.float32(self.brightness)
        return np.concatenate([c, [1.0]]).astype(np.float32)


@dataclasses.dataclass
class Instance:
    mesh: int  # index into Scene.meshes
    material: int  # index into Scene.materials
    transform: np.ndarray  # 4x4 model matrix
    prev_transform: Optional[np.ndarray] = None  # for velocity; defaults to transform
    visible: bool = True


def make_transform(translation=(0, 0, 0), rotation=None, scale=(1, 1, 1)) -> np.ndarray:
    m = np.eye(4)
    r = np.eye(3) if rotation is None else np.asarray(rotation, np.float64)
    m[:3, :3] = r * np.asarray(scale, np.float64)[None, :]
    m[:3, 3] = translation
    return m


class Scene:
    """Host-side scene: meshes + materials + instances + lights."""

    def __init__(self):
        self.meshes: List[Mesh] = []
        self.materials: List[StandardMaterial] = []
        self.instances: List[Instance] = []
        self.directional_light = DirectionalLight()
        self.ambient_light = AmbientLight()

    def add_mesh(self, mesh: Mesh) -> int:
        self.meshes.append(mesh)
        return len(self.meshes) - 1

    def add_material(self, material) -> int:
        """Accepts a StandardMaterial or any object exposing
        `to_standard_material()` — the analog of the reference's custom
        materials via `Into<StandardMaterial>` + GenericMaterialPlugin
        (README.md:151-157, material.rs:38-49)."""
        if not isinstance(material, StandardMaterial):
            material = material.to_standard_material()
        self.materials.append(material)
        return len(self.materials) - 1

    def spawn(self, mesh: int, material: int, transform: Optional[np.ndarray] = None,
              prev_transform: Optional[np.ndarray] = None) -> int:
        self.instances.append(
            Instance(mesh, material,
                     np.eye(4) if transform is None else np.asarray(transform, np.float64),
                     prev_transform)
        )
        return len(self.instances) - 1

    # ------------------------------------------------------------------
    def compile(self, universal=None) -> "GpuScene":
        return compile_scene(self, universal)


def _pad_to(x: np.ndarray, n: int, fill=0):
    if len(x) == n:
        return x
    pad_shape = (n - len(x),) + x.shape[1:]
    return np.concatenate([x, np.full(pad_shape, fill, dtype=x.dtype)], axis=0)


@dataclasses.dataclass
class GpuScene:
    """Flat SoA numpy arrays ready for device upload (the pytree the kernels
    take). Counts are Python ints = static under jit."""

    arrays: Dict[str, np.ndarray]
    num_triangles: int
    num_nodes: int
    num_instances: int
    num_emissives: int
    num_textures: int
    bvh: object  # Bvh topology (host-only, for refit)

    def as_pytree(self):
        import jax.numpy as jnp

        return {k: jnp.asarray(v) for k, v in self.arrays.items()}

    @property
    def has_sun(self) -> bool:
        """True iff the directional light contributes (color*illuminance>0);
        static per compile — lets the pipeline skip the direct channel's
        shadow trace when cornell-style scenes spawn no sun."""
        return bool(np.any(np.abs(self.arrays["dir_color"][:3]) > 0.0))

    # ------------------------------------------------------------------
    def update_transforms(self, scene: "Scene") -> "GpuScene":
        """Fast per-frame path for animated scenes (the analog of the
        reference's per-frame TLAS rebuild, instance.rs:352-371): keep
        topology, retransform the moved instances' world triangles, refit
        the BVH node AABBs (vectorized O(n log n)), refresh instance /
        motion / emissive tables. Alias tables are scale-invariant under
        rigid motion (instance.rs:387-395's scale-keyed cache), so they are
        reused; call compile() instead when scales change.
        """
        visible = [inst for inst in scene.instances if inst.visible]
        assert len(visible) == self.num_instances, "topology changed: use compile()"
        a = self.arrays
        tri_pos = a["tri_pos"].copy()
        tri_nrm = a["tri_normal"].copy()
        offsets = a["inst_prim_offset"]
        counts = a["inst_prim_count"]
        inst_model = []
        inst_motion = []
        for iid, inst in enumerate(visible):
            model = np.asarray(inst.transform, np.float64)
            prev = (model if inst.prev_transform is None
                    else np.asarray(inst.prev_transform, np.float64))
            inst_model.append(model.astype(np.float32))
            inst_motion.append((prev @ np.linalg.inv(model)).astype(np.float32))
            old = a["inst_model"][iid].astype(np.float64)
            if np.allclose(model, old, atol=1e-9):
                continue
            rel = (model @ np.linalg.inv(old))
            o, c = offsets[iid], counts[iid]
            sl = tri_pos[o : o + c].reshape(-1, 3)
            tri_pos[o : o + c] = (sl @ rel[:3, :3].T + rel[:3, 3]).reshape(-1, 3, 3).astype(np.float32)
            itn = np.linalg.inv(rel[:3, :3]).T
            nsl = tri_nrm[o : o + c].reshape(-1, 3) @ itn.T
            nsl /= np.maximum(np.linalg.norm(nsl, axis=-1, keepdims=True), 1e-20)
            tri_nrm[o : o + c] = nsl.reshape(-1, 3, 3).astype(np.float32)

        bvh2 = refit_bvh(self.bvh, tri_pos[: self.num_triangles].min(axis=1),
                         tri_pos[: self.num_triangles].max(axis=1))

        arrays = dict(a)
        arrays["tri_pos"] = tri_pos
        arrays["tri_normal"] = tri_nrm
        arrays["inst_model"] = np.asarray(inst_model, np.float32)
        arrays["inst_motion"] = np.asarray(inst_motion, np.float32).reshape(-1, 16)
        arrays["bvh_min"] = bvh2.node_min
        arrays["bvh_max"] = bvh2.node_max
        is_leaf = (bvh2.entry & np.uint32(0x80000000)) != 0
        payload = np.where(is_leaf, bvh2.entry & np.uint32(0x7FFFFFFF), bvh2.entry)
        arrays["bvh_packed"] = np.concatenate([
            bvh2.node_min, bvh2.node_max,
            is_leaf.astype(np.float32)[:, None],
            payload.astype(np.float32)[:, None],
            bvh2.exit.astype(np.float32)[:, None],
        ], axis=1).astype(np.float32)
        arrays["tri_pos_flat"] = np.concatenate([
            tri_pos.reshape(len(tri_pos), 9),
            a["tri_instance"].astype(np.float32)[:, None],
        ], axis=1).astype(np.float32)
        arrays["tri_attr"] = np.concatenate([
            tri_nrm.reshape(len(tri_nrm), 9),
            a["tri_uv"].reshape(len(tri_nrm), 6),
            a["tri_instance"].astype(np.float32)[:, None],
            a["tri_material"].astype(np.float32)[:, None],
        ], axis=1).astype(np.float32)
        # refresh instance AABBs + emissive positions/radii from moved tris
        n_i = self.num_instances
        amin = np.empty((n_i, 3), np.float32)
        amax = np.empty((n_i, 3), np.float32)
        for iid in range(n_i):
            o, c = offsets[iid], counts[iid]
            amin[iid] = tri_pos[o : o + c].reshape(-1, 3).min(axis=0)
            amax[iid] = tri_pos[o : o + c].reshape(-1, 3).max(axis=0)
        arrays["inst_aabb_min"] = amin
        arrays["inst_aabb_max"] = amax
        if self.num_emissives:
            em_inst = a["em_instance"]
            lo, hi = amin[em_inst], amax[em_inst]
            old_extra = (a["em_radius"]
                         - 0.5 * np.linalg.norm(
                             a["inst_aabb_max"][em_inst]
                             - a["inst_aabb_min"][em_inst], axis=-1))
            arrays["em_position"] = (0.5 * (lo + hi)).astype(np.float32)
            arrays["em_radius"] = (0.5 * np.linalg.norm(hi - lo, axis=-1)
                                   + old_extra).astype(np.float32)
            em_pos = arrays["em_position"]
            em_r = arrays["em_radius"][:, None]
            em_bvh = build_bvh(em_pos - em_r, em_pos + em_r, method="lbvh")
            eleaf = (em_bvh.entry & np.uint32(0x80000000)) != 0
            epay = np.where(eleaf, em_bvh.entry & np.uint32(0x7FFFFFFF),
                            em_bvh.entry)
            arrays["em_bvh_packed"] = np.concatenate([
                em_bvh.node_min, em_bvh.node_max,
                eleaf.astype(np.float32)[:, None],
                epay.astype(np.float32)[:, None],
                em_bvh.exit.astype(np.float32)[:, None],
            ], axis=1).astype(np.float32)
            # DFS leaf order (= array order of an entry/exit flattening):
            # lets small-E scenes unroll the walk (ops/sampling.py)
            arrays["em_leaf_order"] = epay[eleaf].astype(np.int32)
            arrays["em_packed"] = np.concatenate([
                a["em_rgba"], arrays["em_position"],
                arrays["em_radius"][:, None],
                a["em_instance"].astype(np.float32)[:, None],
                a["em_alias_offset"].astype(np.float32)[:, None],
                a["em_alias_count"].astype(np.float32)[:, None],
                a["em_surface_area"][:, None],
            ], axis=1).astype(np.float32)
        _add_emissive_tri_tables(arrays)
        if "cl_tri_packed" in a:
            from hikari_tpu.models.clusters import build_cluster_tables

            arrays.update(build_cluster_tables(
                bvh2, arrays["tri_pos_flat"], arrays["tri_attr"]))
        return dataclasses.replace(self, arrays=arrays, bvh=bvh2)


def _atlas_panels_bf16(atlas: np.ndarray) -> np.ndarray:
    from ml_dtypes import bfloat16

    from hikari_tpu.ops.texture_pallas import atlas_to_panels

    return atlas_to_panels(atlas, bfloat16)


_ATLAS_QUAD_MAX_SIDE = 2048  # [A,A,16] bf16 = 134 MB at 2048


def _atlas_quad_bf16(atlas: np.ndarray) -> np.ndarray:
    """[A,A,4] -> [A,A,16] rows holding the 2x2 bilinear neighborhood
    (x,y), (x+1,y), (x,y+1), (x+1,y+1) so an INCOHERENT bilinear sample is
    ONE row gather instead of four (~9 ns/row measured either way; see
    ops/shading.sample_atlas). Exact for repeat addressing because
    pack_atlas stores wrapped 1-texel borders, so +1 never leaves the
    padded rect. bf16: texture data is u8-sourced."""
    from ml_dtypes import bfloat16

    ax = np.concatenate([atlas, np.roll(atlas, -1, axis=1)], -1)
    q = np.concatenate([ax, np.roll(ax, -1, axis=0)], -1)
    return q.astype(bfloat16)


def _add_emissive_tri_tables(arrays) -> None:
    """Emissive-only triangle tables for light-probe traces.

    select_light_candidate's probe ray (light.wgsl:672-683) is restricted to
    the sampled emissive instance via the include mask, so only triangles of
    emissive instances can ever win — tracing the full scene table is wasted
    work (measured ~26 ms per 2M-ray brute-force dispatch at 1080p). The
    probe engine streams this (usually tiny) subset instead; semantics are
    identical because occluders are already skipped by the include mask.
    """
    em_inst = arrays["em_instance"]
    em_inst = em_inst[em_inst >= 0]
    mask = np.isin(
        np.round(arrays["tri_pos_flat"][:, 9]).astype(np.int64), em_inst)
    pos = arrays["tri_pos_flat"][mask]
    attr = arrays["tri_attr"][mask]
    n_pad = max(8, -(-len(pos) // 8) * 8)
    # pad with degenerate far-away rows, instance -1 (never intersect)
    pad_pos = np.full((n_pad - len(pos), pos.shape[1]), 1e30, np.float32)
    pad_pos[:, 9] = -1.0
    pad_attr = np.zeros((n_pad - len(attr), attr.shape[1]), np.float32)
    pad_attr[:, 15] = -1.0
    arrays["em_tri_pos_flat"] = np.concatenate([pos, pad_pos], axis=0)
    arrays["em_tri_attr"] = np.concatenate([attr, pad_attr], axis=0)
    # per-instance row offset into the emissive table: instance triangles
    # are contiguous in tri_pos_flat, so they stay contiguous after masking.
    # Lets select_light_candidate gather the sampled emitter triangle from
    # this (tiny) table instead of sweeping the full scene table — the full
    # 40-row sweep alone measured 6.6 ms at 1080p (tools/probe_channel.py s5)
    masked_inst = np.round(pos[:, 9]).astype(np.int64) if len(pos) else \
        np.zeros(0, np.int64)
    n_inst = len(arrays["inst_prim_offset"])
    offs = np.zeros(n_inst, np.float32)
    if len(masked_inst):
        uniq, first = np.unique(masked_inst, return_index=True)
        offs[uniq] = first.astype(np.float32)
    arrays["em_inst_tri_offset_f"] = offs


def compile_scene(scene: Scene, universal=None) -> GpuScene:
    """Scene -> flat world-space SoA arrays + acceleration structures.

    `universal`: HikariUniversalSettings; disabling
    build_mesh_acceleration_structure skips BVH construction (tracers fall
    back to brute force — the reference's debug toggles, lib.rs:375-397).
    """
    from hikari_tpu.config import HikariUniversalSettings

    universal = universal or HikariUniversalSettings()
    tri_pos, tri_nrm, tri_uv = [], [], []
    tri_inst, tri_mat = [], []
    inst_aabb_min, inst_aabb_max = [], []
    inst_prim_offset, inst_prim_count = [], []
    inst_material = []
    inst_model, inst_prev_model = [], []

    visible = [inst for inst in scene.instances if inst.visible]

    offset = 0
    for iid, inst in enumerate(visible):
        mesh = scene.meshes[inst.mesh]
        model = np.asarray(inst.transform, np.float64)
        prev = model if inst.prev_transform is None else np.asarray(inst.prev_transform, np.float64)

        wpos = mesh.positions @ model[:3, :3].T + model[:3, 3]
        # normals with inverse-transpose (mikktspace rule, light.wgsl:324-338)
        it = np.linalg.inv(model[:3, :3]).T
        wnrm = mesh.normals @ it.T
        wnrm /= np.maximum(np.linalg.norm(wnrm, axis=-1, keepdims=True), 1e-20)

        idx = mesh.indices.astype(np.int64)
        tri_pos.append(wpos[idx])  # [F,3,3]
        tri_nrm.append(wnrm[idx])
        tri_uv.append(mesh.uvs[idx])
        f = len(idx)
        tri_inst.append(np.full(f, iid, np.int32))
        tri_mat.append(np.full(f, inst.material, np.int32))

        inst_aabb_min.append(wpos.min(axis=0))
        inst_aabb_max.append(wpos.max(axis=0))
        inst_prim_offset.append(offset)
        inst_prim_count.append(f)
        inst_material.append(inst.material)
        inst_model.append(model)
        inst_prev_model.append(prev)
        offset += f

    if not visible:
        raise ValueError("scene has no visible instances")

    tri_pos = np.concatenate(tri_pos).astype(np.float32)
    tri_nrm = np.concatenate(tri_nrm).astype(np.float32)
    tri_uv = np.concatenate(tri_uv).astype(np.float32)
    tri_inst = np.concatenate(tri_inst)
    tri_mat = np.concatenate(tri_mat)
    num_tris = len(tri_pos)

    # --- world BVH over all triangles
    aabb_min = tri_pos.min(axis=1)
    aabb_max = tri_pos.max(axis=1)
    if universal.build_mesh_acceleration_structure:
        bvh = build_bvh(aabb_min, aabb_max)
    else:  # debug toggle: single-leaf chain (forces brute-force engine)
        bvh = build_bvh(aabb_min[:1], aabb_max[:1])

    # --- emissive list + per-instance alias tables (instance.rs:381-419)
    em_rgba, em_pos, em_radius, em_instance = [], [], [], []
    em_alias_offset, em_alias_count, em_area = [], [], []
    alias_prob_all, alias_index_all = [], []
    for iid, inst in enumerate(visible):
        mat = scene.materials[inst.material]
        intensity = mat.emissive_intensity
        if intensity <= 0.0:
            continue
        mesh = scene.meshes[inst.mesh]
        model = np.asarray(inst.transform, np.float64)
        areas = triangle_areas(mesh.positions, mesh.indices.astype(np.int64), model)
        prob, index = build_alias_table(areas)
        em_alias_offset.append(len(alias_prob_all) and sum(len(p) for p in alias_prob_all))
        em_alias_offset[-1] = sum(len(p) for p in alias_prob_all)
        em_alias_count.append(len(prob))
        alias_prob_all.append(prob)
        alias_index_all.append(index)
        em_area.append(float(areas.sum()))
        lo, hi = inst_aabb_min[iid], inst_aabb_max[iid]
        em_pos.append(0.5 * (lo + hi))
        em_radius.append(0.5 * float(np.linalg.norm(hi - lo)) + float(np.sqrt(intensity)))
        em_rgba.append(np.asarray(mat.emissive, np.float32))
        em_instance.append(iid)

    num_emissives = len(em_instance)
    if num_emissives:
        em_pos_a = np.asarray(em_pos, np.float32)
        em_radius_a = np.asarray(em_radius, np.float32)
        em_bvh = build_bvh(em_pos_a - em_radius_a[:, None], em_pos_a + em_radius_a[:, None])
        alias_prob = np.concatenate(alias_prob_all).astype(np.float32)
        alias_index = np.concatenate(alias_index_all).astype(np.int32)
    else:
        em_pos_a = np.zeros((1, 3), np.float32)
        em_radius_a = np.zeros(1, np.float32)
        em_rgba = [np.zeros(4, np.float32)]
        em_instance = [-1]
        em_alias_offset, em_alias_count, em_area = [0], [0], [0.0]
        em_bvh = None
        alias_prob = np.zeros(1, np.float32)
        alias_index = np.zeros(1, np.int32)

    # --- materials & textures
    mat_table, atlas, tex_rects, num_textures = pack_materials(scene.materials)

    num_pad = -(-num_tris // TRI_PAD) * TRI_PAD
    arrays = {
        # triangles (padded with degenerate far-away tris, instance -1)
        "tri_pos": _pad_to(tri_pos, num_pad, fill=np.float32(1e30)),
        "tri_normal": _pad_to(tri_nrm, num_pad),
        "tri_uv": _pad_to(tri_uv, num_pad),
        "tri_instance": _pad_to(tri_inst, num_pad, fill=-1),
        "tri_material": _pad_to(tri_mat, num_pad, fill=0),
        # world BVH (entry stored as int32: leaves have the sign bit set,
        # prim = entry & 0x7fffffff — bit-identical to the u32 flag scheme)
        "bvh_min": bvh.node_min,
        "bvh_max": bvh.node_max,
        "bvh_entry": bvh.entry.view(np.int32),
        "bvh_exit": bvh.exit.view(np.int32).astype(np.int32),
        # instances
        "inst_aabb_min": np.asarray(inst_aabb_min, np.float32),
        "inst_aabb_max": np.asarray(inst_aabb_max, np.float32),
        "inst_material": np.asarray(inst_material, np.int32),
        "inst_prim_offset": np.asarray(inst_prim_offset, np.int32),
        "inst_prim_count": np.asarray(inst_prim_count, np.int32),
        "inst_model": np.asarray(inst_model, np.float32),
        "inst_prev_model": np.asarray(inst_prev_model, np.float32),
        # emissives + light BVH
        "em_rgba": np.asarray(em_rgba, np.float32).reshape(-1, 4),
        "em_position": em_pos_a,
        "em_radius": em_radius_a,
        "em_instance": np.asarray(em_instance, np.int32),
        "em_alias_offset": np.asarray(em_alias_offset, np.int32),
        "em_alias_count": np.asarray(em_alias_count, np.int32),
        "em_surface_area": np.asarray(em_area, np.float32),
        "alias_prob": alias_prob,
        "alias_index": alias_index,
        # material table + atlas (+ the channel-major panel tiling the
        # banded Pallas sampler window-DMAs from, ops/texture_pallas.py;
        # bf16: texture data is u8-sourced, see sampler docstring)
        **{f"mat_{k}": v for k, v in mat_table.items()},
        "atlas": atlas,
        "tex_rect": tex_rects,
        "atlas_panels": _atlas_panels_bf16(atlas),
        **({"atlas_quad": _atlas_quad_bf16(atlas)}
           if atlas.shape[0] <= _ATLAS_QUAD_MAX_SIDE
           and atlas.shape[0] > 8 else {}),
        # lights
        "dir_to_light": (-np.asarray(scene.directional_light.direction, np.float32)
                         / np.linalg.norm(scene.directional_light.direction)).astype(np.float32),
        "dir_color": scene.directional_light.gpu_color(),
        "ambient_color": scene.ambient_light.gpu_color(),
    }

    # ---- packed per-row tables (ONE lookup per consumer on device; see
    # utils.math.table_gather for why)
    arrays["tri_attr"] = np.concatenate([
        arrays["tri_normal"].reshape(num_pad, 9),
        arrays["tri_uv"].reshape(num_pad, 6),
        arrays["tri_instance"].astype(np.float32)[:, None],
        arrays["tri_material"].astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    m = len(scene.materials)
    arrays["mat_packed"] = np.concatenate([
        arrays["mat_base_color"].reshape(m, 4),
        arrays["mat_emissive"].reshape(m, 4),
        arrays["mat_perceptual_roughness"][:, None],
        arrays["mat_metallic"][:, None],
        arrays["mat_reflectance"][:, None],
        arrays["mat_base_color_texture"].astype(np.float32)[:, None],
        arrays["mat_emissive_texture"].astype(np.float32)[:, None],
        arrays["mat_metallic_roughness_texture"].astype(np.float32)[:, None],
        arrays["mat_occlusion_texture"].astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    # per-instance motion matrix: prev_model @ inv(model) maps current world
    # position back to the previous frame's (for velocity; replaces the
    # per-pixel matrix inverse)
    motion = np.stack([
        np.asarray(p, np.float64) @ np.linalg.inv(np.asarray(c, np.float64))
        for p, c in zip(inst_prev_model, inst_model)
    ]).astype(np.float32)
    arrays["inst_motion"] = motion.reshape(len(visible), 16)
    arrays["em_packed"] = np.concatenate([
        arrays["em_rgba"],
        arrays["em_position"],
        arrays["em_radius"][:, None],
        arrays["em_instance"].astype(np.float32)[:, None],
        arrays["em_alias_offset"].astype(np.float32)[:, None],
        arrays["em_alias_count"].astype(np.float32)[:, None],
        arrays["em_surface_area"][:, None],
    ], axis=1).astype(np.float32)
    arrays["alias_packed"] = np.stack([
        arrays["alias_prob"], arrays["alias_index"].astype(np.float32)
    ], axis=1).astype(np.float32)
    arrays["inst_prim_offset_f"] = arrays["inst_prim_offset"].astype(np.float32)
    # packed BVH nodes + triangle rows: one row-gather per traversal step.
    # float layout [N,9]: min(3), max(3), is_leaf, payload (prim or entry
    # index — both < 2^24, exact in f32), exit
    is_leaf = (bvh.entry & np.uint32(0x80000000)) != 0
    payload = np.where(is_leaf, bvh.entry & np.uint32(0x7FFFFFFF), bvh.entry)
    arrays["bvh_packed"] = np.concatenate([
        bvh.node_min, bvh.node_max,
        is_leaf.astype(np.float32)[:, None],
        payload.astype(np.float32)[:, None],
        bvh.exit.astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    # 9 vertex floats + instance id (for exclude/include masks mid-traversal)
    arrays["tri_pos_flat"] = np.concatenate([
        arrays["tri_pos"].reshape(num_pad, 9),
        arrays["tri_instance"].astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    if num_emissives:
        arrays.update(
            em_bvh_min=em_bvh.node_min,
            em_bvh_max=em_bvh.node_max,
            em_bvh_entry=em_bvh.entry.view(np.int32),
            em_bvh_exit=em_bvh.exit.view(np.int32).astype(np.int32),
        )
    else:
        arrays.update(
            em_bvh_min=np.zeros((1, 3), np.float32),
            em_bvh_max=np.zeros((1, 3), np.float32),
            em_bvh_entry=np.zeros(1, np.int32),
            em_bvh_exit=np.ones(1, np.int32),
        )

    em_is_leaf = (arrays["em_bvh_entry"].view(np.uint32)
                  & np.uint32(0x80000000)) != 0
    em_payload = np.where(
        em_is_leaf,
        arrays["em_bvh_entry"].view(np.uint32) & np.uint32(0x7FFFFFFF),
        arrays["em_bvh_entry"].view(np.uint32))
    arrays["em_bvh_packed"] = np.concatenate([
        arrays["em_bvh_min"], arrays["em_bvh_max"],
        em_is_leaf.astype(np.float32)[:, None],
        em_payload.astype(np.float32)[:, None],
        arrays["em_bvh_exit"].astype(np.float32)[:, None],
    ], axis=1).astype(np.float32)
    # DFS leaf order (= array order of an entry/exit flattening): lets
    # small-E scenes unroll the walk (ops/sampling.py)
    arrays["em_leaf_order"] = (em_payload[em_is_leaf].astype(np.int32)
                               if num_emissives else np.zeros(1, np.int32))
    _add_emissive_tri_tables(arrays)
    # cull tables whenever the tile-cull engine can win (measured crossover
    # vs the 8-packed brute kernel at T ~700, tools/probe_crossover.py)
    if num_tris > 512 and universal.build_mesh_acceleration_structure:
        from hikari_tpu.models.clusters import build_cluster_tables

        arrays.update(build_cluster_tables(
            bvh, arrays["tri_pos_flat"], arrays["tri_attr"]))

    return GpuScene(
        arrays=arrays,
        num_triangles=num_tris,
        num_nodes=bvh.count,
        num_instances=len(visible),
        num_emissives=num_emissives,
        num_textures=num_textures,
        bvh=bvh,
    )
