"""City scene: high instance count + staggered async loading + animation
(reference examples/city.rs).

The reference spawns a 100x100 ground plane, a rotating emissive Earth
sphere, and then STAGGERS in three waves of four multi-mesh "Low Poly"
house glb scenes on a timer (city.rs:144-199) while the sphere rotates
every frame (sphere_rotate_system) — so the renderer sees both topology
changes (wave lands -> rebuild) and per-frame transform changes (sphere ->
refit). The Low-Poly glbs are not shipped in the reference assets, so the
houses are procedural multi-instance buildings with the same wave layout
(4 per wave at x = 4*{-3,-1,1,3}, z = 0 / +-8); each house is ~10 mesh
instances, reproducing the high-instance-count stress (~130 instances by
the last wave). If the City glTF were complete it would be used instead —
it ships without its scene.bin buffer (LFS-stripped).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import os

import numpy as np

from examples.common import parse_args
from hikari_tpu import HikariSettings, Scene, StandardMaterial, Upscale
from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.material import Texture
from hikari_tpu.models.scene import DirectionalLight, make_transform

ASSETS = os.environ.get("HIKARI_ASSETS", "/root/reference/assets")

WAVES = [  # (x positions, z offsets) per load_models tick (city.rs:152-198)
    [(4.0 * loc, 0.0) for loc in (-3, -1, 1, 3)],
    [(4.0 * loc, 8.0 if i % 2 == 0 else -8.0)
     for i, loc in enumerate((-3, -1, 1, 3))],
    [(4.0 * loc, -8.0 if i % 2 == 0 else 8.0)
     for i, loc in enumerate((-3, -1, 1, 3))],
]


def rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _earth_texture():
    path = os.path.join(ASSETS, "models/Earth/earth_daymap.jpg")
    if not os.path.exists(path):
        return None
    from PIL import Image

    img = Image.open(path).convert("RGBA")
    img.thumbnail((1024, 1024))
    return Texture(np.asarray(img), is_srgb=True)


def _spawn_house(sc, meshes, mats, x, z, seed):
    """One procedural multi-instance house (~10 instances): base, walls,
    roof prism, chimney, door, 4 windows."""
    rng = np.random.default_rng(seed)
    w, d = rng.uniform(2.4, 3.2), rng.uniform(2.4, 3.2)
    h = rng.uniform(1.8, 2.6)
    yaw = rng.uniform(-0.3, 0.3)
    R = rot_y(yaw)

    def place(mesh, mat, off, scale):
        t = np.array([x, 0.0, z]) + R @ np.asarray(off, np.float64)
        sc.spawn(mesh, mat, make_transform(tuple(t), rotation=R, scale=scale))

    cube = meshes["cube"]
    place(cube, mats["wall"], (0, h / 2, 0), (w, h, d))               # body
    place(cube, mats["base"], (0, 0.08, 0), (w + 0.4, 0.16, d + 0.4))  # base
    place(meshes["roof"], mats["roof"], (0, h + 0.02, 0),
          (w + 0.5, rng.uniform(0.8, 1.4), d + 0.5))                   # roof
    place(cube, mats["roof"], (w * 0.25, h + 1.1, 0), (0.3, 0.9, 0.3))  # chimney
    place(cube, mats["door"], (0, 0.55, d / 2 + 0.02), (0.7, 1.1, 0.08))
    for wx in (-w * 0.3, w * 0.3):
        place(cube, mats["win"], (wx, h * 0.6, d / 2 + 0.02),
              (0.5, 0.5, 0.06))
        place(cube, mats["win"], (wx, h * 0.6, -d / 2 - 0.02),
              (0.5, 0.5, 0.06))
    place(cube, mats["wall"], (w / 2 + 0.15, 0.4, d * 0.2),
          (0.3, 0.8, 0.3))                                             # bin


def _roof_prism():
    """Triangular prism (gable roof), unit footprint and height."""
    v = np.array([
        [-0.5, 0, -0.5], [0.5, 0, -0.5], [0.0, 1, -0.5],   # back gable
        [-0.5, 0, 0.5], [0.5, 0, 0.5], [0.0, 1, 0.5],      # front gable
    ], np.float32)
    faces = np.array([
        [0, 2, 1], [3, 4, 5],              # gables
        [0, 3, 5], [0, 5, 2],              # left slope
        [1, 2, 5], [1, 5, 4],              # right slope
        [0, 1, 4], [0, 4, 3],              # underside
    ], np.int32)
    pos = v[faces.reshape(-1)]
    e1 = pos[1::3] - pos[0::3]
    e2 = pos[2::3] - pos[0::3]
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    normals = np.repeat(fn, 3, axis=0)
    uvs = np.tile(np.array([[0, 0], [1, 0], [0.5, 1]], np.float32),
                  (len(faces), 1))
    idx = np.arange(len(pos), dtype=np.uint32)
    return shapes.Mesh(positions=pos, normals=normals, uvs=uvs, indices=idx)


# spawn order inside build_scene: ground plane = 0, Earth sphere = 1
SPHERE_INSTANCE = 1


def rotate_sphere(scene: Scene, angle: float) -> Scene:
    """Per-frame sphere_rotate_system analog (city.rs:104-112): mutate the
    sphere instance's transform IN PLACE (prev <- current) — O(1) host
    work, exactly like the reference's Transform component write. Scene
    reconstruction per frame (an earlier bench shape) costs ~120 ms of
    host Python and is NOT what the reference does."""
    inst = scene.instances[SPHERE_INSTANCE]
    inst.prev_transform = inst.transform
    inst.transform = make_transform(
        (0.0, 1.0, 0.0), rotation=rot_y(angle) @ rot_x(-np.pi / 2))
    return scene


def build_scene(waves: int = len(WAVES), sphere_angle: float = 0.0) -> Scene:
    """Scene after `waves` load-timer ticks (city.rs:144-199), with the
    emissive Earth sphere at `sphere_angle` (sphere_rotate_system)."""
    sc = Scene()
    meshes = {
        "cube": sc.add_mesh(shapes.cube(1.0)),
        "plane": sc.add_mesh(shapes.plane(1.0)),
        "sphere": sc.add_mesh(shapes.uv_sphere(0.5)),
        "roof": sc.add_mesh(_roof_prism()),
    }
    mats = {
        "ground": sc.add_material(StandardMaterial(
            base_color=(0.8, 0.7, 0.6, 1.0), perceptual_roughness=0.9)),
        "wall": sc.add_material(StandardMaterial(
            base_color=(0.85, 0.8, 0.7, 1.0), perceptual_roughness=0.85)),
        "roof": sc.add_material(StandardMaterial(
            base_color=(0.55, 0.25, 0.2, 1.0), perceptual_roughness=0.7)),
        "base": sc.add_material(StandardMaterial(
            base_color=(0.5, 0.5, 0.5, 1.0), perceptual_roughness=0.9)),
        "door": sc.add_material(StandardMaterial(
            base_color=(0.35, 0.22, 0.12, 1.0), perceptual_roughness=0.6)),
        "win": sc.add_material(StandardMaterial(
            base_color=(0.6, 0.75, 0.85, 1.0), perceptual_roughness=0.1,
            metallic=0.3)),
    }
    # ground plane (city.rs:62-77)
    sc.spawn(meshes["plane"], mats["ground"],
             make_transform((0, 0, 0), scale=(100, 1, 100)))
    # rotating emissive Earth sphere (city.rs:81-102)
    tex = _earth_texture()
    em = sc.add_material(StandardMaterial(
        base_color_texture=tex, emissive=(1.0, 1.0, 1.0, 0.5),
        emissive_texture=tex))
    rot = rot_y(sphere_angle) @ rot_x(-np.pi / 2)
    sc.spawn(meshes["sphere"], em, make_transform((0.0, 1.0, 0.0),
                                                  rotation=rot),
             prev_transform=make_transform(
                 (0.0, 1.0, 0.0), rotation=rot_y(sphere_angle - 0.2 / 60.0)
                 @ rot_x(-np.pi / 2)))
    # staggered house waves
    for wv in range(min(waves, len(WAVES))):
        for i, (x, z) in enumerate(WAVES[wv]):
            _spawn_house(sc, meshes, mats, x, z, seed=wv * 10 + i)
    sc.directional_light = DirectionalLight.from_euler(
        -np.pi / 4, np.pi / 4, 0.0, illuminance=10000.0)
    return sc


def main():
    args = parse_args("city: staggered loading + many instances + SMAA TU4X"
                      " + HDR + animated emissive sphere")
    import time

    import jax

    from examples.common import apply_overrides
    from hikari_tpu import Camera, Renderer

    settings = dataclasses.replace(HikariSettings(),
                                   upscale=Upscale.smaa_tu4x(2.0))
    settings = apply_overrides(settings, args)
    cam = Camera.from_look_at((0.0, 2.5, 20.0), (0, 0, 0),
                              width=args.width, height=args.height, hdr=True)
    # staggered loading: wave w lands at frame (w+1)*interval
    # (city.rs LoadTimer); between waves the sphere animates every frame
    # through the on-device refit path (models/refit_device.py)
    interval = max(2, args.frames // 5)
    waves_landed = 0
    scene = build_scene(waves=0)
    r = Renderer(scene, cam, settings)
    img = None
    t0 = time.perf_counter()
    for f in range(args.frames):
        angle = 0.2 * f / 60.0
        want_waves = min(len(WAVES), f // interval)
        if want_waves != waves_landed:
            waves_landed = want_waves
            scene = build_scene(waves_landed, angle)
            r.update_scene(scene, fast=False)
            print(f"[city] frame {f}: wave {waves_landed} landed "
                  f"({r.gpu_scene.num_instances} instances, "
                  f"{r.gpu_scene.num_triangles} tris)")
        elif f > 0:
            r.update_scene(rotate_sphere(scene, angle), fast=True)
        img = r.render_frame()
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / max(1, args.frames)
    print(f"[city] {args.frames} frames, {dt*1e3:.1f} ms/frame avg "
          f"(incl. {len(WAVES)} recompiles + per-frame refit)")
    out = args.out or "/tmp/city.png"
    r.save_png(out, np.asarray(img))
    print(f"[city] saved {out}")


if __name__ == "__main__":
    main()
