"""Dynamic transforms: fast refit path vs full recompile, velocity output."""

import dataclasses

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale
from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.material import StandardMaterial
from hikari_tpu.models.scene import Scene, make_transform


def moving_scene(t):
    sc = Scene()
    cube = sc.add_mesh(shapes.cube(1.0))
    plane = sc.add_mesh(shapes.plane(8.0))
    m0 = sc.add_material(StandardMaterial.from_color(0.8, 0.2, 0.2))
    m1 = sc.add_material(StandardMaterial.from_color(0.3, 0.5, 0.3))
    sc.spawn(cube, m0, make_transform((t, 0.5, 0.0)),
             prev_transform=make_transform((t - 0.1, 0.5, 0.0)))
    sc.spawn(plane, m1)
    return sc


def test_update_transforms_matches_recompile():
    sc0 = moving_scene(0.0)
    gpu = sc0.compile()
    sc1 = moving_scene(0.5)
    fast = gpu.update_transforms(sc1)
    full = sc1.compile()
    assert np.allclose(fast.arrays["tri_pos"], full.arrays["tri_pos"], atol=1e-4)
    assert np.allclose(fast.arrays["inst_motion"], full.arrays["inst_motion"],
                       atol=1e-5)
    assert np.allclose(fast.arrays["inst_aabb_min"], full.arrays["inst_aabb_min"],
                       atol=1e-4)
    # refit bounds contain the rebuilt ones
    assert (fast.arrays["bvh_min"].min() <= full.arrays["bvh_min"].min() + 1e-4)


def test_moving_object_produces_velocity():
    st = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                             upscale=Upscale.none())
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=64, height=40)
    r = Renderer(moving_scene(0.0), cam, st)
    dbg = r.render_dissection()
    vel = dbg["gbuffer_velocity_uv"][..., :2]
    # the cube moved by 0.1 world units -> nonzero velocity on cube pixels
    assert np.abs(vel).max() > 1e-4
    # plane is static -> most pixels near zero
    assert np.median(np.abs(vel)) < 1e-5
