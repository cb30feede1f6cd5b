"""On-device transform update + refit (models/refit_device.py) vs the host
fast path (GpuScene.update_transforms) and a full recompile."""

import numpy as np
import jax
import jax.numpy as jnp

from hikari_tpu.models import mesh as shapes
from hikari_tpu.models.material import StandardMaterial
from hikari_tpu.models.refit_device import DeviceRefitter
from hikari_tpu.models.scene import Scene, make_transform


def build(t, spin):
    sc = Scene()
    cube = sc.add_mesh(shapes.cube(1.0))
    plane = sc.add_mesh(shapes.plane(8.0))
    sphere = sc.add_mesh(shapes.uv_sphere(0.4, 12, 8))
    m0 = sc.add_material(StandardMaterial.from_color(0.8, 0.2, 0.2))
    m1 = sc.add_material(StandardMaterial.from_color(0.3, 0.5, 0.3))
    me = sc.add_material(StandardMaterial(emissive=(4.0, 3.0, 2.0, 1.0)))
    c, s = np.cos(spin), np.sin(spin)
    rot = np.array([[c, 0, s, t], [0, 1, 0, 0.5], [-s, 0, c, 0], [0, 0, 0, 1]],
                   np.float32)
    sc.spawn(cube, m0, rot,
             prev_transform=make_transform((t - 0.1, 0.5, 0.0)))
    sc.spawn(plane, m1)
    sc.spawn(sphere, me, make_transform((0.0, 1.5 + t, 0.0)),
             prev_transform=make_transform((0.0, 1.5 + t - 0.05, 0.0)))
    return sc


def models_of(sc):
    vis = [i for i in sc.instances if i.visible]
    cur = np.stack([np.asarray(i.transform, np.float32) for i in vis])
    prev = np.stack([
        np.asarray(i.transform if i.prev_transform is None
                   else i.prev_transform, np.float32) for i in vis])
    return cur, prev


def test_device_refit_matches_host_fast_path():
    gpu = build(0.0, 0.0).compile()
    sc1 = build(0.7, 0.6)
    host = gpu.update_transforms(sc1)

    ref = DeviceRefitter(gpu)
    cur, prev = models_of(sc1)
    out = jax.jit(ref.update)(jnp.asarray(cur), jnp.asarray(prev))

    for key, tol in [("tri_pos_flat", 1e-4), ("tri_attr", 1e-4),
                     ("inst_motion", 1e-4),
                     ("inst_aabb_min", 1e-4), ("inst_aabb_max", 1e-4),
                     ("em_tri_pos_flat", 1e-4)]:
        got = np.asarray(out[key])
        want = np.asarray(host.arrays[key])
        assert got.shape == want.shape, key
        big = np.abs(want) > 1e20  # padding sentinels
        assert np.allclose(got[~big], want[~big], atol=tol), (
            key, np.abs(got[~big] - want[~big]).max())

    # BVH node AABBs identical to the host refit (same math)
    got = np.asarray(out["bvh_packed"])
    want = host.arrays["bvh_packed"]
    assert np.allclose(got[:, :6], want[:, :6], atol=1e-4)
    assert np.array_equal(got[:, 6:], want[:, 6:])

    # emissive sphere bounds follow the instance (reference corner-transform
    # semantics, instance.rs:286-305: device may be conservatively equal or
    # larger for rotated instances; here emitter motion is a translation)
    assert np.allclose(np.asarray(out["em_position"]),
                       host.arrays["em_position"], atol=1e-4)
    assert np.all(np.asarray(out["em_radius"])
                  >= host.arrays["em_radius"] - 1e-4)


def test_device_refit_cluster_tables():
    # force cluster tables by lowering the threshold via a dense mesh
    sc0 = Scene()
    sph = sc0.add_mesh(shapes.uv_sphere(1.0, 64, 48))
    m0 = sc0.add_material(StandardMaterial.from_color(0.7, 0.7, 0.7))
    sc0.spawn(sph, m0, make_transform((0.0, 0.0, 0.0)))
    gpu = sc0.compile()
    if "cl_tri_packed" not in gpu.arrays:
        import pytest
        pytest.skip("scene too small for cluster tables")

    sc1 = Scene()
    sph = sc1.add_mesh(shapes.uv_sphere(1.0, 64, 48))
    m0 = sc1.add_material(StandardMaterial.from_color(0.7, 0.7, 0.7))
    sc1.spawn(sph, m0, make_transform((2.0, 1.0, -0.5)))
    host = gpu.update_transforms(sc1)

    ref = DeviceRefitter(gpu)
    cur, prev = models_of(sc1)
    out = jax.jit(ref.update)(jnp.asarray(cur), jnp.asarray(prev))

    got = np.asarray(out["cl_tri_packed"])
    want = host.arrays["cl_tri_packed"]
    assert got.shape == want.shape
    ok = np.abs(want) < 1e20
    assert np.allclose(got[ok], want[ok], atol=1e-3), \
        np.abs(got[ok] - want[ok]).max()
    got_a = np.asarray(out["cl_aabb"])
    want_a = host.arrays["cl_aabb"]
    ok = np.abs(want_a) < 1e20
    assert np.allclose(got_a[ok], want_a[ok], atol=1e-3)


def test_renderer_device_refit_matches_host_refit_image():
    import dataclasses
    from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale

    st = dataclasses.replace(HikariSettings(), denoise=False, taa=Taa.NONE,
                             upscale=Upscale.none(), temporal_reuse=False,
                             emissive_spatial_reuse=False,
                             indirect_spatial_reuse=False)
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=64, height=40)

    imgs = {}
    for device in (False, True):
        r = Renderer(build(0.0, 0.0), cam, st)
        r.render_frame()
        r.update_scene(build(0.6, 0.4), fast=True, device=device)
        imgs[device] = np.asarray(r.render_frame())
    a, b = imgs[False], imgs[True]
    assert np.isfinite(b).all()
    # identical geometry => near-identical images (fp tolerance only)
    assert np.abs(a - b).max() < 5e-2, np.abs(a - b).max()
