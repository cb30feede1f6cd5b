"""Repro for the 44-row sharded denoise delta (tests/test_parallel.py
xfail): run the parity config, dump per-frame max image delta and its row
histogram, and optionally bisect stages via HIKARI_POST_BYPASS.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/debug_44row.py [h] [w]
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
_fl = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _fl:
    os.environ["XLA_FLAGS"] = (
        _fl + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize forces jax_platforms="axon,cpu" over the env var
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from examples.minimal import build_scene
from hikari_tpu import Camera, HikariSettings, Taa, Upscale
from hikari_tpu.config import make_frame_uniform
from hikari_tpu.frame import (
    build_render_frame,
    init_carry,
    scaled_size,
    spatial_fused_active,
    _post_size,
)
from hikari_tpu.ops.noise import noise_constant
from hikari_tpu.ops.trace import make_tracer
from hikari_tpu.parallel.mesh import make_mesh, pixel_sharding, shard_frame


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 44
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    settings = dataclasses.replace(
        HikariSettings(),
        temporal_reuse=os.environ.get("DBG_REUSE", "1") == "1",
        denoise=os.environ.get("DBG_DENOISE", "1") == "1",
        taa=Taa.NONE,
        upscale=Upscale.none(), checkerboard_lighting=False)
    gpu = build_scene().compile()
    cam = Camera.from_look_at((-2, 2.5, 5), (0, 0, 0), width=w, height=h)
    tracer = make_tracer(gpu.num_triangles)
    fn = build_render_frame(settings, (h, w), tracer, no_texture=True,
                            num_emissives=gpu.num_emissives,
                            has_sun=gpu.has_sun)
    scene = gpu.as_pytree()
    view = {k: jnp.asarray(v) for k, v in cam.view_uniform().items()}
    noise = noise_constant()
    carry1 = init_carry((h, w), settings,
                        spatial_planes=spatial_fused_active(
                            scene, settings, tracer, True,
                            gpu.num_emissives, gpu.has_sun, (h, w)))
    if os.environ.get("DBG_STEPS"):
        import hikari_tpu.ops.denoise as _dn0

        _dn0._STEPS = tuple(
            int(s) for s in os.environ["DBG_STEPS"].split(","))

    if os.environ.get("DBG_DUMP"):
        # capture the REAL denoise inputs (single-device trace) to npz for
        # standalone replay
        import hikari_tpu.ops.denoise as _dnD

        _orig_dn = _dnD.denoise_channels
        _dumped = {}

        def _dump_cb(**arrs):
            for k, v in arrs.items():
                _dumped[k] = np.asarray(v)
            np.savez("/tmp/dn_inputs.npz", **_dumped)

        def _wrap(g2, albedo, chans2, frame2, render_size, ratio,
                  albedo_r=None, fused=None):
            import jax.experimental as _jex

            arrs = {"albedo": albedo,
                    "albedo_r": albedo_r if albedo_r is not None
                    else albedo}
            for kk in ("position", "normal", "depth_gradient",
                       "instance_material"):
                arrs[f"g_{kk}"] = g2[kk]
            for ci, (r, v, _) in enumerate(chans2):
                arrs[f"render{ci}"] = r
                arrs[f"var{ci}"] = v
            _jex.io_callback(lambda **a: _dump_cb(**a), None, **arrs)
            return _orig_dn(g2, albedo, chans2, frame2, render_size,
                            ratio, albedo_r=albedo_r, fused=fused)

        _dnD.denoise_channels = _wrap

    tap = os.environ.get("DBG_TAP")
    if tap:
        # route a denoise INPUT to the image so sharded-vs-single diffs of
        # that input become visible (the composition bug hunt)
        import hikari_tpu.ops.denoise as _dn

        def _tap(g2, albedo, chans2, frame2, render_size, ratio,
                 albedo_r=None, fused=None):
            outs = []
            for render, var, _ in chans2:
                if tap == "var":
                    o = jnp.broadcast_to(var[..., None], var.shape + (4,))
                elif tap == "grad":
                    gr = g2["depth_gradient"]
                    o = jnp.concatenate([gr, gr], -1)
                elif tap == "albedo":
                    o = albedo_r if albedo_r is not None else albedo
                elif tap == "geo":
                    o = jnp.stack([g2["position"][..., 3],
                                   g2["instance_material"][..., 0],
                                   g2["normal"][..., 0],
                                   g2["normal"][..., 1]], -1)
                else:  # render passthrough
                    o = render
                outs.append(o)
            return outs

        _dn.denoise_channels = _tap

    mesh = make_mesh(8)
    render_size = scaled_size((h, w), settings.upscale_ratio)
    rows = {h, render_size[0], _post_size(settings, render_size)[0]}
    jfn, args = shard_frame(fn, mesh, scene, view,
                            make_frame_uniform(settings, 1), noise, carry1,
                            rows)
    scene_s, view_s, _, noise_s, carry8 = args
    carry_sh = pixel_sharding(mesh, carry1, rows)
    fn1 = jax.jit(fn)
    for i in range(1, 4):
        frame = make_frame_uniform(settings, i)
        img1, _, carry1 = fn1(scene, view, frame, noise, carry1)
        carry8 = jax.tree.map(jax.device_put, carry8, carry_sh)
        img8, _, carry8 = jfn(scene_s, view_s, frame, noise_s, carry8)
        d = np.abs(np.asarray(img1) - np.asarray(img8)).max(axis=(1, 2))
        bad = np.nonzero(d > 1e-4)[0]
        print(f"frame {i}: max {d.max():.2e} rows>{1e-4:g}: {bad.tolist()}")
        # which carry fields diverge?
        from hikari_tpu.ops import reservoir as rsv

        for k in ("direct_temporal", "emissive_temporal",
                  "indirect_temporal"):
            r1 = rsv.unpack_reservoir_planes(carry1[k])
            r8 = rsv.unpack_reservoir_planes(carry8[k])
            for f in r1:
                dd = np.abs(np.asarray(r1[f], np.float32)
                            - np.asarray(r8[f], np.float32))
                if dd.max() > 1e-4:
                    rows_bad = np.nonzero(dd.max(axis=tuple(
                        range(1, dd.ndim)))> 1e-4)[0]
                    print(f"  carry {k}.{f}: max {dd.max():.2e} "
                          f"rows {rows_bad.tolist()[:12]}")


if __name__ == "__main__":
    main()
