"""Benchmark matrix: frame time + ray throughput on the headline configs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): < 16 ms/frame at 1080p => vs_baseline =
16.0 / measured_ms (>1 is better than target).

The headline `value` is the FULL-RES lighting flagship (BASELINE config 2:
cornell, emissive NEE, denoise, no reuse — every lighting ray traced every
frame). The same JSON line carries the rest of the matrix (VERDICT r3
weak #6: the driver must see every config the rounds argue about):

  frame_ms_ckb     flagship + checkerboard lighting
  frame_ms_smaa2   flagship (NO reuse) + SMAA TU4X 2.0 + TAA Jasmine —
                   the post-chain envelope on top of the no-reuse flagship
  frame_ms_default literal HikariSettings(): temporal reuse + indirect
                   spatial reuse + denoise + TAA Jasmine + SMAA TU4X 2.0 —
                   the TRUE reference-default config every reference
                   example ships (lib.rs:436-455, examples/minimal.rs)
  frame_ms_reuse   flagship + temporal ReSTIR reuse (in-kernel), full-res
  frame_ms_spatial flagship + temporal + spatial reuse, full-res lighting
  frame_ms_ckb_reuse flagship + checkerboard + temporal reuse (modular
                   fallback path — light_fused excludes temporal x ckb)
  frame_ms_city    BASELINE config 5: high instance count + per-frame
                   on-device refit + SMAA TU4X + HDR (examples/city.py);
                   city_refit_ms is the host-visible update_scene(fast)
                   cost included in that frame time

Set BENCH_MATRIX=0 to emit only the flagship pair.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Probe the TPU tunnel in a SUBPROCESS before touching jax here: a wedged
# axon relay makes every device call hang forever (uninterruptible from
# Python), which would stall the whole bench run instead of reporting.
if os.environ.get("BENCH_SKIP_PROBE", "0") != "1":
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128)))"
             ".block_until_ready()"],
            timeout=180, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(json.dumps({
            "metric": "frame_ms_1080p", "value": None, "unit": "ms",
            "vs_baseline": None,
            "error": f"TPU tunnel unreachable ({type(e).__name__}); "
                     "see PERF.md for the last verified numbers"}))
        sys.exit(0)

import jax
import numpy as np


def _measure(r, frames: int, reps: int = 3):
    img = r.render_frame()
    jax.block_until_ready(img)
    # the axon tunnel's throughput drifts run-to-run (measured 44 vs 64 ms
    # for the SAME compiled program minutes apart); report the best of
    # `reps` repetitions — the min is the contention-robust statistic
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(frames):
            img = r.render_frame()
        jax.block_until_ready(img)
        out.append((time.perf_counter() - t0) / frames)
    return out


def main():
    import dataclasses

    from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale

    width = int(os.environ.get("BENCH_W", 1920))
    height = int(os.environ.get("BENCH_H", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 20))
    matrix = os.environ.get("BENCH_MATRIX", "1") == "1"

    from examples.cornell import build_scene

    scene = build_scene()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=width, height=height)

    # BASELINE config 2 (cornell): emissive alias-table NEE, denoise on,
    # no reuse; TAA/upscale off => lighting at full 1080p.
    flagship = dataclasses.replace(
        HikariSettings(),
        temporal_reuse=False, denoise=True, indirect_bounces=1,
        taa=Taa.NONE, upscale=Upscale.none(),
        emissive_spatial_reuse=False, indirect_spatial_reuse=False,
        checkerboard_lighting=False)

    reps_full = _measure(Renderer(scene, cam, flagship), frames)
    dt = min(reps_full)
    frame_ms = dt * 1e3

    # rays per frame: 1 primary per full-res pixel + per-render-res-pixel:
    # direct shadow + emissive (probe + shadow) + indirect (bounce + NEE
    # probe + NEE shadow) per bounce
    from hikari_tpu.frame import scaled_size

    rh, rw = scaled_size((height, width), flagship.upscale_ratio)
    n_render = rh * rw
    rays = height * width + n_render * (1 + 2 + 3 * flagship.indirect_bounces)
    mrays = rays / dt / 1e6

    out = {
        "metric": "frame_ms_1080p",
        "value": round(frame_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / frame_ms, 4),
        "scene": "cornell",
        "mrays_per_s": round(mrays, 1),
        "reps_ms": [round(x * 1e3, 2) for x in reps_full],
        "device": str(jax.devices()[0]),
    }
    if not matrix:
        print(json.dumps(out))
        return

    def try_cfg(key, settings, reps=2, scn=None, camera=None):
        try:
            r = Renderer(scn if scn is not None else scene,
                         camera if camera is not None else cam, settings)
            ms = _measure(r, frames, reps=reps)
            out[key] = round(min(ms) * 1e3, 3)
        except Exception as e:  # pragma: no cover - matrix robustness
            out[key + "_error"] = f"{type(e).__name__}: {e}"[:200]

    try_cfg("frame_ms_ckb",
            dataclasses.replace(flagship, checkerboard_lighting=True))
    try_cfg("frame_ms_smaa2",
            dataclasses.replace(flagship, taa=Taa.JASMINE,
                                upscale=Upscale.smaa_tu4x(2.0)))
    # the TRUE reference default: every reference example runs literal
    # HikariSettings::default() (temporal + indirect-spatial reuse,
    # denoise, TAA Jasmine, SMAA TU4X 2.0 — lib.rs:436-455)
    try_cfg("frame_ms_default", HikariSettings())
    try_cfg("frame_ms_reuse",
            dataclasses.replace(flagship, temporal_reuse=True))
    try_cfg("frame_ms_spatial",
            dataclasses.replace(flagship, temporal_reuse=True,
                                emissive_spatial_reuse=True,
                                indirect_spatial_reuse=True))
    try_cfg("frame_ms_ckb_reuse",
            dataclasses.replace(flagship, temporal_reuse=True,
                                checkerboard_lighting=True))

    # BASELINE config 5: city — high instance count, per-frame on-device
    # refit (animated emissive sphere), SMAA TU4X, HDR (examples/city.py /
    # city.rs:144-199). Frame cost = update_scene(fast, device) + render.
    try:
        from examples.city import build_scene as build_city
        from examples.city import rotate_sphere

        city_settings = dataclasses.replace(
            HikariSettings(), upscale=Upscale.smaa_tu4x(2.0))
        city_cam = Camera.from_look_at(
            (0.0, 2.5, 20.0), (0, 0, 0), width=width, height=height,
            hdr=True)
        city_scene = build_city()
        rc = Renderer(city_scene, city_cam, city_settings)
        # warm both programs (refit + render). The per-frame animation
        # mutates ONE transform (sphere_rotate_system, city.rs:104-112) —
        # rebuilding the whole host scene graph per frame is not what the
        # reference does and measured ~120 ms of pure host Python.
        rc.update_scene(rotate_sphere(city_scene, 0.001), fast=True)
        jax.block_until_ready(rc.render_frame())
        refit_ms, total = [], []
        for rep in range(2):
            t0 = time.perf_counter()
            for f in range(8):
                ta = time.perf_counter()
                rc.update_scene(
                    rotate_sphere(city_scene, 0.2 * (f + 1) / 60.0),
                    fast=True)
                refit_ms.append((time.perf_counter() - ta) * 1e3)
                img = rc.render_frame()
            jax.block_until_ready(img)
            total.append((time.perf_counter() - t0) / 8)
        out["frame_ms_city"] = round(min(total) * 1e3, 3)
        out["city_refit_ms"] = round(float(np.median(refit_ms)), 3)
        out["city_instances"] = int(rc.gpu_scene.num_instances)
        out["city_triangles"] = int(rc.gpu_scene.num_triangles)
    except Exception as e:  # pragma: no cover
        out["frame_ms_city_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
