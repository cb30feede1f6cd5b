"""Benchmark: frame time + ray throughput on the flagship scene at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): < 16 ms/frame at 1080p => vs_baseline =
16.0 / measured_ms (>1 is better than target).

The headline `value` is the FULL-RES lighting config (every lighting ray
traced every frame — apples-to-apples with BASELINE config 2). Since the
fused lighting kernel landed (round 3), full-res is also FASTER than
checkerboard: the compress/expand + reconstruction overhead now exceeds the
halved ray cost. The JSON still carries the checkerboard number
(`frame_ms_ckb`) so the pair stays visible (VERDICT r2 weak #4).
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
                     "see PERF.md round-3 note — last good flagship "
                     "14.9 ms full-res / 975 Mrays/s"}))
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

    import os as _o
    width = int(_o.environ.get("BENCH_W", 1920))
    height = int(_o.environ.get("BENCH_H", 1080))
    frames = 20

    # Flagship config: cornell-class scene (emissive NEE + denoise, no reuse)
    # per BASELINE.json config 2. Falls back to the minimal scene until the
    # glTF path is benchmarked.
    try:
        from examples.cornell import build_scene

        scene = build_scene()
        camera_kwargs = dict(eye=(0.0, 1.0, 3.2), target=(0.0, 1.0, 0.0))
        name = "cornell"
    except Exception:
        from examples.minimal import build_scene

        scene = build_scene()
        camera_kwargs = dict(eye=(-2.0, 2.5, 5.0), target=(0, 0, 0))
        name = "minimal"

    # BASELINE config 2 (cornell): "emissive alias-table NEE, denoise on,
    # no reuse". TAA/upscale off => lighting at full 1080p.
    # BENCH_UPSCALE=smaa2 selects the reference-default config instead
    # (SMAA TU4X ratio 2 + TAA Jasmine — lib.rs:436-455).
    upscale_mode = _o.environ.get("BENCH_UPSCALE", "none")
    base = dataclasses.replace(
        HikariSettings(),
        temporal_reuse=_o.environ.get("BENCH_REUSE", "0") == "1",
        denoise=_o.environ.get("BENCH_DENOISE", "1") == "1",
        indirect_bounces=int(_o.environ.get("BENCH_BOUNCES", "1")),
        taa=Taa.JASMINE if upscale_mode == "smaa2"
        and _o.environ.get("BENCH_TAA", "1") == "1" else Taa.NONE,
        upscale=Upscale.smaa_tu4x(2.0) if upscale_mode == "smaa2"
        else Upscale.none(),
        # BENCH_SPATIAL=1 turns spatial reuse on; BENCH_SCRAMBLE=1 adds the
        # per-pixel tap scramble (tools/scramble_ab.py A/B)
        emissive_spatial_reuse=_o.environ.get("BENCH_SPATIAL", "0") == "1",
        indirect_spatial_reuse=_o.environ.get("BENCH_SPATIAL", "0") == "1",
        spatial_tap_scramble=_o.environ.get("BENCH_SCRAMBLE", "0") == "1",
    )
    cam = Camera.from_look_at(width=width, height=height, **camera_kwargs)

    # checkerboard lighting (half the lighting rays/frame, depth/normal-aware
    # reconstruction; ops/checkerboard.py) — a TPU-native option kept for the
    # bench matrix. Headline = full-res (BASELINE-comparable AND faster since
    # the fused kernel); BENCH_CKB=1 also measures the checkerboard config.
    run_ckb = _o.environ.get("BENCH_CKB", "1") == "1"
    reps_full = _measure(Renderer(
        scene, cam, dataclasses.replace(base, checkerboard_lighting=False)),
        frames)
    reps_ckb = _measure(Renderer(
        scene, cam, dataclasses.replace(base, checkerboard_lighting=True)),
        frames) if run_ckb else reps_full
    dt = min(reps_full)
    frame_ms = dt * 1e3

    # rays per frame: 1 primary per full-res pixel + per-render-res-pixel:
    # direct shadow + emissive (probe + shadow) + indirect (bounce + NEE
    # probe + NEE shadow) per bounce
    from hikari_tpu.frame import scaled_size

    rh, rw = scaled_size((height, width), base.upscale_ratio)
    n_render = rh * rw
    rays = height * width + n_render * (1 + 2 + 3 * base.indirect_bounces)
    mrays = rays / dt / 1e6

    out = {
        "metric": "frame_ms_1080p",
        "value": round(frame_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / frame_ms, 4),
        "scene": name,
        "checkerboard": False,
        "mrays_per_s": round(mrays, 1),
        "reps_ms": [round(x * 1e3, 2) for x in reps_full],
        "device": str(jax.devices()[0]),
    }
    if run_ckb:
        out["frame_ms_ckb"] = round(min(reps_ckb) * 1e3, 3)
        out["reps_ms_ckb"] = [round(x * 1e3, 2) for x in reps_ckb]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
