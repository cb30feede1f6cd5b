"""Capture a jax.profiler device trace of the bench frame and print the
top XLA ops by device time (parsed from the trace protobuf).

Usage: python tools/profile_frame.py [out_dir]
Env: same BENCH_* switches as bench.py.
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import os
import sys

import jax

sys.path.insert(0, "/root/repo")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hikari_trace"
    from examples.cornell import build_scene
    from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale

    upscale_mode = os.environ.get("BENCH_UPSCALE", "none")
    settings = dataclasses.replace(
        HikariSettings(),
        temporal_reuse=os.environ.get("BENCH_REUSE", "0") == "1",
        emissive_spatial_reuse=False,
        indirect_spatial_reuse=False,
        denoise=os.environ.get("BENCH_DENOISE", "1") == "1",
        indirect_bounces=int(os.environ.get("BENCH_BOUNCES", "1")),
        taa=Taa.JASMINE if upscale_mode == "smaa2" else Taa.NONE,
        upscale=Upscale.smaa_tu4x(2.0) if upscale_mode == "smaa2"
        else Upscale.none(),
        checkerboard_lighting=os.environ.get("BENCH_CKB", "1") == "1",
    )
    scene = build_scene()
    cam = Camera.from_look_at((0.0, 1.0, 3.2), (0.0, 1.0, 0.0),
                              width=int(os.environ.get("BENCH_W", 1920)),
                              height=int(os.environ.get("BENCH_H", 1080)))
    r = Renderer(scene, cam, settings)
    img = r.render_frame()
    jax.block_until_ready(img)
    img = r.render_frame()
    jax.block_until_ready(img)

    jax.profiler.start_trace(out)
    for _ in range(3):
        img = r.render_frame()
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    # ---- parse the trace.json.gz for device-side op durations ----
    paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", out)
        return
    import json
    from collections import defaultdict

    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    durs = defaultdict(float)
    counts = defaultdict(int)
    names = {}
    cats = defaultdict(float)
    outer = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        d = e.get("dur", 0)
        if name.startswith("jit_"):
            outer += d
            continue
        args = e.get("args", {})
        cats[args.get("hlo_category", "?")] += d
        key = name
        durs[key] += d
        counts[key] += 1
        ln = args.get("long_name", "")
        if ln and key not in names:
            names[key] = ln
    total = sum(durs.values())
    print(f"trace: {path}")
    print(f"outer program: {outer/1e3/3:.2f} ms/frame; "
          f"inner ops sum: {total/1e3/3:.2f} ms/frame (3 frames)")
    print("by category:")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {d/1e3/3:8.3f} ms  {c}")
    print("top ops:")
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:60]
    for name, d in top:
        ln = names.get(name, "")
        # shapes out of the long_name: "%x = f32[...]{...} op(...)"
        sig = ln.split(" = ", 1)[-1][:150] if ln else ""
        print(f"  {d/1e3/3:8.3f} ms  x{counts[name]:<4d} {name[:40]:40s} {sig}")


if __name__ == "__main__":
    main()
