"""Per-channel dissection renders + structural checks (VERDICT r2 item 10).

The reference's assets/screenshots/dissection/*.png (render-graph debug
captures: direct/emissive/indirect x temporal/spatial/denoised) are of the
WW2-town glTF that the reference repo does NOT ship (models/scene.gltf has
no buffers/textures in-tree), so a pixel/SSIM comparison against them is
impossible for ANY rebuild. What CAN be validated:

1. our own dissection set for cornell + simple (reuse on) — the same
   channel grid the reference documents, saved for visual inspection;
2. structural invariants the reference images exhibit:
   - tone_mapping == direct + emissive + indirect (denoised channels);
   - the denoised channel of each lighting component is smoother than its
     raw reservoir output (total-variation ratio < 1);
   - with spatial reuse enabled, per-pixel reservoir counts grow past the
     temporal-only ceiling over the first frames.

Run on CPU for determinism: python tools/dissect_parity.py [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np

from hikari_tpu import Camera, HikariSettings, Renderer, Taa, Upscale
from hikari_tpu.utils.image import save_png


def tv(img):
    """Mean total variation (noise proxy)."""
    d = np.asarray(img, np.float32)[..., :3]
    return float(np.abs(np.diff(d, axis=0)).mean()
                 + np.abs(np.diff(d, axis=1)).mean())


def run(name, build, cam_kw, settings, frames, outdir):
    cam = Camera.from_look_at(width=320, height=240, **cam_kw)
    r = Renderer(build(), cam, settings)
    for _ in range(frames):
        r.render_frame()
    dbg = r.render_dissection()
    os.makedirs(outdir, exist_ok=True)
    rows = []
    for ch in ("direct", "emissive", "indirect"):
        raw = np.asarray(dbg[f"{ch}_raw"])
        den = np.asarray(dbg[f"{ch}_denoised"])
        a = np.concatenate([np.clip(raw[..., :3], 0, 1),
                            np.ones_like(raw[..., :1])], -1)
        b = np.concatenate([np.clip(den[..., :3], 0, 1),
                            np.ones_like(den[..., :1])], -1)
        save_png(os.path.join(outdir, f"{name}-{ch}-temporal.png"), a)
        save_png(os.path.join(outdir, f"{name}-{ch}-denoised.png"), b)
        ratio = tv(den) / max(tv(raw), 1e-9)
        rows.append((ch, tv(raw), tv(den), ratio))
    tone = np.asarray(dbg["tone_mapping"])
    save_png(os.path.join(outdir, f"{name}-tone-mapping.png"),
             np.concatenate([np.clip(tone[..., :3], 0, 1),
                             np.ones_like(tone[..., :1])], -1))
    # invariant: tone = reinhard(sum of denoised channels) -> check the sum
    s = sum(np.asarray(dbg[f"{c}_denoised"])[..., :3]
            for c in ("direct", "emissive", "indirect"))
    lum = s / (1.0 + s.mean(-1, keepdims=True) + 1e-9)
    print(f"== {name} (frames={frames}) ==")
    for ch, tvr, tvd, ratio in rows:
        flag = "ok " if (ratio < 1.0 or tvr < 1e-6) else "WARN"
        print(f"  {ch:9s} tv_raw {tvr:8.4f} tv_denoised {tvd:8.4f} "
              f"ratio {ratio:5.2f} [{flag}]")
    print(f"  tone/channel-sum corr: "
          f"{np.corrcoef(np.asarray(tone)[..., :3].ravel(), lum.ravel())[0, 1]:.3f}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "assets/dissection"
    from examples.cornell import build_scene as cornell
    from examples.simple import build_scene as simple

    reuse = dict(temporal_reuse=True, emissive_spatial_reuse=True,
                 indirect_spatial_reuse=True, denoise=True, taa=Taa.NONE,
                 upscale=Upscale.none(), checkerboard_lighting=False)
    run("cornell", cornell, dict(eye=(0.0, 1.0, 3.2), target=(0, 1, 0)),
        dataclasses.replace(HikariSettings(), **reuse), 16, outdir)
    run("simple", simple, dict(eye=(-10.0, 2.5, 20.0), target=(0, 0, 0)),
        dataclasses.replace(HikariSettings(), **reuse), 16, outdir)


if __name__ == "__main__":
    main()
