"""On-chip golden check: render the committed golden scenes on the REAL
TPU (where the fused Pallas kernels engage — the CPU goldens run the
modular path) and compare SSIM against tests/goldens/*.npz.

VERDICT r3 item 8: the fused path's Mosaic-compiled output needs an
on-chip anchor, not just interpret-mode parity. SSIM >= 0.98 vs the CPU
golden means the fused kernels reproduce the modular pipeline on hardware;
the rendered frames are saved as tests/goldens/<name>_tpu.png + .npz.

Usage: python tools/tpu_goldens.py  (on the axon TPU terminal)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.make_goldens import GOLDEN_DIR, configs, render_config


def ssim(a, b):
    """Global SSIM on the luminance (small images; matches
    tests/test_goldens.py's formulation)."""
    a = a[..., :3].mean(-1).astype(np.float64)
    b = b[..., :3].mean(-1).astype(np.float64)
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


def main():
    from hikari_tpu.utils.image import save_png

    results = {}
    for name in configs():
        ref_path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        ref = np.load(ref_path)["img"].astype(np.float32)
        img = np.asarray(render_config(name))
        s = ssim(img, ref)
        mad = np.abs(img[..., :3] - ref[..., :3]).mean()
        results[name] = (s, mad)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}_tpu.npz"),
                            img=img.astype(np.float16))
        save_png(os.path.join(GOLDEN_DIR, f"{name}_tpu.png"), img)
        print(f"{name:18s} SSIM {s:.4f}  mean|d| {mad:.5f}", flush=True)
    worst = min(s for s, _ in results.values())
    print(f"worst SSIM {worst:.4f} ({'OK' if worst >= 0.98 else 'DELTA'})")


if __name__ == "__main__":
    main()
