"""AMD FidelityFX Super Resolution 1.0: EASU upscale + RCAS sharpen.

The reference ships prebuilt SPIR-V blobs for these two passes
(src/shaders/fsr/fsr_pass_easu.spv / fsr_pass_rcas.spv, loaded lib.rs:176-187)
compiled from AMD's public ffx_fsr1.h. This is a from-spec tensor
implementation of the same published algorithm (12-tap edge-adaptive
elliptical Lanczos-like filter + deringing, and the robust contrast-adaptive
sharpener), vectorized over the whole image.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fetch(img, iy, ix):
    h, w = img.shape[:2]
    return img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]


def _luma(c):
    # FSR feature luma: B*0.5 + R*0.5 + G
    return c[..., 2] * 0.5 + (c[..., 0] * 0.5 + c[..., 1])


def easu(img, out_size):
    """Edge-adaptive spatial upsampling. img [ih,iw,C] -> [oh,ow,3]."""
    ih, iw = img.shape[:2]
    oh, ow = out_size
    ox = jnp.arange(ow, dtype=jnp.float32)
    oy = jnp.arange(oh, dtype=jnp.float32)
    u, v = jnp.meshgrid(ox, oy)
    ppx = (u + 0.5) * (iw / ow) - 0.5
    ppy = (v + 0.5) * (ih / oh) - 0.5
    fpx = jnp.floor(ppx)
    fpy = jnp.floor(ppy)
    px = ppx - fpx
    py = ppy - fpy
    ix = fpx.astype(jnp.int32)
    iy = fpy.astype(jnp.int32)

    #  b c
    # e f g h
    # i j k l
    #  n o
    offs = {"b": (0, -1), "c": (1, -1), "e": (-1, 0), "f": (0, 0), "g": (1, 0),
            "h": (2, 0), "i": (-1, 1), "j": (0, 1), "k": (1, 1), "l": (2, 1),
            "n": (0, 2), "o": (1, 2)}
    tex = {k: _fetch(img, iy + dy, ix + dx)[..., :3] for k, (dx, dy) in offs.items()}
    lum = {k: _luma(c) for k, c in tex.items()}

    dir_x = jnp.zeros_like(px)
    dir_y = jnp.zeros_like(px)
    length = jnp.zeros_like(px)

    def easu_set(w, la, lb, lc, ld, le):
        nonlocal dir_x, dir_y, length
        lenx = jnp.maximum(jnp.abs(ld - lc), jnp.abs(lc - lb))
        lenx = 1.0 / jnp.maximum(lenx, 1e-5)
        dx = ld - lb
        dir_x = dir_x + dx * w
        lx = jnp.clip(jnp.abs(dx) * lenx, 0.0, 1.0) ** 2
        leny = jnp.maximum(jnp.abs(le - lc), jnp.abs(lc - la))
        leny = 1.0 / jnp.maximum(leny, 1e-5)
        dy = le - la
        dir_y = dir_y + dy * w
        ly = jnp.clip(jnp.abs(dy) * leny, 0.0, 1.0) ** 2
        length = length + (lx + ly) * w

    easu_set((1 - px) * (1 - py), lum["b"], lum["e"], lum["f"], lum["g"], lum["j"])
    easu_set(px * (1 - py), lum["c"], lum["f"], lum["g"], lum["h"], lum["k"])
    easu_set((1 - px) * py, lum["f"], lum["i"], lum["j"], lum["k"], lum["n"])
    easu_set(px * py, lum["g"], lum["j"], lum["k"], lum["l"], lum["o"])

    dir_r = dir_x * dir_x + dir_y * dir_y
    zro = dir_r < (1.0 / 32768.0)
    rsq = 1.0 / jnp.sqrt(jnp.maximum(dir_r, 1e-20))
    dir_xn = jnp.where(zro, 1.0, dir_x * rsq)
    dir_yn = jnp.where(zro, 0.0, dir_y * rsq)
    length = (length * 0.5) ** 2

    stretch = (dir_xn * dir_xn + dir_yn * dir_yn) / jnp.maximum(
        jnp.maximum(jnp.abs(dir_xn), jnp.abs(dir_yn)), 1e-5)
    len2x = 1.0 + (stretch - 1.0) * length
    len2y = 1.0 - 0.5 * length
    lob = 0.5 + ((1.0 / 4.0 - 0.04) - 0.5) * length
    clp = 1.0 / jnp.maximum(lob, 1e-5)

    min4 = jnp.minimum(jnp.minimum(tex["f"], tex["g"]),
                       jnp.minimum(tex["j"], tex["k"]))
    max4 = jnp.maximum(jnp.maximum(tex["f"], tex["g"]),
                       jnp.maximum(tex["j"], tex["k"]))

    acc = jnp.zeros(px.shape + (3,))
    acc_w = jnp.zeros_like(px)
    for k, (dx, dy) in offs.items():
        offx = dx - px
        offy = dy - py
        vx = (offx * dir_xn + offy * dir_yn) * len2x
        vy = (offx * -dir_yn + offy * dir_xn) * len2y
        d2 = jnp.minimum(vx * vx + vy * vy, clp)
        wb = (2.0 / 5.0) * d2 - 1.0
        wa = lob * d2 - 1.0
        wb = wb * wb
        wa = wa * wa
        wb = (25.0 / 16.0) * wb - (25.0 / 16.0 - 1.0)
        wgt = wb * wa
        acc = acc + tex[k] * wgt[..., None]
        acc_w = acc_w + wgt

    out = acc / jnp.maximum(acc_w, 1e-5)[..., None]
    out = jnp.clip(out, min4, max4)
    return out


RCAS_LIMIT = 0.25 - 1.0 / 16.0


def rcas(img, sharpness: float):
    """Robust contrast-adaptive sharpening. sharpness in stops (0 = max)."""
    sharp = 2.0 ** (-float(sharpness))

    def sh(dy, dx):
        return jnp.roll(img[..., :3], (-dy, -dx), axis=(0, 1))

    e = img[..., :3]
    b = sh(-1, 0)
    d = sh(0, -1)
    f = sh(0, 1)
    h = sh(1, 0)
    mn4 = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
    mx4 = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
    hit_min = jnp.minimum(mn4, e) / jnp.maximum(4.0 * mx4, 1e-5)
    hit_max = (1.0 - jnp.maximum(mx4, e)) / jnp.minimum(4.0 * mn4 - 4.0, -1e-5)
    lobe_rgb = jnp.maximum(-hit_min, hit_max)
    lobe = jnp.maximum(
        -RCAS_LIMIT, jnp.minimum(jnp.max(lobe_rgb, axis=-1), 0.0)) * sharp
    rcp = 1.0 / (4.0 * lobe + 1.0)
    out = ((b + d + f + h) * lobe[..., None] + e) * rcp[..., None]
    if img.shape[-1] == 4:
        out = jnp.concatenate([out, img[..., 3:4]], -1)
    return out
