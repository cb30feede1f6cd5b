"""Round-2 kernel probes (run on the real TPU, serially, nothing else live).

Measurement discipline (PERF.md traps): every probe runs inside ONE jitted
lax.scan with inputs perturbed per step at 1e-3 scale; per-step checksums are
asserted to differ; time = whole program / steps.

Probes:
  p1  pallas brute-force baseline        2.07M rays x 40 tris (round-1 kernel)
  p2  any-hit reduced-op kernel          same shape, ~45 ops, 1 carry
  p3  baseline at 20 tris                does tri count scale linearly?
  p7  baseline with DOUBLED per-pair math  does op count matter at all?
  p5a XLA matmul [2.07M,16]x[16,512] f32(HIGHEST)   MXU engine feasibility
  p5b 12-op epilogue on [2.07M,512]                  VPU rate on big tensors

Usage: python tools/probe_kernel.py p1 p2 ...
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

N = 2064384  # 1920*1080 rounded to tile multiple (1008*2048)
STEPS = 10

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES


def make_tris(t, seed=0):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-3, 3, (t, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-2, 2, (t, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-2, 2, (t, 3)).astype(np.float32)
    inst = np.arange(t, dtype=np.float32) % 7
    return np.concatenate([v0, v1, v2, inst[:, None]], -1)  # [t,10]


def make_rays(seed=1):
    r = np.random.default_rng(seed)
    ro = r.uniform(-4, 4, (N, 3)).astype(np.float32)
    rd = r.normal(size=(N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def scan_bench(fn, ro, name):
    """fn(ro) -> checksum scalar. Perturb ro by 1e-3*step inside the scan."""
    @jax.jit
    def run(ro0):
        def body(c, i):
            cs = fn(c)
            return c + 1e-3 * (i + 1.0), cs
        _, css = jax.lax.scan(body, ro0, jnp.arange(STEPS, dtype=jnp.float32))
        return css

    ro = jnp.asarray(ro)
    css = jax.block_until_ready(run(ro))  # compile + warm
    assert len(set(np.asarray(css).tolist())) > 1, f"{name}: checksums identical!"
    t0 = time.perf_counter()
    css = jax.block_until_ready(run(ro))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name}: {dt*1e3:.2f} ms/step  checksums[:3]={np.asarray(css)[:3]}")
    return dt


# --- p2: any-hit kernel: single carry, folded conditions -------------------

def _kernel_anyhit(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl, occ_out):
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    n_tris = tris_ref.shape[0]
    F32_EPSILON = 1.1920929e-7

    def body(j, occ):
        row = tris_ref[pl.ds(j, 1), :]
        v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
        v1x, v1y, v1z = row[0, 3], row[0, 4], row[0, 5]
        v2x, v2y, v2z = row[0, 6], row[0, 7], row[0, 8]
        inst = row[0, 9]
        abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
        acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
        ux = dy * acz - dz * acy
        uy = dz * acx - dx * acz
        uz = dx * acy - dy * acx
        det = abx * ux + aby * uy + abz * uz
        s = jnp.sign(det)
        aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
        ud = (aox * ux + aoy * uy + aoz * uz) * s
        vx = aoy * abz - aoz * aby
        vy = aoz * abx - aox * abz
        vz = aox * aby - aoy * abx
        vd = (dx * vx + dy * vy + dz * vz) * s
        td = (acx * vx + acy * vy + acz * vz) * s
        ads = det * s
        # all conditions as one min: hit iff m > 0
        m = jnp.minimum(jnp.minimum(ud, vd), ads - ud - vd)
        m = jnp.minimum(m, td - F32_EPSILON * ads)
        m = jnp.minimum(m, mt * ads - td)
        m = jnp.where((inst >= 0.0) & (inst != ex), m, -1.0)
        return jnp.maximum(occ, m)

    occ = jax.lax.fori_loop(0, n_tris, body,
                            jnp.full(ox.shape, -1.0, jnp.float32))
    occ_out[:] = (occ > 0.0).astype(jnp.float32)


def pallas_anyhit(tris, ro, rd, max_t, excl):
    n = ro.shape[0]
    rows = n // _LANES

    def prep(x):
        return x.reshape(rows, _LANES)

    args = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(max_t), prep(excl)]
    ray_spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _kernel_anyhit,
        grid=(rows // _SUBLANES,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
    )(jnp.pad(tris, ((0, 0), (0, 6))), *args)
    return occ.reshape(-1)


# --- p7: doubled-math kernel ------------------------------------------------

def _kernel_double(tris_ref, rox, roy, roz, rdx, rdy, rdz, maxt, excl, occ_out):
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    mt = maxt[:]
    ex = excl[:]
    n_tris = tris_ref.shape[0]
    F32_EPSILON = 1.1920929e-7

    def mt_pass(vs, shift):
        v0x, v0y, v0z = vs[0] + shift, vs[1], vs[2]
        v1x, v1y, v1z = vs[3], vs[4] + shift, vs[5]
        v2x, v2y, v2z = vs[6], vs[7], vs[8] + shift
        abx, aby, abz = v1x - v0x, v1y - v0y, v1z - v0z
        acx, acy, acz = v2x - v0x, v2y - v0y, v2z - v0z
        ux = dy * acz - dz * acy
        uy = dz * acx - dx * acz
        uz = dx * acy - dy * acx
        det = abx * ux + aby * uy + abz * uz
        s = jnp.sign(det)
        aox, aoy, aoz = ox - v0x, oy - v0y, oz - v0z
        ud = (aox * ux + aoy * uy + aoz * uz) * s
        vx = aoy * abz - aoz * aby
        vy = aoz * abx - aox * abz
        vz = aox * aby - aoy * abx
        vd = (dx * vx + dy * vy + dz * vz) * s
        td = (acx * vx + acy * vy + acz * vz) * s
        ads = det * s
        m = jnp.minimum(jnp.minimum(ud, vd), ads - ud - vd)
        m = jnp.minimum(m, td - F32_EPSILON * ads)
        return jnp.minimum(m, mt * ads - td)

    def body(j, occ):
        row = tris_ref[pl.ds(j, 1), :]
        vs = [row[0, k] for k in range(9)]
        inst = row[0, 9]
        m = mt_pass(vs, 0.0) + 0.25 * mt_pass(vs, 0.125)  # 2x the math
        m = jnp.where((inst >= 0.0) & (inst != ex), m, -1.0)
        return jnp.maximum(occ, m)

    occ = jax.lax.fori_loop(0, n_tris, body,
                            jnp.full(ox.shape, -1.0, jnp.float32))
    occ_out[:] = (occ > 0.0).astype(jnp.float32)


def pallas_double(tris, ro, rd, max_t, excl):
    n = ro.shape[0]
    rows = n // _LANES

    def prep(x):
        return x.reshape(rows, _LANES)

    args = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
            prep(max_t), prep(excl)]
    ray_spec = pl.BlockSpec((_SUBLANES, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        _kernel_double,
        grid=(rows // _SUBLANES,),
        in_specs=[pl.BlockSpec((tris.shape[0], 16), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
    )(jnp.pad(tris, ((0, 0), (0, 6))), *args)
    return occ.reshape(-1)


def main():
    which = set(sys.argv[1:]) or {"p1", "p2", "p3", "p7", "p5a", "p5b"}
    print("devices:", jax.devices())
    ro, rd = make_rays()
    ro = jnp.asarray(ro)
    rd = jnp.asarray(rd)
    maxt = jnp.full((N,), 3.402823466e38, jnp.float32)
    excl = jnp.full((N,), -1.0, jnp.float32)

    from hikari_tpu.ops.trace_pallas import pallas_brute_force

    if "p1" in which:
        tris = jnp.asarray(make_tris(40))
        def f1(ro_):
            h = pallas_brute_force(tris, ro_, rd, maxt,
                                   excl.astype(jnp.int32), excl.astype(jnp.int32))
            t = jnp.where(h["instance"] >= 0, h["t"], 0.0)
            return jnp.sum(t)
        scan_bench(f1, ro, "p1 baseline 40t")

    if "p2" in which:
        tris = jnp.asarray(make_tris(40))
        def f2(ro_):
            return jnp.sum(pallas_anyhit(tris, ro_, rd, maxt, excl))
        scan_bench(f2, ro, "p2 anyhit 40t")

    if "p3" in which:
        tris20 = jnp.asarray(make_tris(20))
        def f3(ro_):
            h = pallas_brute_force(tris20, ro_, rd, maxt,
                                   excl.astype(jnp.int32), excl.astype(jnp.int32))
            t = jnp.where(h["instance"] >= 0, h["t"], 0.0)
            return jnp.sum(t)
        scan_bench(f3, ro, "p3 baseline 20t")

    if "p7" in which:
        tris = jnp.asarray(make_tris(40))
        def f7(ro_):
            return jnp.sum(pallas_double(tris, ro_, rd, maxt, excl))
        scan_bench(f7, ro, "p7 doubled-math 40t")

    if "p5a" in which:
        tf = jnp.asarray(np.random.default_rng(2).normal(
            size=(16, 512)).astype(np.float32))
        def f5a(ro_):
            feat = jnp.concatenate(
                [ro_, rd, jnp.cross(ro_, rd), ro_ * rd,
                 jnp.ones((N, 1)), ro_[:, :3]], -1)  # [N,16]
            prod = jax.lax.dot_general(
                feat, tf, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(jnp.max(prod, axis=1))
        scan_bench(f5a, ro, "p5a matmul [N,16]x[16,512] f32 HIGHEST")

    if "p5b" in which:
        tf = jnp.asarray(np.random.default_rng(2).normal(
            size=(16, 512)).astype(np.float32))
        def f5b(ro_):
            feat = jnp.concatenate(
                [ro_, rd, jnp.cross(ro_, rd), ro_ * rd,
                 jnp.ones((N, 1)), ro_[:, :3]], -1)
            prod = jax.lax.dot_general(
                feat, tf, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            det = prod[:, 0:128]
            ud = prod[:, 128:256]
            vd = prod[:, 256:384]
            td = prod[:, 384:512]
            s = jnp.sign(det)
            ads = det * s
            uds = ud * s
            vds = vd * s
            tds = td * s
            m = jnp.minimum(jnp.minimum(uds, vds), ads - uds - vds)
            m = jnp.minimum(m, tds - 1e-7 * ads)
            occ = jnp.max(m, axis=1)
            return jnp.sum((occ > 0).astype(jnp.float32))
        scan_bench(f5b, ro, "p5b matmul+epilogue anyhit 128t")


if __name__ == "__main__":
    main()
