"""Replay captured in-frame denoise inputs (/tmp/dn_inputs.npz from
debug_44row.py DBG_DUMP=1) through the fused denoiser, sharded vs single.

Usage: python tools/debug_dn_replay.py [steps-csv]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
_fl = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _fl:
    os.environ["XLA_FLAGS"] = (
        _fl + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import hikari_tpu.ops.denoise as dn
from hikari_tpu.parallel import shard as _sh
from hikari_tpu.parallel.mesh import make_mesh


def main():
    if len(sys.argv) > 1:
        dn._STEPS = tuple(int(s) for s in sys.argv[1].split(","))
    z = np.load("/tmp/dn_inputs.npz")
    g = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("g_")}
    albedo = jnp.asarray(z["albedo"])
    albedo_r = jnp.asarray(z["albedo_r"])
    nch = sum(1 for k in z.files if k.startswith("render"))
    ffs = [False, True, True][:nch] if nch == 3 else [c > 0
                                                      for c in range(nch)]
    chans = [(jnp.asarray(z[f"render{c}"]), jnp.asarray(z[f"var{c}"]),
              ffs[c]) for c in range(nch)]
    h, w = chans[0][0].shape[:2]
    frame = {"number": jnp.uint32(1)}
    print(f"h={h} w={w} nch={nch} steps={dn._STEPS}")
    for c in range(nch):
        r = np.asarray(chans[c][0])
        v = np.asarray(chans[c][1])
        print(f"  ch{c}: render [{np.nanmin(r):.3g},{np.nanmax(r):.3g}] "
              f"nan={np.isnan(r).sum()} inf={np.isinf(r).sum()}  "
              f"var [{np.nanmin(v):.3g},{np.nanmax(v):.3g}] "
              f"nan={np.isnan(v).sum()}")

    ref = dn.denoise_channels(g, albedo, chans, frame, (h, w), 1.0,
                              albedo_r=albedo_r, fused=True)

    mesh = make_mesh(8)

    def run(g, albedo, albedo_r, rvs):
        cl = [(r, v, ff) for (r, v), ff in zip(rvs, ffs)]
        return dn.denoise_channels(g, albedo, cl, frame, (h, w), 1.0,
                                   albedo_r=albedo_r, fused=True)

    rvs = [(r, v) for r, v, _ in chans]
    with _sh.row_mesh(mesh):
        got = jax.jit(run)(g, albedo, albedo_r, rvs)

    for c, (r, o) in enumerate(zip(ref, got)):
        r, o = np.asarray(r), np.asarray(o)
        d = np.abs(r - o)
        rows = np.nonzero(np.nan_to_num(d).max(axis=(1, 2))
                          > 1e-4)[0].tolist()
        print(f"ch{c}: max delta {np.nanmax(d):.3e} rows: {rows[:24]}")


if __name__ == "__main__":
    main()
