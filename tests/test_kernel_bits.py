"""In-kernel reservoir bit helpers (ops/light_fused.py u32 math) must match
ops/reservoir.py's XLA bitcast packers exactly — the fused kernel writes
carries the modular path (and the next frame's gather) unpacks."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hikari_tpu.ops import light_fused as lf
from hikari_tpu.ops import reservoir as rsv


def _rand(n, lo, hi, seed):
    return jnp.asarray(np.random.default_rng(seed).uniform(lo, hi, n)
                       .astype(np.float32))


def test_bf16_pair_matches_xla_cast():
    a = _rand(4096, -1e6, 1e6, 0)
    b = _rand(4096, -1e-3, 1e-3, 1)
    ours = lf._kbf16_pair(a, b)
    ref = rsv._bf16_pair(a, b)
    np.testing.assert_array_equal(np.asarray(ours).view(np.uint32),
                                  np.asarray(ref).view(np.uint32))
    ua, ub = lf._kbf16_unpair(ours)
    ra, rb = rsv._bf16_unpair(ref)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(ub), np.asarray(rb))


def test_unorm16_and_snorm8_match():
    a = _rand(4096, 0.0, 1.0, 2)
    b = _rand(4096, 0.0, 1.0, 3)
    np.testing.assert_array_equal(
        np.asarray(lf._kunorm16_pair(a, b)).view(np.uint32),
        np.asarray(rsv._unorm16_pair(a, b)).view(np.uint32))
    n3 = jnp.stack([_rand(1024, -1, 1, 4), _rand(1024, -1, 1, 5),
                    _rand(1024, -1, 1, 6)], -1)
    extra = jnp.round(_rand(1024, 0, 255, 7))
    ours = lf._ksnorm8_vec((n3[:, 0], n3[:, 1], n3[:, 2]), extra)
    ref = rsv._snorm8_vec(n3, extra)
    np.testing.assert_array_equal(np.asarray(ours).view(np.uint32),
                                  np.asarray(ref).view(np.uint32))


def test_halo_rows_exchanges_neighbor_blocks():
    import os

    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from jax.sharding import PartitionSpec as P

    from hikari_tpu.parallel import shard as sh
    from hikari_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    x = jnp.arange(64.0 * 4).reshape(64, 4)

    def local(xl):
        return sh.halo_rows(xl, 3, 2, 8)

    out = sh.smap(local, mesh, in_specs=P("sp", None),
                  out_specs=P("sp", None))(x)
    out = np.asarray(out).reshape(8, 13, 4)
    xs = np.asarray(x).reshape(8, 8, 4)
    for k in range(8):
        top = xs[k - 1][-3:] if k > 0 else np.zeros((3, 4))
        bot = xs[k + 1][:2] if k < 7 else np.zeros((2, 4))
        np.testing.assert_array_equal(out[k], np.concatenate(
            [top, xs[k], bot], axis=0))
