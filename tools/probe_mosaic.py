"""Mosaic capability probes for the packet-traversal kernel design:
  m1: lax.cond with scalar pred + vector ops in branches
  m2: SMEM scratch with dynamic scalar indexing (stack push/pop)
  m3: lax.while_loop with mixed scalar+vector carries
  m4: VMEM footprint of a [P,16] f32 table at P=96k (minor-dim padding?)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def m1():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        s = x[0, 0]

        def t(_):
            return x * 2.0

        def f(_):
            return x + 1.0

        o_ref[:] = jax.lax.cond(s > 0.0, t, f, None)

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print("m1 cond:", np.asarray(out)[0, 0], "(want 2.0)")


def m2():
    def kernel(x_ref, o_ref, stack_ref):
        def body(i, sp):
            stack_ref[sp] = i * 10
            return sp + 1

        sp = jax.lax.fori_loop(0, 5, body, 0)

        def body2(i, acc):
            sp2 = 4 - i
            return acc + stack_ref[sp2]

        total = jax.lax.fori_loop(0, 5, body2, 0)
        o_ref[:] = x_ref[:] + total.astype(jnp.float32)

    x = jnp.zeros((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)])(x)
    print("m2 smem stack:", np.asarray(out)[0, 0], "(want 100.0)")


def m3():
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def cond(st):
            return st[0] < 10

        def body(st):
            i, v = st
            return i + 1, v + x

        i, v = jax.lax.while_loop(cond, body, (0, jnp.zeros_like(x)))
        o_ref[:] = v

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print("m3 while mixed:", np.asarray(out)[0, 0], "(want 10.0)")


def m4():
    P = 96 * 1024

    def kernel(t_ref, x_ref, o_ref):
        row = t_ref[pl.ds(x_ref[0, 0].astype(jnp.int32), 1), :]
        o_ref[:] = x_ref[:] + row[0, 3]

    tab = jnp.arange(P * 16, dtype=jnp.float32).reshape(P, 16) * 1e-6
    x = jnp.zeros((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, x)
    print("m4 [96k,16] table:", np.asarray(out)[0, 0])


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["m1", "m2", "m3", "m4"]):
        try:
            globals()[name]()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
