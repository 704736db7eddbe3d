#!/usr/bin/env python
"""Mosaic/HBM feasibility probes for an 8-lane packed stem buffer.

The packed stem input has 8 live lanes but rides a 128-lane flat buffer
(_lane_pad), costing a 293 MB pad write + dead DMA every step (perfetto
r5a: pad.347.clone 0.84 ms/step). Before building the 8-lane path, probe
the unknowns on the real chip:

  P1  dot_general (rows, 8) x (8, 128) inside a kernel
  P2  pltpu.roll(axis=1) on (rows, 8) u32 (the _merge_pairs_to rolls)
  P3  DMA HBM (A, B, 8) -> VMEM (A, B, 8) + in-kernel reshape to 2-D
  P4  is a 2-D bf16 (N, 8) array compact in HBM? (bytes via trace)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def p1_dot():
    def kernel(x_ref, k_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], k_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.asarray(np.random.randn(256, 8), jnp.bfloat16)
    k = jnp.asarray(np.random.randn(8, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(x, k)
    ref = x.astype(np.float32) @ k.astype(np.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"P1 dot (256,8)x(8,128): OK max|err|={err:.2e}")


def p2_roll():
    def kernel(x_ref, o_ref):
        u = pltpu.bitcast(x_ref[...], jnp.uint32)
        o_ref[...] = pltpu.bitcast(pltpu.roll(u, 4, axis=1), jnp.bfloat16)

    x = jnp.asarray(np.random.randn(256, 8), jnp.bfloat16)
    u = np.asarray(x).view(np.uint32) if False else None
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 8), jnp.bfloat16))(x)
    # roll by 4 u32 lanes on 8 u32 lanes == roll by 4 of the 8 bf16-PAIR
    # columns; emulate on host
    xv = np.asarray(x).view(np.uint32)          # (256, 4) u32? no: 8 bf16
    xv = np.asarray(x).reshape(256, 4, 2)        # u32 lanes = bf16 pairs
    ref = np.roll(xv, 4, axis=1).reshape(256, 8)
    got = np.asarray(out)
    ok = np.array_equal(ref, got)
    print(f"P2 roll axis=1 on (256,8) u32: lowers; semantics match "
          f"8-lane ring: {ok}")
    if not ok:
        print("   sample got", got[0], "ref", ref[0])


def p3_dma_reshape():
    A, B = 8, 64

    def kernel(x_hbm, o_ref, xs, sem):
        cp = pltpu.make_async_copy(x_hbm, xs, sem)
        cp.start()
        cp.wait()
        v = xs[...].reshape(A * B, 8)
        o_ref[...] = v

    x = jnp.asarray(np.random.randn(A, B, 8), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A * B, 8), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((A, B, 8), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)
    ok = np.array_equal(np.asarray(out), np.asarray(x).reshape(A * B, 8))
    print(f"P3 DMA 3-D + in-kernel reshape: values match: {ok}")


def p4_compact():
    n = 1 << 20
    x = jnp.asarray(np.random.randn(n, 8), jnp.bfloat16)

    @jax.jit
    def f(v):
        return v + jnp.bfloat16(1)

    lowered = f.lower(x).compile()
    txt = lowered.as_text()
    for line in txt.splitlines():
        if "bf16[1048576,8]" in line and ("parameter" in line or "add" in line):
            print("P4", line.strip()[:160])
            break
    mem = lowered.memory_analysis()
    print(f"P4 2-D (1M,8) bf16: argument bytes={mem.argument_size_in_bytes}"
          f" (compact would be {n * 8 * 2})")




def p6_multidim_dot():
    def kernel(x_ref, k_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], k_ref[...], (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.asarray(np.random.randn(256, 3, 8), jnp.bfloat16)
    k = jnp.asarray(np.random.randn(3, 8, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(x, k)
    ref = np.einsum("rab,abd->rd", np.asarray(x, np.float32),
                    np.asarray(k, np.float32))
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"P6 multi-dim contraction (256,3,8)x(3,8,128): OK max|err|={err:.2e}")


def p7_lane_merge_reshape():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(256, 24)

    x = jnp.asarray(np.random.randn(256, 3, 8), jnp.bfloat16)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 24), jnp.bfloat16))(x)
    ok = np.array_equal(np.asarray(out), np.asarray(x).reshape(256, 24))
    print(f"P7 reshape (256,3,8)->(256,24): values match: {ok}")


def p8_dma_dim1_slice():
    # DMA an HBM window into [:, k, :] of a 3-D VMEM scratch
    A = 64

    def kernel(x_hbm, o_ref, xs, sem):
        for k in range(3):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(k * 8, A)], xs.at[:, k, :], sem)
            cp.start()
            cp.wait()
        o_ref[...] = xs[...]

    x = jnp.asarray(np.random.randn(A + 16, 8), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, 3, 8), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((A, 3, 8), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)
    ref = np.stack([np.asarray(x)[k * 8:k * 8 + A] for k in range(3)], 1)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"P8 DMA into [:, k, :] of 3-D scratch: values match: {ok}")


def p9_dma_rowshift():
    # DMA the same 3-D HBM buffer at +-1 flat-row offsets via a 2-D view?
    # No 2-D view exists; instead: can a DMA source be a 3-D HBM slice at
    # a NON-tile-aligned dim-0 offset (odd h-row start)?
    def kernel(x_hbm, o_ref, xs, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(3, 8)], xs, sem)
        cp.start()
        cp.wait()
        o_ref[...] = xs[...].reshape(8 * 16, 8)

    x = jnp.asarray(np.random.randn(32, 16, 8), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 8), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((8, 16, 8), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
    )(x)
    ok = np.array_equal(np.asarray(out),
                        np.asarray(x)[3:11].reshape(128, 8))
    print(f"P9 DMA 3-D HBM slice at odd dim-0 offset: values match: {ok}")


if __name__ == "__main__":
    for fn in (p3_dma_reshape, p8_dma_dim1_slice):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{fn.__name__} FAIL: {str(e).splitlines()[0][:160]}")
