#!/usr/bin/env python
"""MXU orientation micro-bench for the wgrad rows-contraction.

The fused backward kernels' weight-gradient dots contract over the ROW
dim of both operands (``dot_general(z, g, (((0,), (0,)), ...))`` — out
(c_pad, d_pad)), which perfetto traces show running at ~58% of the
forward kernels' efficiency (BASELINE.md r3 "Conv-kernel efficiency").
This bench isolates the orientation question on kernel-realistic shapes:

  rows9   9 rows-contraction dots (the current wgrad formulation)
  rows1   1 rows-contraction dot (per-dot overhead scaling check)
  xpose9  transpose z ONCE in-kernel, then 9 canonical (1,0) dots
  pre9    9 canonical dots from a PRE-transposed zT operand (the upper
          bound if the transpose were free)
  split9  9 taps x per-128-lane-tile rows-contractions: each dot's
          transposed operand is ONE lane tile (k_rows, 128) — the shape
          class the c128 stages run at ~95% — so a c256 wgrad becomes
          2 narrow dots per tap instead of 1 wide one (same tile-MACs)
  rows3w  3 rows-contraction dots (one per kh row offset) against a
          lane-stacked WIDE operand (k_rows, 3*d) — the [xs|ym1|ym2]
          restructure: in the real kernel the shifted-tap copies
          already exist, so the wide buffer costs no extra copies and
          the MXU streams 3x more output columns per operand load
  rows1w  1 rows-contraction dot at N=9*d (stacking upper bound)

Each dot reads a DIFFERENT row (lane for zT) offset of its operand, like
the real kernels' taps, so Mosaic cannot CSE the nine dots into one.
Each variant runs as ONE pallas_call with grid=(iters,) accumulating into
a persistent output, so the per-dispatch floor (~1.3 ms through the
tunnel) amortizes away; timing is a host fetch of the result. Reports
ms/iter and effective tile-MAC rate (v5e bf16 peak ~= 197 TFLOP/s ->
~98.5 T-MAC/s).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (name, k_rows, c_pad, d_pad): the natural-layout trunk bwd shapes at
# 480p batch 5 (k_rows = t * wp per tile; see flatconv.FlatGeom)
SHAPES = [
    ("s2", 16 * 432, 128, 128),
    ("s3", 16 * 224, 256, 256),
    ("s4", 16 * 112, 512, 512),
    ("s5", 8 * 64, 512, 512),
]

_PAD = 128 * 9  # per-tap offsets: rows use 16*t, lanes (zT) use 128*t


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--variants", default="rows9,rows1,xpose9,pre9")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_bench(variant: str, k_rows: int, c: int, d: int):
        n_dots = 1 if variant == "rows1" else 9
        wide = {"rows3w": 3, "rows1w": 9}.get(variant, 0)

        def kernel(z_ref, g_ref, zt_ref, dk_ref, *scr):
            it = pl.program_id(0)

            @pl.when(it == 0)
            def _():
                dk_ref[...] = jnp.zeros_like(dk_ref)

            if variant in ("rows9", "rows1"):
                for t in range(n_dots):
                    dk_ref[t] += jax.lax.dot_general(
                        z_ref[pl.ds(16 * t, k_rows), :], g_ref[...],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif variant == "split9":
                for t in range(9):
                    for ci in range(c // 128):
                        dk_ref[t, pl.ds(ci * 128, 128), :] += (
                            jax.lax.dot_general(
                                z_ref[pl.ds(16 * t, k_rows),
                                      pl.ds(ci * 128, 128)],
                                g_ref[...],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
            elif wide:
                gw = scr[0]
                for kw in range(wide):
                    # in the real kernel these copies replace the
                    # EXISTING shifted-tap copies (same traffic); here
                    # they are counted so the variant's cost is honest
                    gw[pl.ds(0, k_rows), pl.ds(kw * d, d)] = (
                        g_ref[pl.ds(0, k_rows), :])
                for t in range(9 // wide):
                    dk_ref[t] += jax.lax.dot_general(
                        z_ref[pl.ds(16 * t, k_rows), :],
                        gw[pl.ds(16 * t, k_rows), :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif variant == "xpose9":
                zt = scr[0]
                zt[...] = z_ref[pl.ds(0, k_rows), :].T
                for t in range(9):
                    dk_ref[t] += jax.lax.dot_general(
                        zt[:, pl.ds(0, k_rows - 128 * 9)],
                        g_ref[pl.ds(128 * t, k_rows - 128 * 9), :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif variant == "pre9":
                for t in range(9):
                    dk_ref[t] += jax.lax.dot_general(
                        zt_ref[:, pl.ds(128 * t, k_rows)], g_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                raise ValueError(variant)

        scratch = []
        if variant == "xpose9":
            scratch.append(pltpu.VMEM((c, k_rows), jnp.bfloat16))
        if wide:
            scratch.append(pltpu.VMEM((k_rows + _PAD, wide * d),
                                      jnp.bfloat16))
        out_sh = ((9 // wide, c, wide * d) if wide else (9, c, d))

        def run(z, g, zt):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
                grid=(args.iters,),
                in_specs=[
                    pl.BlockSpec((k_rows + _PAD, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k_rows, d), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c, k_rows + _PAD), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(out_sh, lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 2 ** 20),
                interpret=args.interpret,
            )(z, g, zt)

        return jax.jit(run), n_dots

    rng = np.random.RandomState(0)
    for name, k_rows, c, d in SHAPES:
        z = jnp.asarray(rng.randn(k_rows + _PAD, c), jnp.bfloat16)
        g = jnp.asarray(rng.randn(k_rows, d), jnp.bfloat16)
        zt = jnp.asarray(rng.randn(c, k_rows + _PAD), jnp.bfloat16)
        line = [f"{name} (rows {k_rows}, {c}->{d}):"]
        for variant in args.variants.split(","):
            fn, n_dots = make_bench(variant, k_rows, c, d)
            try:
                np.asarray(fn(z, g, zt))  # compile + warm
            except Exception as e:  # noqa: BLE001 — report and move on
                msg = str(e).splitlines()[0][:60]
                line.append(f"{variant} FAIL({msg})")
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(z, g, zt))
                best = min(best, time.time() - t0)
            ms = best / args.iters * 1e3
            kk = k_rows - _PAD if variant == "xpose9" else k_rows
            macs = n_dots * kk * c * d
            rate = macs / (ms * 1e-3) / 1e12
            line.append(f"{variant} {ms:7.3f}ms {rate:5.1f}T")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
