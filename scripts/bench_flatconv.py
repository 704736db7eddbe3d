#!/usr/bin/env python
"""Per-shape flat-conv kernel micro-benchmarks vs XLA (scan-chained).

Times the Pallas flat fwd / dgrad / wgrad kernels against XLA's NHWC conv
forward / autodiff on the online-step trunk shapes. Each variant runs as
``iters`` scan-chained calls inside one jit dispatch (standalone one-shot
dispatches mis-report through the tunnel, see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [  # (name, h, w, c, d)
    ("s1c1", 480, 854, 64, 64),
    ("s2c1", 240, 427, 128, 128),
    ("s3c12", 120, 214, 256, 256),
    ("s4c12", 60, 107, 512, 512),
    ("s5", 30, 54, 512, 512),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--passes", default="fwd,dgrad,wgrad",
                    help="comma list of fwd,dgrad,wgrad")
    ap.add_argument("--variants", default="flat,xla")
    ap.add_argument("--shapes", default=None,
                    help="comma list of shape names (default all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from osvos_tpu.ops.pallas.flatconv import (
        FlatGeom, _flat_conv_dgrad_impl, _flat_conv_fwd_impl,
        _flat_conv_wgrad_impl, stage_t, to_flat)

    def timed(fn, args_list, iters):
        def run_impl(ops):
            def body(c, i):
                r = fn(*jax.tree.map(
                    lambda a: (a + (i.astype(a.dtype)
                                    * jnp.asarray(1e-6, a.dtype))
                               if jnp.issubdtype(a.dtype, jnp.floating)
                               else a), ops))
                return c + jax.tree.reduce(
                    lambda s, l: s + l.astype(jnp.float32).sum(), r,
                    jnp.float32(0)), None
            return lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]

        run = jax.jit(run_impl)
        np.asarray(run(args_list))
        best = float("inf")
        for rep in range(3):
            ops = jax.tree.map(
                lambda a: a * (1.0 + 1e-3 * rep)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args_list)
            jax.block_until_ready(ops)
            t0 = time.time()
            np.asarray(run(ops))
            best = min(best, time.time() - t0)
        return best / iters * 1e3

    rng = np.random.RandomState(0)
    n = args.batch
    names = args.shapes.split(",") if args.shapes else None
    totals = {}
    for name, h, w, c, d in SHAPES:
        if names and name not in names:
            continue
        g = FlatGeom(n=n, h=h, w=w, c=c, t=stage_t(h))
        x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
        zf = to_flat(x, g)
        gf = to_flat(jnp.asarray(rng.randn(n, h, w, d).astype(np.float32)),
                     FlatGeom(n=n, h=h, w=w, c=d, t=g.t))
        k = jnp.asarray(0.05 * rng.randn(3, 3, c, d).astype(np.float32))
        b = jnp.asarray(0.05 * rng.randn(d).astype(np.float32))
        kb = k.astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16)
        gb = jnp.asarray(rng.randn(n, h, w, d).astype(np.float32)
                         ).astype(jnp.bfloat16)
        gflops = 2 * 9 * n * h * w * c * d / 1e9

        def conv_f(xx, kk):
            return lax.conv_general_dilated(
                xx, kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        variants = {
            ("fwd", "flat"): (lambda zf, k, b: _flat_conv_fwd_impl(
                zf, k, b, g, d, True, False), (zf, k, b)),
            ("fwd", "xla"): (lambda xb, kb: conv_f(jnp.maximum(xb, 0), kb),
                             (xb, kb)),
            ("dgrad", "flat"): (lambda gf, k, zf: _flat_conv_dgrad_impl(
                gf, k, zf, g, d, False), (gf, k, zf)),
            ("dgrad", "xla"): (lambda gb, kb, xb: jax.vjp(
                lambda v: conv_f(jnp.maximum(v, 0), kb), xb)[1](gb)[0],
                (gb, kb, xb)),
            ("wgrad", "flat"): (lambda zf, gf: _flat_conv_wgrad_impl(
                zf, gf, g, d, True, False), (zf, gf)),
            ("wgrad", "xla"): (lambda xb, gb: jax.vjp(
                lambda kk: conv_f(jnp.maximum(xb, 0), kk), kb)[1](gb)[0],
                (xb, gb)),
        }

        for p in args.passes.split(","):
            line = [f"{name:6s} {p:5s}"]
            for v in args.variants.split(","):
                fn, ops = variants[(p, v)]
                ms = timed(fn, ops, args.iters)
                totals[(p, v)] = totals.get((p, v), 0.0) + ms
                line.append(f"{v} {ms:7.2f} ms {gflops / ms:6.0f} GF/s")
            print("  ".join(line), flush=True)
    print("TOTALS:", "  ".join(f"{p}/{v} {t:7.2f}"
                               for (p, v), t in sorted(totals.items())))


if __name__ == "__main__":
    main()
