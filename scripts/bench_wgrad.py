#!/usr/bin/env python
"""Per-shape 3x3 wgrad micro-benchmark: Pallas kernel vs shift-einsum vs
XLA autodiff.

Standalone one-shot dispatches report ~0 ms through the tunneled-TPU setup
(see CLAUDE.md), so each variant is timed as ``iters`` scan-chained calls
inside ONE jit dispatch; the carry consumes each dk so iterations cannot be
elided or fused away.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the eight trunk wgrad shapes of the online step at 480p (batch from CLI)
SHAPES = [
    ("s1c1", 480, 854, 64, 64),
    ("s2c0", 240, 427, 64, 128),
    ("s2c1", 240, 427, 128, 128),
    ("s3c0", 120, 214, 128, 256),
    ("s3c12", 120, 214, 256, 256),
    ("s4c0", 60, 107, 256, 512),
    ("s4c12", 60, 107, 512, 512),
    ("s5", 30, 54, 512, 512),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="pallas,einsum",
                    help="comma list of pallas,einsum,xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from osvos_tpu.ops.pallas.wgrad import wgrad3x3
    from osvos_tpu.ops import fastconv

    def xla_wgrad(x, g):
        def f(k):
            return lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        k0 = jnp.zeros((3, 3, x.shape[-1], g.shape[-1]), x.dtype)
        return jax.vjp(f, k0)[1](g)[0]

    variants = {
        "pallas": lambda x, g: wgrad3x3(x, g),
        "einsum": fastconv._wgrad_einsum,
        "xla": xla_wgrad,
    }

    def timed(fn, x, g, iters):
        # NB: the scan body must use the jit ARGUMENTS — closing over the
        # outer arrays would embed them as constants in the uploaded HLO.
        def run_impl(x, g):
            def body(c, i):
                dk = fn(x + i.astype(x.dtype)
                        * jnp.float32(1e-6).astype(x.dtype), g)
                return c + dk.astype(jnp.float32).sum(), None
            return lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]
        run = jax.jit(run_impl)
        np.asarray(run(x, g))  # compile + warm; device_get forces execution
        best = float("inf")
        for rep in range(3):
            xr = x * (1.0 + 1e-3 * rep)  # fresh buffer each rep
            jax.block_until_ready(xr)
            t0 = time.time()
            np.asarray(run(xr, g))
            best = min(best, time.time() - t0)
        return best / iters * 1e3

    rng = np.random.RandomState(0)
    totals = {}
    for name, h, w, c, d in SHAPES:
        x = jnp.asarray(rng.randn(args.batch, h, w, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        g = jnp.asarray(rng.randn(args.batch, h, w, d).astype(np.float32)
                        ).astype(jnp.bfloat16)
        line = [f"{name:6s} ({args.batch},{h},{w},{c})->d{d}:"]
        for v in args.variants.split(","):
            ms = timed(variants[v], x, g, args.iters)
            totals[v] = totals.get(v, 0.0) + ms
            line.append(f"{v} {ms:7.3f} ms")
        print("  ".join(line), flush=True)
    print("TOTAL per step:",
          "  ".join(f"{v} {t:7.2f} ms" for v, t in totals.items()))


if __name__ == "__main__":
    main()
