#!/usr/bin/env python
"""Internal ablation timing of the FUSED backward kernel per trunk shape.

The SOL table (scripts/sol_table.py) shows the fused-bwd kernels at
53-75% of peak for the multi-lane-tile stages while the same-geometry
forward kernels run at 86-96%. This harness times the kernel with single
internal pieces disabled (OSVOS_BWD_ABLATE — TIMING ONLY, numerics are
wrong) to attribute the gap: dgrad dots vs wgrad dots vs shift copies vs
db column-sum vs the dz epilogue.

Run each variant as a SEPARATE process (the env var is read at import):
    for v in "" nodgrad nowgrad noshift nodb noepi; do
        OSVOS_BWD_ABLATE=$v python scripts/bench_bwd_ablate.py --shape s3c12
    done
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This harness is the one legitimate OSVOS_BWD_ABLATE consumer; flatconv
# refuses a non-empty ablation without this acknowledgement so the var
# cannot silently corrupt gradients in a training process.
os.environ.setdefault("OSVOS_BWD_ABLATE_ACK", "1")

import numpy as np

SHAPES = {  # name -> (h, w, c, d)
    "s2c1": (240, 427, 128, 128),
    "s3c12": (120, 214, 256, 256),
    "s4c0": (60, 107, 256, 512),
    "s4c12": (60, 107, 512, 512),
    "s5": (30, 54, 512, 512),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shape", default="s3c12", choices=sorted(SHAPES))
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from osvos_tpu.ops.pallas.flatconv import (
        FlatGeom, _BWD_ABLATE, _flat_conv_bwd_fused_impl, stage_t, to_flat)

    h, w, c, d = SHAPES[args.shape]
    g = FlatGeom(n=args.batch, h=h, w=w, c=c, t=stage_t(h))
    rng = np.random.RandomState(0)
    zf = to_flat(jnp.asarray(
        np.abs(rng.randn(args.batch, h, w, c)).astype(np.float32)), g)
    gf = to_flat(jnp.asarray(
        rng.randn(args.batch, h, w, d).astype(np.float32)),
        FlatGeom(n=args.batch, h=h, w=w, c=d, t=g.t))
    k = jnp.asarray(0.05 * rng.randn(3, 3, c, d).astype(np.float32))

    @jax.jit
    def run(zf, gf, k):
        def body(carry, _):
            dz, dk, db = _flat_conv_bwd_fused_impl(
                zf, gf, k + carry * 0, g, d, False, False)
            return carry + db[0].astype(jnp.float32) * 1e-30, None

        return lax.scan(body, jnp.float32(0), jnp.arange(args.iters))[0]

    out = run(zf, gf, k)
    float(out)  # host fetch = sync (block_until_ready lies on the tunnel)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        out = run(zf, gf, k)
        float(out)
        best = min(best, (time.time() - t0) / args.iters * 1e3)
    print(f"shape={args.shape} ablate={_BWD_ABLATE or 'full':8s} "
          f"{best:7.3f} ms/call")


if __name__ == "__main__":
    main()
