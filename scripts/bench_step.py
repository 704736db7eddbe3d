#!/usr/bin/env python
"""End-to-end online fine-tune STEP benchmark (the ≤60 s/sequence target).

Times the production chunk fn (augmentation draw + fwd + bwd + grouped SGD,
osvos_tpu/train/online.py make_chunk_fn) as ONE jit dispatch of
``--steps`` scan-chained optimizer steps — the same shape of work the real
driver dispatches, so dispatch overhead and layout decisions are the real
ones. 2000 steps x ms/step = the serial single-sequence wall-clock.

Variants (--trunk):
    xla     nn.Conv autodiff end to end (fast_conv_vjp=False)
    einsum  fastconv custom VJP, shift-einsum wgrad
    pallas  fastconv custom VJP, Pallas wgrad kernel
    flat    flat-layout Pallas trunk (ops/flattrunk.py), if available
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trunk", default="pallas",
                    choices=["xla", "einsum", "pallas", "flat"])
    ap.add_argument("--steps", type=int, default=20,
                    help="optimizer steps per timed dispatch")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=5, help="n_ave_grad")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--pool", type=int, default=100)
    args = ap.parse_args()

    if args.trunk == "einsum":
        os.environ["OSVOS_PALLAS_WGRAD"] = "0"

    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig, OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.train.online import make_chunk_fn, make_online_optimizer

    mcfg = ModelConfig(compute_mode="fast",
                       fast_conv_vjp=args.trunk != "xla")
    if args.trunk == "flat":
        mcfg = ModelConfig(compute_mode="flat")
    ocfg = OnlineConfig(n_ave_grad=args.batch)

    params = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                               input_hw=(64, 112))
    rng = np.random.RandomState(0)
    pool_imgs = jnp.asarray(
        rng.randn(args.pool, args.height, args.width, 3).astype(np.float32)
        * 30)
    pool_masks = jnp.asarray(
        (rng.rand(args.pool, args.height, args.width, 1) > 0.5)
        .astype(np.float32))

    chunk = jax.jit(make_chunk_fn(mcfg, ocfg), donate_argnums=(0, 1))
    tx = make_online_optimizer(params, ocfg, "microbatch")
    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(1), args.steps)

    t0 = time.time()
    params, opt_state, losses = chunk(params, opt_state, pool_imgs,
                                      pool_masks, keys)
    jax.block_until_ready(losses)
    print(f"compile+first chunk: {time.time() - t0:.1f}s "
          f"(loss[0]={float(losses[0]):.4f})", flush=True)

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        params, opt_state, losses = chunk(params, opt_state, pool_imgs,
                                          pool_masks, keys)
        jax.block_until_ready(losses)
        best = min(best, time.time() - t0)
    ms = best / args.steps * 1e3
    print(f"trunk={args.trunk} {ms:.2f} ms/step  "
          f"-> 2000 steps = {ms * 2:.1f} s")


if __name__ == "__main__":
    main()
