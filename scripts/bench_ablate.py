#!/usr/bin/env python
"""Attribution A/B for the online fine-tune step: time the production flat
chunk with single pieces ablated, so the ms/step budget (BASELINE.md) is
measured, not inferred from trace-name guesswork.

Variants:
    full     the production chunk (scripts/bench_step.py --trunk flat)
    noopt    skip tx.update + param apply          -> optimizer cost
    nodraw   fixed first-5 pool entries, no flip   -> draw/flip/index cost
    noloss   loss = mean(logits)                   -> CB-BCE cost
    nohead   loss = sum of low-res contrib means   -> upsample/crop/sum+loss
    fwdonly  value only (no grad), optimizer off   -> fwd vs bwd split

Timing is host-fetch (np.asarray on the losses) — block_until_ready returns
early through the tunneled-TPU backend (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_ablated_chunk(mcfg, ocfg, variant: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from osvos_tpu.models.vgg_osvos import OSVOS
    from osvos_tpu.ops.loss import (
        class_balanced_cross_entropy_loss_per_sample)
    from osvos_tpu.train.online import make_online_optimizer

    model = OSVOS(mcfg)

    def draw(skey, pool_imgs, pool_masks):
        ki, kf = jax.random.split(skey)
        idx = jax.random.randint(ki, (), 0, pool_imgs.shape[0])
        img = lax.dynamic_index_in_dim(pool_imgs, idx, keepdims=False)
        m = lax.dynamic_index_in_dim(pool_masks, idx, keepdims=False)
        flip = jax.random.uniform(kf) < ocfg.hflip_prob
        img = jnp.where(flip, img[:, ::-1, :], img)
        m = jnp.where(flip, m[:, ::-1, :], m)
        return img, m

    def loss_batch(p, imgs, ms):
        if variant == "nohead":
            parts = model.apply({"params": p}, imgs, mode="infer_parts")
            return sum(jnp.mean(c.astype(jnp.float32)) for c in parts[:-1])
        out = model.apply({"params": p}, imgs, mode="infer")[-1]
        if variant == "noloss":
            return jnp.mean(out)
        return class_balanced_cross_entropy_loss_per_sample(
            out, ms.astype(jnp.float32)).mean()

    def chunk(params, opt_state, pool_imgs, pool_masks, keys):
        tx = make_online_optimizer(params, ocfg, "microbatch")

        def step(carry, skey):
            params, opt_state = carry
            if variant == "nodraw":
                imgs = pool_imgs[:ocfg.n_ave_grad]
                ms = pool_masks[:ocfg.n_ave_grad]
            else:
                ks = jax.random.split(skey, ocfg.n_ave_grad)
                imgs, ms = jax.vmap(draw, in_axes=(0, None, None))(
                    ks, pool_imgs, pool_masks)
            if variant == "fwdonly":
                loss = loss_batch(params, imgs, ms)
                return (params, opt_state), loss
            loss, grads = jax.value_and_grad(loss_batch)(params, imgs, ms)
            if variant == "noopt":
                return (params, opt_state), loss
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = lax.scan(step, (params, opt_state),
                                               keys)
        return params, opt_state, losses

    return chunk


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", default="full,noopt,nodraw,noloss,nohead,"
                                          "fwdonly")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--pool", type=int, default=4)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--mode", default="flat")
    ap.add_argument("--flat_side", default="stacked",
                    choices=["stacked", "xla", "pallas"])
    ap.add_argument("--split_acc", action="store_true",
                    help="per-kh accumulators in the flat fwd kernel")
    ap.add_argument("--bare", action="store_true",
                    help="TIMING ONLY (wrong results): strip fwd-kernel "
                         "relu/mask VPU work")
    args = ap.parse_args()

    if args.split_acc or args.bare:
        from osvos_tpu.ops.pallas import flatconv
        flatconv._SPLIT_ACC = args.split_acc
        flatconv._TIMING_BARE = args.bare

    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig, OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.train.online import make_online_optimizer

    mcfg = ModelConfig(compute_mode=args.mode, flat_side=args.flat_side)
    ocfg = OnlineConfig(n_ave_grad=args.batch)
    params0 = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                                input_hw=(64, 112))
    from osvos_tpu.configs import MEANVAL_BGR
    from osvos_tpu.data.synthetic import _frame
    mean = np.asarray(MEANVAL_BGR, np.float32)
    n_pool = max(args.pool, args.batch)
    frames = [_frame(args.height, args.width, t=0.31 * i, seed=3 + i)
              for i in range(n_pool)]
    pool_imgs = jnp.asarray(np.stack(
        [f[0].astype(np.float32)[..., ::-1] - mean for f in frames]))
    pool_masks = jnp.asarray(np.stack(
        [(f[1] > 127).astype(np.float32)[..., None] for f in frames]))

    results = {}
    for variant in args.variants.split(","):
        chunk = jax.jit(make_ablated_chunk(mcfg, ocfg, variant),
                        donate_argnums=(0, 1))
        tx = make_online_optimizer(params0, ocfg, "microbatch")
        params = jax.tree.map(jnp.array, params0)
        opt_state = tx.init(params)
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
        t0 = time.time()
        params, opt_state, losses = chunk(params, opt_state, pool_imgs,
                                          pool_masks, keys)
        np.asarray(losses)
        print(f"[{variant}] compile+first: {time.time() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            params, opt_state, losses = chunk(params, opt_state, pool_imgs,
                                              pool_masks, keys)
            np.asarray(losses)
            best = min(best, time.time() - t0)
        ms = best / args.steps * 1e3
        results[variant] = ms
        print(f"[{variant}] {ms:.2f} ms/step", flush=True)

    full = results.get("full")
    if full:
        for v, ms in results.items():
            if v != "full":
                print(f"  {v:8s} saves {full - ms:+7.2f} ms/step")


if __name__ == "__main__":
    main()
