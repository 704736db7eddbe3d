#!/usr/bin/env python
"""Capture and summarize a device trace of the hot training/inference steps.

Usage:
    python scripts/profile_step.py --what online_step   # fwd+bwd+opt @480p
    python scripts/profile_step.py --what infer         # batched inference

Writes a perfetto trace (view at ui.perfetto.dev) and prints a per-op-class
duration summary parsed straight from the trace JSON — works on this
tunneled-TPU setup where interactive XProf is unavailable. This is how the
wgrad-relayout and unfused-elementwise costs in BASELINE.md were found.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize(log_dir: str, steps: int) -> None:
    path = sorted(glob.glob(
        os.path.join(log_dir, "plugins/profile/*/perfetto_trace.json.gz")))[-1]
    data = json.loads(gzip.open(path).read())
    events = data if isinstance(data, list) else data.get("traceEvents", [])
    tpu_pids = {e.get("pid") for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    cat = collections.Counter()
    raw = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            n = e["name"]
            if n.startswith("jit_") or n.isdigit():
                continue
            cat[re.sub(r"[.\d]+$", "", n)] += e.get("dur", 0)
            raw[n] += e.get("dur", 0)
    total = sum(cat.values())
    print(f"\ntrace: {path}")
    print(f"device busy: {total / steps / 1e3:.2f} ms/step")
    for k, v in cat.most_common(20):
        print(f"{v / steps / 1e3:9.3f} ms/step  {k}")
    print("\nper-op (unaggregated, top 40):")
    for k, v in raw.most_common(40):
        print(f"{v / steps / 1e3:9.3f} ms/step  {k}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", default="online_step",
                    choices=["online_step", "infer", "chunk"])
    ap.add_argument("--out", default="/tmp/osvos_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--mode", default="fast",
                    choices=["fast", "flat", "parity", "int8"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.models import OSVOS, init_osvos_params

    cfg = ModelConfig(compute_mode=args.mode)
    params = init_osvos_params(jax.random.PRNGKey(0), cfg, input_hw=(64, 112))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.height, args.width, 3)
                    .astype(np.float32) * 30)

    if args.what == "chunk":
        # The PRODUCTION online fine-tune dispatch: a scan of `--steps`
        # optimizer steps (aug draw + fwd + bwd + grouped SGD), exactly
        # what run_online/batched rounds execute. This is the trace that
        # attributes the full ms/step budget, not just fwd+bwd.
        from osvos_tpu.configs import OnlineConfig
        from osvos_tpu.train.online import make_chunk_fn, make_online_optimizer

        ocfg = OnlineConfig(n_steps=args.steps, n_ave_grad=args.batch,
                            scan_chunk=args.steps)
        pool = 4
        pdt = jnp.bfloat16 if args.mode != "parity" else jnp.float32
        pool_imgs = jnp.asarray(
            rng.randn(pool, args.height, args.width, 3).astype(np.float32)
            * 30, pdt)
        pool_masks = jnp.asarray(
            (rng.rand(pool, args.height, args.width, 1) > 0.5)
            .astype(np.float32), pdt)
        chunk = jax.jit(make_chunk_fn(cfg, ocfg))
        tx = make_online_optimizer(params, ocfg, "microbatch")
        opt_state = tx.init(params)
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)

        def fn(p, v):
            del v
            return chunk(p, opt_state, pool_imgs, pool_masks, keys)

        np.asarray(fn(params, x)[2])  # compile + warm; host fetch = sync
        np.asarray(fn(params, x)[2])  # (block_until_ready lies on the tunnel)
        os.makedirs(args.out, exist_ok=True)
        with jax.profiler.trace(args.out, create_perfetto_trace=True):
            o = fn(params, x)
            np.asarray(o[2])
        summarize(args.out, args.steps)
        return

    if args.what == "online_step":
        from osvos_tpu.ops.loss import (
            class_balanced_cross_entropy_loss_per_sample)

        model = OSVOS(cfg)
        m = jnp.asarray((rng.rand(args.batch, args.height, args.width, 1)
                         > 0.5).astype(np.float32))

        def loss(p, v):
            out = model.apply({"params": p}, v, mode="infer")[-1]
            return class_balanced_cross_entropy_loss_per_sample(out, m).mean()

        fn = jax.jit(jax.value_and_grad(loss))
    else:
        from osvos_tpu.evaluation.infer import make_infer_fn

        fn = make_infer_fn(cfg)

    jax.tree.map(np.asarray, fn(params, x))  # compile+warm (host-fetch sync)
    jax.tree.map(np.asarray, fn(params, x))
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out, create_perfetto_trace=True):
        for _ in range(args.steps):
            o = fn(params, x)
        jax.tree.map(np.asarray, o)
    summarize(args.out, args.steps)


if __name__ == "__main__":
    main()
