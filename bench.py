#!/usr/bin/env python
"""Benchmark harness: inference throughput + online fine-tune step time.

Prints ONE JSON line. The primary metric stays the 480p inference
throughput; the online fine-tune step time (the <=60 s/sequence target)
and the batched-adaptation per-sequence projection ride in the same line
under "extra_metrics" so the driver's BENCH_r*.json captures all three
from the real chip:

  {"metric": "480p_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N, "extra_metrics": {
     "online_ms_per_step": ..,          # serial single-sequence, batch n_ave_grad
     "online_s_per_sequence": ..,       # x2000 steps (reference protocol)
     "v5e8_val20_s_per_seq_proj": ..    # 20 val seqs, 8 chips, rounds of 8
   }}

Baseline: the reference repo runs ~100-130 ms/frame 480p inference on a
Titan X (BASELINE.md, OSVOS paper) -> 8.7 f/s at the 115 ms midpoint, and
~10 min/sequence online fine-tuning. Driver v5e targets: >= 500 f/s/chip,
<= 60 s/sequence.

Runs on whatever jax.default_backend() provides (the real TPU chip under
the driver; CPU in dev shells — pass --tiny there, which also shrinks the
fine-tune benches).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 8.7  # reference: ~115 ms/frame 480p on Titan X (BASELINE.md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model+shape smoke run (CPU dev shells)")
    ap.add_argument("--compute_mode", default="int8",
                    choices=["fast", "parity", "int8"])
    ap.add_argument("--train_mode", default=None,
                    help="compute mode for the fine-tune benches "
                         "(default: env OSVOS_BENCH_TRAIN_MODE or 'flat')")
    ap.add_argument("--steps_ft", type=int, default=15,
                    help="optimizer steps per timed fine-tune dispatch")
    ap.add_argument("--skip_ft", action="store_true",
                    help="inference metric only (skip fine-tune benches)")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.evaluation.infer import make_infer_fn
    from osvos_tpu.models import init_osvos_params

    if args.tiny:
        config = ModelConfig(stages=((8, 8), (12, 12), (16, 16, 16),
                                     (16, 16, 16), (16, 16, 16)),
                             side_channels=8,
                             compute_mode=args.compute_mode)
        args.height, args.width, args.batch = 64, 112, 2
    else:
        config = ModelConfig(compute_mode=args.compute_mode)

    def image_like(n, seed0):
        # synthetic DAVIS-statistics frames, preprocessed like the loader
        # (BGR - caffe mean) — honest activation ranges for calibration
        # and timing (VERDICT r1: don't calibrate int8 on noise)
        from osvos_tpu.configs import MEANVAL_BGR
        from osvos_tpu.data.synthetic import _frame

        frames = [
            _frame(args.height, args.width, t=0.7 * i, seed=seed0 + i)[0]
            for i in range(n)
        ]
        arr = np.stack(frames).astype(np.float32)
        return jnp.asarray(arr[..., ::-1] - np.asarray(MEANVAL_BGR,
                                                       np.float32))

    params = init_osvos_params(jax.random.PRNGKey(0), config,
                               input_hw=(64, 112))
    if args.compute_mode == "int8":
        # static activation scales from a quick self-calibration pass
        from osvos_tpu.models.quantize import calibrate_int8_scales

        import dataclasses as _dc

        config = _dc.replace(
            config,
            int8_scales=calibrate_int8_scales(params, image_like(2, 100),
                                              config))
    infer = make_infer_fn(config)

    x = image_like(args.batch, 0)

    for _ in range(args.warmup):
        jax.block_until_ready(infer(params, x))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = args.batch * args.iters / dt

    extra = {}
    if not args.skip_ft:
        extra = _bench_finetune(args)

    line = {
        "metric": "480p_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    if extra:
        line["extra_metrics"] = extra
    print(json.dumps(line))


def _bench_finetune(args) -> dict:
    """Serial + S=3-batched online fine-tune step times (production chunk
    fn: augmentation draw + fwd + bwd + grouped SGD, train/online.py)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig, OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.train.online import make_chunk_fn, make_online_optimizer

    mode = args.train_mode or os.environ.get("OSVOS_BENCH_TRAIN_MODE", "flat")
    if args.tiny:
        mcfg = ModelConfig(stages=((8, 8), (12, 12), (16, 16, 16),
                                   (16, 16, 16), (16, 16, 16)),
                           side_channels=8, compute_mode=mode)
        height, width, pool = 64, 112, 8
    else:
        mcfg = ModelConfig(compute_mode=mode)
        height, width, pool = args.height, args.width, 50
    ocfg = OnlineConfig()
    steps = args.steps_ft

    params = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                               input_hw=(64, 112))
    rng = np.random.RandomState(0)
    pool_imgs = jnp.asarray(
        rng.randn(pool, height, width, 3).astype(np.float32) * 30)
    pool_masks = jnp.asarray(
        (rng.rand(pool, height, width, 1) > 0.5).astype(np.float32))

    chunk = jax.jit(make_chunk_fn(mcfg, ocfg), donate_argnums=(0, 1))
    tx = make_online_optimizer(params, ocfg, "microbatch")
    keys = jax.random.split(jax.random.PRNGKey(1), steps)

    def timed(fn, *fn_args):
        state = fn(*fn_args)  # compile + warm
        jax.block_until_ready(state[2])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = fn(*state[:2], *fn_args[2:])
            jax.block_until_ready(state[2])
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    p0 = jax.tree.map(jnp.array, params)
    serial_ms = timed(chunk, p0, tx.init(p0), pool_imgs, pool_masks, keys)
    del p0

    # Production multi-sequence strategy (parallel/batched_online.py):
    # rounds of ONE sequence per device — vmap-packing was measured
    # slower per sequence (148 ms/step/seq at S=2 vs 75 serial; one
    # batch-n_ave_grad sequence already saturates a chip). The v5e-8
    # 20-sequence DAVIS val projection is therefore ceil(20/8) serial
    # rounds amortized over 20 sequences.
    import math
    rounds = math.ceil(20 / 8)
    val_proj = rounds * (serial_ms * 2.0) / 20

    return {
        "train_mode": mode,
        "online_ms_per_step": round(serial_ms, 2),
        "online_s_per_sequence": round(serial_ms * 2.0, 1),
        "v5e8_val20_s_per_seq_proj": round(val_proj, 1),
    }


if __name__ == "__main__":
    main()
