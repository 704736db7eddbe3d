#!/usr/bin/env python
"""Benchmark harness: inference throughput + online fine-tune step time.

Prints ONE JSON line. The primary metric stays the 480p inference
throughput; the online fine-tune step time (the <=60 s/sequence target)
and the batched-adaptation per-sequence projection ride in the same line
under "extra_metrics" so the driver's BENCH_r*.json captures all three
from the real chip:

  {"metric": "480p_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N, "extra_metrics": {
     "online_ms_per_step": ..,            # serial, batch n_ave_grad, rounds executor
     "online_s_per_sequence": ..,         # x2000 steps (reference protocol)
     "rounds_s2_measured_s_per_seq": ..,  # MEASURED 2-sequence rounds run
     "v5e8_val20_s_per_seq_proj": ..,     # from the measured round time
     "parent_train_ms_per_step_flat": .., # parent step, 480p batch 5
     "parent_train_ms_per_step_fast": ..
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
    ap.add_argument("--steps_ft", type=int, default=None,
                    help="optimizer steps per timed fine-tune dispatch "
                         "(default: OnlineConfig.scan_chunk — the "
                         "PRODUCTION dispatch size, so the per-step time "
                         "amortizes the per-dispatch overhead exactly as "
                         "the real 2000-step protocol does; rounds 1-2 "
                         "used 15, which over-charged each step ~12x its "
                         "production share of dispatch cost)")
    ap.add_argument("--skip_ft", action="store_true",
                    help="inference metric only (skip fine-tune benches)")
    ap.add_argument("--skip_parent", action="store_true",
                    help="skip the parent-training step benches")
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
    if not args.skip_parent:
        extra.update(_bench_parent(args))

    line = {
        "metric": "480p_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    if extra:
        line["extra_metrics"] = extra
    print(json.dumps(line))


def _finetune_pools(height, width, pool, n_seqs):
    """Per-sequence augmentation-pool stand-ins with DAVIS-like statistics:
    synthetic image frames (not noise) and their object masks (~10%
    foreground), preprocessed like the loader. VERDICT r1/r2: never bench
    or calibrate on 50%-foreground noise."""
    import numpy as np

    import jax.numpy as jnp

    from osvos_tpu.configs import MEANVAL_BGR
    from osvos_tpu.data.synthetic import _frame

    mean = np.asarray(MEANVAL_BGR, np.float32)
    out = []
    for s in range(n_seqs):
        imgs, masks = [], []
        for i in range(pool):
            img, m = _frame(height, width, t=0.31 * i, seed=17 * s + 3)
            imgs.append(img.astype(np.float32)[..., ::-1] - mean)
            masks.append((m > 127).astype(np.float32)[..., None])
        out.append((jnp.asarray(np.stack(imgs)),
                    jnp.asarray(np.stack(masks))))
    return out


def _bench_finetune(args) -> dict:
    """Online fine-tune timings through the PRODUCTION rounds executor
    (parallel/batched_online.make_rounds_fn — the same jitted fn the
    'rounds' scheduler dispatches): serial per-step time, plus a MEASURED
    S=2 two-round run on this chip (the one-device degenerate case of the
    rounds schedule; on a v5e-8 each round adapts 8 sequences instead
    of 1, same executable shape per device)."""
    import jax
    import jax.numpy as jnp

    from osvos_tpu.configs import ModelConfig, OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.parallel.batched_online import make_rounds_fn
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
    steps = (args.steps_ft if args.steps_ft is not None
             else (8 if args.tiny else ocfg.scan_chunk))
    if steps < 1:
        raise ValueError(f"--steps_ft must be >= 1, got {steps}")

    params = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                               input_hw=(64, 112))
    pools = _finetune_pools(height, width, pool, 2)
    pool_dtype = jnp.float32 if mode == "parity" else jnp.bfloat16
    pools = [(pi.astype(pool_dtype), pm.astype(pool_dtype))
             for pi, pm in pools]

    import numpy as np

    fn, put = make_rounds_fn(make_chunk_fn(mcfg, ocfg), mesh=None)
    tx = make_online_optimizer(params, ocfg, "microbatch")
    keys = put(jax.random.split(jax.random.PRNGKey(1), steps)[None])
    params_dev = jax.device_put(params)
    opt0_dev = jax.device_put(tx.init(params))
    pools = [(put(pi[None]), put(pm[None])) for pi, pm in pools]

    def fresh_state():
        # Device-side copies (what _fine_tune_rounds' take() does when the
        # parent params are device-resident) — the jitted fn donates its
        # (params, opt_state) so each round needs fresh buffers.
        p = jax.tree.map(lambda a: jnp.array(a)[None], params_dev)
        o = jax.tree.map(lambda a: jnp.array(a)[None], opt0_dev)
        return p, o

    def one_round(seq_idx):
        """One production round (steps optimizer steps, one dispatch).
        np.asarray(l) is the sync: through the remote tunnel,
        block_until_ready returns early — only a host fetch is a
        trustworthy timing barrier (CLAUDE.md platform traps)."""
        p, o = fresh_state()
        pi, pm = pools[seq_idx]
        t0 = time.perf_counter()
        p, o, l = fn(p, o, pi, pm, keys)
        np.asarray(l)
        return time.perf_counter() - t0

    one_round(0)  # compile + warm the executor
    serial_best = min(one_round(0) for _ in range(3))
    serial_ms = serial_best / steps * 1e3

    # Measured S=2 rounds: two back-to-back rounds with per-sequence pools
    # and fresh states — exactly what the 'rounds' scheduler dispatches for
    # S=2 on one device. Scaled from `steps` to the 2000-step protocol;
    # best-of-2 because the x(2000/steps) scaling amplifies run-to-run
    # variance (~10% on the tunnel) into tens of seconds.
    rounds_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for seq in range(2):
            one_round(seq)
        rounds_wall = min(rounds_wall, time.perf_counter() - t0)
    rounds_s2_s_per_seq = rounds_wall / 2 * (2000 / steps)

    # v5e-8 20-sequence val projection from the MEASURED round time:
    # ceil(20/8)=3 serial rounds (8 sequences each, one per device)
    # amortized over 20 sequences.
    import math
    round_2000_s = (rounds_wall / 2) * (2000 / steps)
    val_proj = math.ceil(20 / 8) * round_2000_s / 20

    return {
        "train_mode": mode,
        "online_ms_per_step": round(serial_ms, 2),
        "online_s_per_sequence": round(serial_ms * 2.0, 1),
        "rounds_s2_measured_s_per_seq": round(rounds_s2_s_per_seq, 1),
        "v5e8_val20_s_per_seq_proj": round(val_proj, 1),
    }


def _bench_parent(args) -> dict:
    """Driver-visible parent-training step times (480p, batch 5 — the
    reference regime run as one microbatched step, train/parent.py), for
    the flat and fast trunks."""
    import numpy as np

    import jax

    from osvos_tpu.configs import ModelConfig, ParentConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.train.parent import ParentTrainer

    if args.tiny:
        stages = dict(stages=((8, 8), (12, 12), (16, 16, 16), (16, 16, 16),
                              (16, 16, 16)), side_channels=8)
        height, width = 64, 112
    else:
        stages = {}
        height, width = args.height, args.width
    import jax.numpy as jnp

    batch = 5
    pools = _finetune_pools(height, width, batch, 1)
    # Device-resident once — re-shipping 25 MB of frames from host through
    # the tunnel per timed call would dominate the step time.
    images = jnp.asarray(pools[0][0], jnp.float32)
    gts = jnp.asarray(pools[0][1], jnp.float32)

    out = {}
    for mode in ("flat", "fast"):
        mcfg = ModelConfig(compute_mode=mode, **stages)
        params = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                                   input_hw=(64, 112))
        trainer = ParentTrainer(params, mcfg,
                                ParentConfig(batch_size=batch, n_ave_grad=1))
        m = trainer.train_step(images, gts, 0.7)  # compile + warm
        float(m["total"])  # host fetch — the only trustworthy tunnel sync
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            m = trainer.train_step(images, gts, 0.7)
            float(m["total"])
            best = min(best, time.perf_counter() - t0)
        out[f"parent_train_ms_per_step_{mode}"] = round(best * 1e3, 2)
    return out


if __name__ == "__main__":
    main()
