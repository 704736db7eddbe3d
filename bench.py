#!/usr/bin/env python
"""Benchmark harness: 480p inference throughput (frames/sec/chip).

Prints ONE JSON line:
  {"metric": "480p_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N}

Baseline: the reference repo runs ~100-130 ms/frame on a Titan X
(BASELINE.md, OSVOS paper) -> 8.7 f/s at the 115 ms midpoint. The driver's
v5e target is >= 500 f/s/chip.

Runs on whatever jax.default_backend() provides (the real TPU chip under
the driver; CPU in dev shells — pass --tiny there).
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

    params = init_osvos_params(jax.random.PRNGKey(0), config,
                               input_hw=(64, 112))
    if args.compute_mode == "int8":
        # static activation scales from a quick self-calibration pass
        from osvos_tpu.models.quantize import calibrate_int8_scales

        rng_cal = np.random.RandomState(1)
        cal = jnp.asarray(rng_cal.randn(2, args.height, args.width, 3)
                          .astype(np.float32) * 30)
        import dataclasses as _dc

        config = _dc.replace(
            config, int8_scales=calibrate_int8_scales(params, cal, config))
    infer = make_infer_fn(config)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.height, args.width, 3)
                    .astype(np.float32) * 30)

    for _ in range(args.warmup):
        jax.block_until_ready(infer(params, x))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "480p_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
