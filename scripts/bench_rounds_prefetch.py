#!/usr/bin/env python
"""A/B the rounds scheduler's stage-ahead transfer overlap.

`_fine_tune_rounds` stages round r+1's host->device pool transfers
(~330 MB/device at 480p pool_size=100) while round r's dispatches are in
flight (OSVOS_ROUNDS_PREFETCH=1, the default) or strictly after them
(=0). This drives the PRODUCTION `batched_fine_tune` path end to end —
host cv2 pools, rounds schedule, chunked dispatches — at S=2 on one
device (two serial rounds, the one-chip degenerate case of the v5e-8
schedule), so the measured wall includes exactly the transfer the
prefetch is supposed to hide.

Run once per arm (the gate is read at import):
    OSVOS_ROUNDS_PREFETCH=1 python scripts/bench_rounds_prefetch.py
    OSVOS_ROUNDS_PREFETCH=0 python scripts/bench_rounds_prefetch.py
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
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--warm_steps", type=int, default=250,
                    help="compile-warm run length (one scan chunk)")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--pool", type=int, default=100)
    args = ap.parse_args()

    import dataclasses

    import jax

    from osvos_tpu.configs import ModelConfig, OnlineConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.parallel.batched_online import batched_fine_tune

    mcfg = ModelConfig(compute_mode="flat")
    params = init_osvos_params(jax.random.PRNGKey(0), mcfg,
                               input_hw=(64, 112))
    rng = np.random.RandomState(0)
    imgs = rng.randn(args.seqs, args.height, args.width, 3).astype(
        np.float32) * 30
    masks = (rng.rand(args.seqs, args.height, args.width, 1) > 0.5).astype(
        np.float32)

    prefetch = os.environ.get("OSVOS_ROUNDS_PREFETCH", "1")

    def run(n_steps):
        cfg = OnlineConfig(n_steps=n_steps)
        t0 = time.perf_counter()
        p, losses = batched_fine_tune(params, imgs, masks, mcfg, cfg,
                                      mesh=None, pool_size=args.pool,
                                      schedule="rounds")
        np.asarray(losses)  # host fetch = the only trustworthy sync
        return time.perf_counter() - t0

    warm = run(args.warm_steps)
    print(f"warm ({args.warm_steps} steps, incl. compile): {warm:.1f}s",
          flush=True)
    wall = min(run(args.steps) for _ in range(2))
    print(f"OSVOS_ROUNDS_PREFETCH={prefetch} S={args.seqs} "
          f"steps={args.steps}: {wall:.2f}s wall "
          f"({wall / args.seqs:.2f} s/seq)", flush=True)


if __name__ == "__main__":
    main()
