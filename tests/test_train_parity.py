"""Joint N-step online-training parity vs the torch oracle.

The strongest offline stand-in for the DAVIS J-parity gate (SURVEY.md §6;
J itself is unmeasurable without DAVIS data / pretrained weights): run the
REFERENCE online fine-tune loop — grouped SGD + CB-BCE on the fused
output, the exact augmentation stream — for several optimizer steps in
torch (tests/torch_oracle.online_finetune_oracle) and in the production
JAX chunk (train/online.make_chunk_fn) from identical ported weights, and
require the final parameters and loss trajectories to agree to
f32-accumulation tolerance. Unlike the per-component oracles (loss, SGD
groups, forward, pool bwd), this catches integration-order bugs: momentum
timing vs accumulation, loss scaling, augmentation indexing, update sign.

Both step modes are covered: 'microbatch' (one batched fwd/bwd per step,
mathematically equal to the reference's accumulate-then-step) and
'sequential' (the literal regime via optax.MultiSteps).

Both compute modes are covered (VERDICT r3 #2): 'parity' (f32 XLA trunk)
at tight f32-accumulation tolerance, and 'flat' — the PRODUCTION online
trunk (bf16 Pallas kernels, interpret mode on CPU) — at bf16-scaled
tolerance, so the production kernels are ONE hop from the torch oracle
instead of transitively through flat==fast. The flat runs cover both
layouts: even frame dims take the pixel-pair PACKED path (incl. the fused
conv+pool and side_and_pool epilogues — the 480x854 production
composition), odd dims the unpacked flat path.

Flat tolerance (measured, 2026-08-18): bf16 forward error compounds over
the 5-step trajectory, and on the DEEP stage-5 leaves — whose total
movement is ~1% of the global max delta — the noise reaches ~60% of the
leaf's own scale. This is NOT a Pallas artifact: the pure-XLA bf16 'fast'
trunk at the identical geometry lands rel 0.40-0.67 from the f32 torch
oracle on the same leaves (flat: 0.24-0.61, slightly CLOSER). So flat
deltas get a two-term bound, atol = max(0.2*leaf_scale,
0.075*global_max_delta): load-bearing leaves keep O(1)-bug sensitivity
(wrong sample, wrong sign, momentum off-by-one, missing 1/nAveGrad all
perturb them at O(1) of scale), while noise-scale leaves are judged
against the global movement floor. Per-tap kernel exactness on the deep
stages is covered separately by tests/test_flat.py vs the XLA twin.
"""

import functools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig, OnlineConfig
from osvos_tpu.models import load_torch_state_dict
from osvos_tpu.train.online import (build_host_pool, make_chunk_fn,
                                    make_online_optimizer)

from tests.torch_oracle import TorchOSVOS, online_finetune_oracle

TINY_STAGES = ((8, 8), (12, 12), (16, 16, 16), (16, 16, 16), (16, 16, 16))
SIDE_CH = 8
POOL = 3
CFG = OnlineConfig(n_steps=5, n_ave_grad=2, lr=1e-5, weight_decay=2e-4,
                   momentum=0.9, hflip_prob=0.5, seed=0)


@functools.lru_cache(maxsize=None)
def _setup(h, w):
    torch.manual_seed(11)
    net = TorchOSVOS(stages=TINY_STAGES, side_channels=SIDE_CH)
    state0 = {k: v.detach().clone() for k, v in net.state_dict().items()}

    rng = np.random.RandomState(5)
    img = (rng.randn(h, w, 3) * 40).astype(np.float32)
    # blob-ish mask, ~15% foreground
    yy, xx = np.mgrid[:h, :w]
    mask = (((yy - h / 2) ** 2 + (xx - w / 3) ** 2) < (h / 3) ** 2
            ).astype(np.float32)[..., None]
    pool_imgs, pool_masks = build_host_pool(img, mask, CFG, POOL, seed=3)

    # The augmentation stream the JAX chunk will consume, replayed on host
    # with the same PRNG calls (train/online.make_chunk_fn draw()).
    seq_key = jax.random.PRNGKey(7)
    keys = jax.random.split(seq_key, CFG.n_steps)
    draws = []
    for s in range(CFG.n_steps):
        for k in jax.random.split(keys[s], CFG.n_ave_grad):
            ki, kf = jax.random.split(k)
            idx = int(jax.random.randint(ki, (), 0, POOL))
            flip = bool(jax.random.uniform(kf) < CFG.hflip_prob)
            draws.append((idx, flip))
    return net, state0, pool_imgs, pool_masks, keys, draws


def _run_jax(state0, pool_imgs, pool_masks, keys, step_mode, compute_mode):
    cfg_m = ModelConfig(stages=TINY_STAGES, side_channels=SIDE_CH,
                        compute_mode=compute_mode)
    params = load_torch_state_dict(
        {k: v.numpy() for k, v in state0.items()}, config=cfg_m)
    chunk = jax.jit(make_chunk_fn(cfg_m, CFG, aug_mode="pool",
                                  step_mode=step_mode))
    tx = make_online_optimizer(params, CFG, step_mode)
    p, _, losses = chunk(params, tx.init(params), jnp.asarray(pool_imgs),
                         jnp.asarray(pool_masks), keys)
    return jax.tree.map(np.asarray, p), np.asarray(losses), params


# (step_mode, compute_mode, H, W): parity at the historical odd geometry;
# flat at both layouts — even dims = packed production path, odd = unpacked.
CASES = [
    ("microbatch", "parity", 33, 49),
    ("sequential", "parity", 33, 49),
    pytest.param("microbatch", "flat", 32, 48, marks=pytest.mark.slow),
    pytest.param("sequential", "flat", 33, 49, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("step_mode,compute_mode,h,w", CASES)
def test_n_step_online_training_matches_torch(step_mode, compute_mode, h, w):
    net, state0, pool_imgs, pool_masks, keys, draws = _setup(h, w)
    net.load_state_dict(state0)

    torch_losses = online_finetune_oracle(
        net, pool_imgs, pool_masks, draws, CFG.lr, CFG.momentum,
        CFG.weight_decay, CFG.n_ave_grad)
    cfg_m = ModelConfig(stages=TINY_STAGES, side_channels=SIDE_CH)
    want = load_torch_state_dict(
        {k: v.detach().numpy() for k, v in net.state_dict().items()},
        config=cfg_m)
    want = jax.tree.map(np.asarray, want)

    got, jax_losses, p0 = _run_jax(state0, pool_imgs, pool_masks, keys,
                                   step_mode, compute_mode)

    loss_rtol = 2e-4 if compute_mode == "parity" else 5e-2
    np.testing.assert_allclose(jax_losses, np.asarray(torch_losses),
                               rtol=loss_rtol)

    # Compare the training DELTAS (the raw params are dominated by init);
    # f32 accumulation-order tolerance for 'parity', the measured
    # two-term bf16-trajectory bound for 'flat' (see module docstring).
    delta_tol = 5e-3 if compute_mode == "parity" else 0.2
    floor_frac = 0.0 if compute_mode == "parity" else 0.075
    p0 = jax.tree.map(np.asarray, p0)
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_p0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    gmax = max(float(np.abs(w_ - p).max())
               for (_, w_), (_, p) in zip(flat_want, flat_p0))
    moved = 0.0
    for (path, g), (_, w_), (_, p) in zip(flat_got, flat_want, flat_p0):
        dg, dw = g - p, w_ - p
        moved = max(moved, float(np.abs(dw).max()))
        scale = max(float(np.abs(dw).max()), 1e-12)
        atol = max(delta_tol * scale, floor_frac * gmax)
        np.testing.assert_allclose(
            dg, dw, atol=atol, rtol=0,
            err_msg=f"param delta diverges at {jax.tree_util.keystr(path)}")
    assert moved > 0, "training moved nothing — test is vacuous"
