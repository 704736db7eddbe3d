"""One-shot online fine-tuning, fully on device.

Reference behavior (train_online.py): load parent weights, then run
``nEpochs = 2000 * nAveGrad`` single-sample passes over the sequence's first
(frame, mask) pair with flip+ScaleNRotate augmentation, stepping SGD every
``nAveGrad`` passes with only the *fused* output's class-balanced BCE
(train_online.py:~80-130); finally run per-frame inference.

TPU-native design: the entire fine-tune — augmentation, forward, backward,
grouped-SGD update, 2000 optimizer steps — is ONE jit'd ``lax.scan`` with
donated (params, opt_state). Nothing touches the host between step 0 and
step 2000, so dispatch overhead is zero and the loop vmaps cleanly over
sequences (see parallel/batched_online.py).

Augmentation modes:
- ``pool``  (default): pre-warp ``pool_size`` augmented variants of the
  single training pair once (one batched device warp), then each microstep
  samples a pool entry + a fresh random flip. Statistically equivalent to
  per-step draws at a tiny fraction of the gather cost.
- ``per_step``: a fresh ScaleNRotate warp inside every microstep — the
  reference's exact regime, kept for parity experiments.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from osvos_tpu.configs import ModelConfig, OnlineConfig
from osvos_tpu.models.vgg_osvos import OSVOS
from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
from osvos_tpu.ops.warp import scale_n_rotate
from osvos_tpu.train.optim import make_osvos_optimizer


def _augment_pool(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray,
                  cfg: OnlineConfig, pool_size: int):
    """(pool_size, H, W, C/1) augmented variants incl. the identity sample."""
    keys = jax.random.split(key, pool_size - 1)
    warp = functools.partial(scale_n_rotate, rots=cfg.rots, scales=cfg.scales,
                             hflip_prob=0.0)  # flips are applied per-step
    imgs, masks = jax.vmap(warp, in_axes=(0, None, None))(keys, image, mask)
    imgs = jnp.concatenate([image[None], imgs], 0)
    masks = jnp.concatenate([mask[None], masks], 0)
    return imgs, masks


def make_fine_tune_fn(
    model_config: ModelConfig,
    cfg: OnlineConfig,
    aug_mode: str = "pool",
    pool_size: int = 100,
):
    """Build ``fine_tune(params, image, mask, key) -> (params, losses)``.

    image: (H, W, 3) preprocessed frame; mask: (H, W, 1) in {0,1}.
    losses: (n_steps,) per-optimizer-step fused-output loss (post-division,
    matching the reference's logged ``loss/nAveGrad`` running values).
    The returned callable is jit-compatible and vmappable.
    """
    model = OSVOS(model_config)

    def fine_tune(params, image, mask, key):
        tx = make_osvos_optimizer(
            params, base_lr=cfg.lr, momentum=cfg.momentum,
            weight_decay=cfg.weight_decay, n_ave_grad=cfg.n_ave_grad)
        opt_state = tx.init(params)

        kpool, kscan = jax.random.split(key)
        if aug_mode == "pool":
            pool_imgs, pool_masks = _augment_pool(kpool, image, mask, cfg,
                                                  pool_size)

        def loss_fn(p, img, m):
            outs = model.apply({"params": p}, img[None])
            return class_balanced_cross_entropy_loss(
                outs[-1], m[None], size_average=False,
                impl=getattr(cfg, "loss_impl", "xla"))

        def microstep(carry, skey):
            params, opt_state = carry
            if aug_mode == "pool":
                ki, kf = jax.random.split(skey)
                idx = jax.random.randint(ki, (), 0, pool_size)
                img = lax.dynamic_index_in_dim(pool_imgs, idx, keepdims=False)
                m = lax.dynamic_index_in_dim(pool_masks, idx, keepdims=False)
                flip = jax.random.uniform(kf) < cfg.hflip_prob
                img = jnp.where(flip, img[:, ::-1, :], img)
                m = jnp.where(flip, m[:, ::-1, :], m)
            else:
                img, m = scale_n_rotate(skey, image, mask, rots=cfg.rots,
                                        scales=cfg.scales,
                                        hflip_prob=cfg.hflip_prob)
            loss, grads = jax.value_and_grad(loss_fn)(params, img, m)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
            return (params, opt_state), loss / cfg.n_ave_grad

        n_micro = cfg.n_steps * cfg.n_ave_grad
        keys = jax.random.split(kscan, n_micro)
        (params, _), micro_losses = lax.scan(microstep, (params, opt_state),
                                             keys)
        losses = micro_losses.reshape(cfg.n_steps, cfg.n_ave_grad).sum(-1)
        return params, losses

    return fine_tune


def fine_tune_jit(model_config: ModelConfig, cfg: OnlineConfig, **kw):
    """Single-sequence entry: jit with donated params."""
    fn = make_fine_tune_fn(model_config, cfg, **kw)
    return jax.jit(fn, donate_argnums=(0,))


@dataclasses.dataclass
class OnlineResult:
    params: object
    losses: object  # (n_steps,) float32


def run_online(params, image, mask, model_config: ModelConfig,
               cfg: OnlineConfig, **kw) -> OnlineResult:
    key = jax.random.PRNGKey(cfg.seed)
    fn = fine_tune_jit(model_config, cfg, **kw)
    # Copy before the donated call — callers reuse the parent params across
    # sequences (e.g. the serial --all_val loop) and donation would consume
    # their buffers.
    params = jax.tree.map(jnp.array, params)
    new_params, losses = fn(params, jnp.asarray(image), jnp.asarray(mask), key)
    return OnlineResult(params=new_params, losses=losses)
