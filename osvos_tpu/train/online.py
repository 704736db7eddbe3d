"""One-shot online fine-tuning, fully on device.

Reference behavior (train_online.py): load parent weights, then run
``nEpochs = 2000 * nAveGrad`` single-sample passes over the sequence's first
(frame, mask) pair with flip+ScaleNRotate augmentation, stepping SGD every
``nAveGrad`` passes with only the *fused* output's class-balanced BCE
(train_online.py:~80-130); finally run per-frame inference.

TPU-native design: the fine-tune — augmentation draw, forward, backward,
grouped-SGD update — runs as jit'd ``lax.scan`` chunks with donated
(params, opt_state). The host only re-dispatches between chunks
(``cfg.scan_chunk`` optimizer steps each, ~a dozen dispatches per
sequence), so dispatch overhead is negligible while each dispatch stays
under remote-execution deadlines. The chunk fn vmaps cleanly over
sequences (see parallel/batched_online.py).

Augmentation modes:
- ``pool``  (default): ``pool_size`` pre-warped variants of the single
  training pair; each step samples pool entries + fresh random flips.
  Statistically equivalent to fresh per-step warps at a fraction of the
  cost. Pools are built on the HOST with cv2 (``build_host_pool``) — the
  exact warpAffine/INTER_CUBIC+INTER_NEAREST semantics of the reference's
  ScaleNRotate (custom_transforms.py:~15); TPU gather-based warping of
  480p frames is an order of magnitude slower than host cv2 here.
- ``per_step``: a fresh device-side ScaleNRotate warp inside every step —
  kept for parity experiments and host-free pipelines.

Step modes:
- ``microbatch`` (default): each optimizer step draws its ``n_ave_grad``
  augmented samples and runs ONE batched forward/backward with loss
  ``sum_i(loss_i) / n_ave_grad``. This is *mathematically identical* to the
  reference's sequential accumulate-then-step (same mean gradient, same
  SGD/momentum/weight-decay timing) but replaces n_ave_grad batch-1 convs
  with one batch-n conv — far better MXU utilization.
- ``sequential``: the reference's literal regime — n_ave_grad batch-1
  microsteps with optax.MultiSteps accumulation.

The fine-tune objective uses the model's 'infer'-mode graph: the online
loss consumes only the fused output (train_online.py:~80-130), and the
fused head is algebraically equal to the train-mode fused logits while
skipping the dead score_dsn branches and 16x the full-res upsample work in
both the forward AND backward pass.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from osvos_tpu.configs import ModelConfig, OnlineConfig
from osvos_tpu.models.vgg_osvos import OSVOS
from osvos_tpu.ops.loss import (class_balanced_cross_entropy_loss,
                                class_balanced_cross_entropy_loss_per_sample)
from osvos_tpu.ops.warp import scale_n_rotate
from osvos_tpu.train.optim import make_osvos_optimizer


def build_host_pool(image: np.ndarray, mask: np.ndarray, cfg: OnlineConfig,
                    pool_size: int, seed: int = 0,
                    dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """cv2-warped augmentation pool: (P, H, W, 3), (P, H, W, 1).

    Entry 0 is the identity sample; entries 1..P-1 are ScaleNRotate draws
    with the reference's exact interpolation (warpAffine INTER_CUBIC for
    the image, INTER_NEAREST for the mask, zero border). Flips are NOT
    baked in — the device step applies a fresh random flip per draw.
    """
    import random as _random

    from osvos_tpu.data.transforms import ScaleNRotate

    rng = _random.Random(seed)
    warp = ScaleNRotate(cfg.rots, cfg.scales, rng=rng)
    image = np.asarray(image, np.float32)
    mask = np.asarray(mask, np.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    imgs, masks = [image], [mask]
    for _ in range(pool_size - 1):
        s = warp({"image": image.copy(), "gt": mask.copy()})
        m = np.asarray(s["gt"], np.float32)
        if m.ndim == 2:
            m = m[..., None]
        imgs.append(np.asarray(s["image"], np.float32))
        masks.append(m)
    return (np.stack(imgs).astype(dtype), np.stack(masks).astype(dtype))


def _augment_pool(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray,
                  cfg: OnlineConfig, pool_size: int):
    """Device-side pool: (pool_size, H, W, C/1) variants incl. identity.
    Used by the self-contained ``make_fine_tune_fn`` (tests / host-free
    paths); production entry points pass a cv2 ``build_host_pool``."""
    keys = jax.random.split(key, pool_size - 1)
    warp = functools.partial(scale_n_rotate, rots=cfg.rots, scales=cfg.scales,
                             hflip_prob=0.0)  # flips are applied per-step
    imgs, masks = jax.vmap(warp, in_axes=(0, None, None))(keys, image, mask)
    imgs = jnp.concatenate([image[None], imgs], 0)
    masks = jnp.concatenate([mask[None], masks], 0)
    return imgs, masks


def make_online_optimizer(params, cfg: OnlineConfig, step_mode: str):
    return make_osvos_optimizer(
        params, base_lr=cfg.lr, momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        n_ave_grad=cfg.n_ave_grad if step_mode == "sequential" else 1)


def make_chunk_fn(
    model_config: ModelConfig,
    cfg: OnlineConfig,
    aug_mode: str = "pool",
    step_mode: str = "microbatch",
):
    """Build the per-chunk scan body:

    ``chunk(params, opt_state, pool_imgs, pool_masks, keys)
        -> (params, opt_state, losses)``

    keys: (chunk_len, 2) PRNG keys, one optimizer step each. For
    aug_mode='per_step' the pool args carry the raw (1, H, W, C) pair.
    jit with ``donate_argnums=(0, 1)``; vmappable over a leading
    sequence axis on every argument.
    """
    model = OSVOS(model_config)
    seq = step_mode == "sequential"
    impl = getattr(cfg, "loss_impl", "xla")

    def draw(skey, pool_imgs, pool_masks):
        if aug_mode == "pool":
            ki, kf = jax.random.split(skey)
            idx = jax.random.randint(ki, (), 0, pool_imgs.shape[0])
            img = lax.dynamic_index_in_dim(pool_imgs, idx, keepdims=False)
            m = lax.dynamic_index_in_dim(pool_masks, idx, keepdims=False)
            flip = jax.random.uniform(kf) < cfg.hflip_prob
            img = jnp.where(flip, img[:, ::-1, :], img)
            m = jnp.where(flip, m[:, ::-1, :], m)
            return img, m
        return scale_n_rotate(skey, pool_imgs[0], pool_masks[0],
                              rots=cfg.rots, scales=cfg.scales,
                              hflip_prob=cfg.hflip_prob)

    def loss_one(p, img, m):
        out = model.apply({"params": p}, img[None], mode="infer")[-1]
        return class_balanced_cross_entropy_loss(
            out, m[None].astype(jnp.float32), size_average=False, impl=impl)

    def chunk(params, opt_state, pool_imgs, pool_masks, keys):
        tx = make_online_optimizer(params, cfg, step_mode)

        if seq:
            def microstep(carry, skey):
                params, opt_state = carry
                img, m = draw(skey, pool_imgs, pool_masks)
                loss, grads = jax.value_and_grad(loss_one)(params, img, m)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, b: a + b, params, updates)
                return (params, opt_state), loss / cfg.n_ave_grad

            micro_keys = jax.vmap(
                lambda k: jax.random.split(k, cfg.n_ave_grad))(keys)
            micro_keys = micro_keys.reshape(-1, *micro_keys.shape[2:])
            (params, opt_state), micro_losses = lax.scan(
                microstep, (params, opt_state), micro_keys)
            losses = micro_losses.reshape(-1, cfg.n_ave_grad).sum(-1)
            return params, opt_state, losses

        def loss_batch(p, imgs, ms):
            # mean of per-sample class-balanced losses — identical to the
            # reference's accumulate-grads-of-(loss_i/n) (train_online.py).
            out = model.apply({"params": p}, imgs, mode="infer")[-1]
            return class_balanced_cross_entropy_loss_per_sample(
                out, ms.astype(jnp.float32), impl=impl).mean()

        def step(carry, skey):
            params, opt_state = carry
            ks = jax.random.split(skey, cfg.n_ave_grad)
            imgs, ms = jax.vmap(draw, in_axes=(0, None, None))(
                ks, pool_imgs, pool_masks)
            loss, grads = jax.value_and_grad(loss_batch)(params, imgs, ms)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = lax.scan(step, (params, opt_state),
                                               keys)
        return params, opt_state, losses

    return chunk


def make_fine_tune_fn(
    model_config: ModelConfig,
    cfg: OnlineConfig,
    aug_mode: str = "pool",
    pool_size: int = 100,
    step_mode: str = "microbatch",
):
    """Self-contained ``fine_tune(params, image, mask, key) -> (params,
    losses)`` — device-side pool build + every optimizer step in one scan.

    image: (H, W, 3) preprocessed frame; mask: (H, W, 1) in {0,1}.
    losses: (n_steps,) per-optimizer-step fused-output loss (post-division,
    matching the reference's logged ``loss/nAveGrad`` running values).
    jit-compatible and vmappable. Production single-dispatch path for small
    step counts; the chunked entry points (run_online,
    parallel/batched_online) use ``make_chunk_fn`` to bound per-dispatch
    wall-clock.
    """
    chunk = make_chunk_fn(model_config, cfg, aug_mode=aug_mode,
                          step_mode=step_mode)

    def fine_tune(params, image, mask, key):
        tx = make_online_optimizer(params, cfg, step_mode)
        opt_state = tx.init(params)
        kpool, kscan = jax.random.split(key)
        if aug_mode == "pool":
            pool_imgs, pool_masks = _augment_pool(kpool, image, mask, cfg,
                                                  pool_size)
        else:
            pool_imgs, pool_masks = image[None], mask[None]
        keys = jax.random.split(kscan, cfg.n_steps)
        params, _, losses = chunk(params, opt_state, pool_imgs, pool_masks,
                                  keys)
        return params, losses

    return fine_tune


def fine_tune_jit(model_config: ModelConfig, cfg: OnlineConfig, **kw):
    """Single-sequence, single-dispatch entry: jit with donated params."""
    fn = make_fine_tune_fn(model_config, cfg, **kw)
    return jax.jit(fn, donate_argnums=(0,))


@dataclasses.dataclass
class OnlineResult:
    params: object
    losses: object  # (n_steps,) float32


def run_online(params, image, mask, model_config: ModelConfig,
               cfg: OnlineConfig, aug_mode: str = "pool",
               pool_size: int = 100, step_mode: str = "microbatch",
               pool_seed: Optional[int] = None) -> OnlineResult:
    """Production single-sequence fine-tune: host cv2 pool + chunked
    dispatches (cfg.scan_chunk optimizer steps per dispatch)."""
    key = jax.random.PRNGKey(cfg.seed)
    if aug_mode == "pool":
        pool_imgs, pool_masks = build_host_pool(
            np.asarray(image), np.asarray(mask), cfg, pool_size,
            seed=cfg.seed if pool_seed is None else pool_seed)
        pool_imgs = jnp.asarray(pool_imgs)
        pool_masks = jnp.asarray(pool_masks)
    else:
        pool_imgs = jnp.asarray(image)[None]
        pool_masks = jnp.asarray(mask)[None]

    chunk = jax.jit(
        make_chunk_fn(model_config, cfg, aug_mode=aug_mode,
                      step_mode=step_mode),
        donate_argnums=(0, 1))
    tx = make_online_optimizer(params, cfg, step_mode)
    # Copy before the donated calls — callers reuse the parent params
    # across sequences (e.g. the serial --all_val loop).
    params = jax.tree.map(jnp.array, params)
    opt_state = tx.init(params)

    chunk_len = max(1, getattr(cfg, "scan_chunk", 250))
    keys = jax.random.split(key, cfg.n_steps)
    losses = []
    for start in range(0, cfg.n_steps, chunk_len):
        k = keys[start:start + chunk_len]
        params, opt_state, l = chunk(params, opt_state, pool_imgs,
                                     pool_masks, k)
        losses.append(l)
    return OnlineResult(params=params, losses=jnp.concatenate(losses))
