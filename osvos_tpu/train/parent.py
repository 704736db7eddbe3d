"""Parent-network training on the DAVIS-2016 train split.

Reference behavior (train_parent.py): 240 epochs over all train-split
(frame, mask) pairs, batch 1, flip+ScaleNRotate host augmentation, gradient
accumulation over nAveGrad=10 samples, deep supervision with the side-output
sum annealed linearly to zero — ``loss = (1 - epoch/nEpochs) * sum(side) +
fuse`` (train_parent.py:~120) — snapshots every 40 epochs and an optional
val-loss probe every 5.

TPU-native design: the train step is jit'd once (static shapes via 480p
resize) and data-parallel over a 1-D device mesh — the batch is sharded on
the 'data' axis, params are replicated, and XLA inserts the gradient
all-reduce (psum over ICI) automatically from the sharding annotations. The
host pipeline (cv2 decode + augment) runs in a background thread feeding a
small prefetch queue.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from osvos_tpu.configs import DataConfig, ModelConfig, ParentConfig
from osvos_tpu.data.davis import DAVIS2016, iterate_batches
from osvos_tpu.data.transforms import (Compose, RandomHorizontalFlip, Resize,
                                       ScaleNRotate, ToArray)
from osvos_tpu.models.vgg_osvos import OSVOS
from osvos_tpu.ops.loss import (class_balanced_cross_entropy_loss,
                                class_balanced_cross_entropy_loss_per_sample)
from osvos_tpu.train.optim import make_osvos_optimizer


def make_parent_train_step(model_config: ModelConfig, cfg: ParentConfig):
    """Build ``step(params, opt_state, batch, side_weight) ->
    (params, opt_state, metrics)``; ``side_weight`` is the annealed
    ``1 - epoch/nEpochs`` deep-supervision factor.

    Class balance is PER SAMPLE, averaged over the batch: the reference
    always computes the loss on batch-1 samples and accumulates
    ``loss/nAveGrad`` over nAveGrad of them (train_parent.py:~120-130), so
    a batch-nAveGrad step with mean-of-per-sample-losses produces the
    identical gradient and momentum timing — run ``batch_size=n_ave_grad,
    n_ave_grad=1`` for the reference regime at full MXU batch efficiency."""
    model = OSVOS(model_config)
    impl = getattr(cfg, "loss_impl", "xla")

    def loss_fn(params, images, gts, side_weight):
        outs = model.apply({"params": params}, images)
        losses = [class_balanced_cross_entropy_loss_per_sample(
            o, gts, impl=impl).mean() for o in outs]
        total = side_weight * sum(losses[:-1]) + losses[-1]
        return total, jnp.stack(losses)

    def make(tx):
        def step(params, opt_state, images, gts, side_weight):
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, images, gts, side_weight)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
            return params, opt_state, {"total": total, "per_output": losses}
        return step

    def make_sharded(tx, mesh: Mesh, axis: str = "data"):
        """Explicit shard_map DP step for the 'flat' trunk: the flat
        Pallas buffers fold the batch into their row dimension, so the
        GSPMD partitioner cannot split the pallas_calls along the batch —
        instead each device runs the whole flat trunk on its LOCAL batch
        shard and the gradients/metrics are pmean'd over the axis (the
        same mean-of-per-sample semantics as the single-device step; XLA
        rides the psum over ICI). Requires batch % n_devices == 0."""

        def local_grads(params, images, gts, side_weight):
            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, images, gts, side_weight)
            grads = jax.lax.pmean(grads, axis)
            return (jax.lax.pmean(total, axis),
                    jax.lax.pmean(losses, axis), grads)

        smapped = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=(P(), P(), P()), check_vma=False)

        def step(params, opt_state, images, gts, side_weight):
            total, losses, grads = smapped(params, images, gts, side_weight)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
            return params, opt_state, {"total": total, "per_output": losses}
        return step

    return loss_fn, make, make_sharded


class ParentTrainer:
    """Owns optimizer state, the jit'd step, and the epoch loop."""

    def __init__(self, params, model_config: ModelConfig, cfg: ParentConfig,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.model_config = model_config
        self.tx = make_osvos_optimizer(
            params, base_lr=cfg.lr, momentum=cfg.momentum,
            weight_decay=cfg.weight_decay, n_ave_grad=cfg.n_ave_grad)
        # Private copy: the jitted step donates (params, opt_state), and
        # donation must never consume buffers the caller still owns.
        self.params = jax.tree.map(jnp.array, params)
        self.opt_state = self.tx.init(params)
        self.mesh = mesh
        _, make, make_sharded = make_parent_train_step(model_config, cfg)

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            if model_config.compute_mode == "flat":
                # GSPMD cannot batch-partition the flat pallas_calls
                # (batch rides inside the flat row dim): shard explicitly.
                n_dev = mesh.devices.size
                if cfg.batch_size % n_dev:
                    raise ValueError(
                        f"compute_mode='flat' data-parallel training needs "
                        f"batch_size ({cfg.batch_size}) divisible by the "
                        f"mesh size ({n_dev})")
                self._step = jax.jit(make_sharded(self.tx, mesh),
                                     donate_argnums=(0, 1))
            else:
                self._step = jax.jit(
                    make(self.tx),
                    in_shardings=(repl, repl, data, data, None),
                    out_shardings=(repl, repl, repl),
                    donate_argnums=(0, 1),
                )
            self._data_sharding = data
        else:
            self._step = jax.jit(make(self.tx), donate_argnums=(0, 1))
            self._data_sharding = None

        model = OSVOS(model_config)
        self._eval_loss = jax.jit(
            lambda p, x, y: class_balanced_cross_entropy_loss(
                model.apply({"params": p}, x)[-1], y, size_average=False))

    def train_step(self, images: np.ndarray, gts: np.ndarray,
                   side_weight: float):
        images = jnp.asarray(images)
        gts = jnp.asarray(gts)
        if self._data_sharding is not None:
            images = jax.device_put(images, self._data_sharding)
            gts = jax.device_put(gts, self._data_sharding)
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, images, gts,
            jnp.float32(side_weight))
        return metrics

    def val_loss(self, images: np.ndarray, gts: np.ndarray) -> float:
        return float(self._eval_loss(self.params, jnp.asarray(images),
                                     jnp.asarray(gts)))


def make_train_pipeline(db_root: str, data_config: DataConfig,
                        cfg: ParentConfig,
                        input_res: Tuple[int, int] = (480, 854),
                        seed: int = 0,
                        prefetch: int = 4) -> Tuple[DAVIS2016, "callable"]:
    """Dataset + a threaded epoch-batch iterator factory.

    A fixed ``input_res`` keeps shapes static so the step compiles once
    (DAVIS 480p is natively 480x854 except two 1080p-sourced sequences the
    resize normalizes)."""
    import random as _random

    host_rng = _random.Random(seed)
    transform = Compose([
        RandomHorizontalFlip(data_config.hflip_prob, rng=host_rng),
        ScaleNRotate(data_config.rots, data_config.scales, rng=host_rng),
        Resize(input_res),
        ToArray(),
    ])
    dataset = DAVIS2016(train=True, db_root_dir=db_root, transform=transform,
                        data_config=data_config)
    np_rng = np.random.RandomState(seed)

    def epoch_batches() -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def producer():
            try:
                for batch in iterate_batches(dataset, cfg.batch_size,
                                             shuffle=True, rng=np_rng):
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    return dataset, epoch_batches
