#!/usr/bin/env python
"""Parent-network training entry point (mirrors the reference's
``python train_parent.py``, with CLI overrides instead of edit-in-place
hyperparameters).

Example:
    python scripts/train_parent.py --db_root /data/DAVIS --epochs 240 \
        --vgg_npz runs/models/vgg16_features.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--db_root", default=None)
    ap.add_argument("--save_root", default=None)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--n_ave_grad", type=int, default=10)
    ap.add_argument("--lr", type=float, default=1e-8)
    ap.add_argument("--weight_decay", type=float, default=0.0002)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--snapshot", type=int, default=40)
    ap.add_argument("--test_interval", type=int, default=5)
    ap.add_argument("--no_test", action="store_true")
    ap.add_argument("--resume", default=None, help="checkpoint to resume")
    ap.add_argument("--vgg_npz", default=None,
                    help="torchvision VGG-16 features as .npz/.pth "
                         "(utils/torch_port.py) for ImageNet init")
    ap.add_argument("--compute_mode", default="fast",
                    choices=["fast", "parity", "flat"],
                    help="'flat' runs the trunk fwd+bwd in the flat-layout "
                         "Pallas kernels (fastest backward; train-mode "
                         "gradient parity tested vs 'fast')")
    ap.add_argument("--loss_impl", default="xla", choices=["xla", "pallas"],
                    help="CB-BCE implementation for the training loss "
                         "(ParentConfig.loss_impl)")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="devices for batch-parallel training (0 = all)")
    ap.add_argument("--input_h", type=int, default=480)
    ap.add_argument("--input_w", type=int, default=854)
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-width model (smoke tests / CPU dev "
                         "shells; checkpoints are not interchangeable "
                         "with the full model)")
    ap.add_argument("--vis_net", action="store_true",
                    help="dump the traced forward graph to "
                         "<save_root>/net.dot (reference train_parent.py "
                         "vis_net flag / util/visualize.make_dot)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from osvos_tpu.parallel.mesh import initialize_multihost

    initialize_multihost()  # no-op unless OSVOS_MULTIHOST=1 (multi-host job)

    from osvos_tpu.configs import DataConfig, ModelConfig, ParentConfig, PathConfig
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.parallel.mesh import make_mesh
    from osvos_tpu.train.parent import ParentTrainer, make_train_pipeline
    from osvos_tpu.utils import torch_port
    from osvos_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from osvos_tpu.utils.logging import ScalarLogger, StepTimer

    paths = PathConfig()
    db_root = args.db_root or paths.db_root_dir
    save_root = args.save_root or paths.save_root_dir
    os.makedirs(save_root, exist_ok=True)

    cfg = ParentConfig(
        n_epochs=args.epochs, batch_size=args.batch_size,
        n_ave_grad=args.n_ave_grad, snapshot_every=args.snapshot,
        lr=args.lr, weight_decay=args.weight_decay, momentum=args.momentum,
        use_test=not args.no_test, test_interval=args.test_interval,
        loss_impl=args.loss_impl, seed=args.seed)
    if args.tiny:
        model_config = ModelConfig(
            stages=((8, 8), (12, 12), (16, 16, 16), (16, 16, 16),
                    (16, 16, 16)),
            side_channels=8, compute_mode=args.compute_mode)
    else:
        model_config = ModelConfig(compute_mode=args.compute_mode)

    trunk = (torch_port.load_pth_as_numpy(args.vgg_npz)
             if args.vgg_npz else None)
    params = init_osvos_params(jax.random.PRNGKey(args.seed), model_config,
                               trunk_weights=trunk)

    if args.vis_net:
        import jax.numpy as jnp

        from osvos_tpu.models import OSVOS
        from osvos_tpu.utils.visualize import make_dot, save_dot

        model = OSVOS(model_config)
        dot = make_dot(lambda p, v: model.apply({"params": p}, v),
                       params, jnp.zeros((1, 64, 112, 3), jnp.float32))
        print("net graph ->",
              save_dot(dot, os.path.join(save_root, "net.dot")), flush=True)

    n_dp = args.data_parallel or len(jax.devices())
    mesh = make_mesh("data", n_devices=n_dp) if n_dp > 1 else None
    trainer = ParentTrainer(params, model_config, cfg, mesh=mesh)

    start_epoch = 0
    if args.resume:
        p, o, start_epoch = load_checkpoint(args.resume, trainer.params,
                                            trainer.opt_state)
        trainer.params, trainer.opt_state = p, o

    data_cfg = DataConfig()
    _, epoch_batches = make_train_pipeline(
        db_root, data_cfg, cfg, input_res=(args.input_h, args.input_w),
        seed=args.seed)

    # Val-loss probe set (reference useTest branch, train_parent.py:~150:
    # loss only, no J metric).
    val_ds = None
    if cfg.use_test:
        from osvos_tpu.data.davis import DAVIS2016
        from osvos_tpu.data.transforms import Compose, Resize, ToArray

        val_ds = DAVIS2016(
            train=False, db_root_dir=db_root,
            transform=Compose([Resize((args.input_h, args.input_w)),
                               ToArray()]),
            data_config=data_cfg)

    logger = ScalarLogger(os.path.join(save_root, "logs_parent"))
    timer = StepTimer()
    step = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        side_w = 1.0 - epoch / cfg.n_epochs
        epoch_loss = []
        for batch in epoch_batches():
            metrics = trainer.train_step(batch["image"], batch["gt"], side_w)
            step += 1
            epoch_loss.append(float(metrics["total"]))
            if step % cfg.log_every_steps == 0:
                logger.add_scalar("total_loss_iter", epoch_loss[-1], step)
        logger.add_scalar("total_loss_epoch", float(np.mean(epoch_loss)),
                          epoch)
        print(f"[epoch {epoch}] loss={np.mean(epoch_loss):.4f} "
              f"elapsed={timer.elapsed():.1f}s", flush=True)
        if val_ds is not None and (epoch + 1) % cfg.test_interval == 0:
            val_losses = []
            stride = max(1, len(val_ds) // 64)  # probe subset, loss only
            for i in range(0, len(val_ds), stride):
                s = val_ds[i]
                val_losses.append(trainer.val_loss(s["image"][None],
                                                   s["gt"][None]))
            logger.add_scalar("val_loss_epoch", float(np.mean(val_losses)),
                              epoch)
            print(f"  val loss={np.mean(val_losses):.4f}", flush=True)
        if (epoch + 1) % cfg.snapshot_every == 0 or epoch == cfg.n_epochs - 1:
            ckpt = os.path.join(save_root, "models",
                                f"parent_epoch-{epoch}.ckpt")
            save_checkpoint(ckpt, trainer.params, trainer.opt_state, epoch)
            print(f"  snapshot -> {ckpt}", flush=True)
    logger.close()


if __name__ == "__main__":
    main()
