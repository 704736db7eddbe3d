#!/usr/bin/env python
"""One-shot online fine-tuning + sequence inference (mirrors the reference's
``python train_online.py``; seq_name is a flag instead of an edited
variable).

Example:
    python scripts/train_online.py --db_root /data/DAVIS \
        --parent runs/models/parent_epoch-239.ckpt --seq_name blackswan
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_annotations(ann_dir: str):
    """Ground-truth masks in {0,1}, filtered to image files — a stray
    non-image in the directory (imread -> None) must not kill the eval."""
    import cv2

    anns = []
    for f in sorted(os.listdir(ann_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        a = cv2.imread(os.path.join(ann_dir, f), 0)
        if a is None:
            continue
        anns.append(a / max(a.max(), 1e-8))
    return anns


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--db_root", default=None)
    ap.add_argument("--save_root", default=None)
    ap.add_argument("--parent", required=True,
                    help="parent checkpoint (.ckpt from train_parent, or "
                         ".pth/.npz reference state_dict)")
    ap.add_argument("--seq_name", default="blackswan")
    ap.add_argument("--all_val", action="store_true",
                    help="run every val-split sequence")
    ap.add_argument("--batched", action="store_true",
                    help="with --all_val: vmap all sequences' fine-tunes "
                         "concurrently, sharded over the device mesh "
                         "(parallel/batched_online.py)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_ave_grad", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-8)
    ap.add_argument("--weight_decay", type=float, default=0.0002)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--compute_mode", default="flat",
                    choices=["fast", "parity", "flat"],
                    help="fine-tune compute mode; 'flat' runs the whole "
                         "trunk fwd+bwd in the flat-layout Pallas kernels "
                         "(fastest measured — see BASELINE.md round table)")
    ap.add_argument("--infer_mode", default=None,
                    choices=["fast", "parity", "int8"],
                    help="compute mode for the post-fine-tune inference "
                         "pass; 'int8' calibrates static activation scales "
                         "on the sequence's first frame and runs the trunk "
                         "on the int8 MXU path (default: same as "
                         "--compute_mode)")
    ap.add_argument("--aug_mode", default="pool",
                    choices=["pool", "per_step"])
    ap.add_argument("--loss_impl", default="xla", choices=["xla", "pallas"],
                    help="CB-BCE implementation for the fine-tune loss")
    ap.add_argument("--no_save", action="store_true")
    ap.add_argument("--vis_res", action="store_true",
                    help="save mask-over-frame overlay PNGs under "
                         "<save_root>/Overlays/<seq> (the reference's "
                         "matplotlib vis_res flag, train_online.py:~180)")
    ap.add_argument("--log_dir", default=None,
                    help="per-step fine-tune loss scalars (JSONL + "
                         "TensorBoard) — reference writes tensorboardX "
                         "scalars in its online loop (train_online.py:~100). "
                         "Default: <save_root>/logs/<seq>")
    ap.add_argument("--tiny", action="store_true",
                    help="reduced-width model (smoke tests / CPU dev "
                         "shells; checkpoints are not interchangeable "
                         "with the full model)")
    ap.add_argument("--eval", action="store_true",
                    help="compute in-repo DAVIS J/F for the sequence(s)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler device trace here "
                         "(perfetto/XProf-compatible)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from osvos_tpu.parallel.mesh import initialize_multihost

    initialize_multihost()  # no-op unless OSVOS_MULTIHOST=1 (multi-host job)

    from osvos_tpu.configs import (DataConfig, ModelConfig, OnlineConfig,
                                   PathConfig)
    from osvos_tpu.data.davis import DAVIS2016
    from osvos_tpu.evaluation.davis_j import evaluate_sequence
    from osvos_tpu.evaluation.infer import (infer_sequence, make_infer_fn,
                                            save_sequence_results)
    from osvos_tpu.models import load_torch_state_dict
    from osvos_tpu.train.online import run_online
    from osvos_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from osvos_tpu.utils.torch_port import load_pth_as_numpy

    paths = PathConfig()
    db_root = args.db_root or paths.db_root_dir
    save_root = args.save_root or paths.save_root_dir
    results_dir = os.path.join(save_root, "Results")

    if args.tiny:
        model_config = ModelConfig(
            stages=((8, 8), (12, 12), (16, 16, 16), (16, 16, 16),
                    (16, 16, 16)),
            side_channels=8, compute_mode=args.compute_mode)
    else:
        model_config = ModelConfig(compute_mode=args.compute_mode)
    cfg = OnlineConfig(seq_name=args.seq_name, n_steps=args.steps,
                       n_ave_grad=args.n_ave_grad, lr=args.lr,
                       weight_decay=args.weight_decay,
                       momentum=args.momentum, seed=args.seed,
                       loss_impl=args.loss_impl,
                       save_results=not args.no_save, vis_res=args.vis_res)

    if args.parent.endswith((".pth", ".pt", ".npz")):
        params = load_torch_state_dict(load_pth_as_numpy(args.parent))
    else:
        params, _, _ = load_checkpoint(args.parent)

    data_cfg = DataConfig()

    # inference defaults to 'fast' when fine-tuning ran 'flat': the flat
    # kernels optimize the backward; the fused/int8 heads are the fast
    # inference paths
    infer_mode = args.infer_mode or (
        "fast" if args.compute_mode == "flat" else args.compute_mode)

    def make_infer_config(adapted_params, first_frame):
        """Model config for the post-fine-tune inference pass. int8:
        post-training quantization with static activation scales calibrated
        on the sequence's own (fine-tuned-on) first frame."""
        import dataclasses as _dc

        if infer_mode == model_config.compute_mode:
            return model_config
        icfg = _dc.replace(model_config, compute_mode=infer_mode)
        if infer_mode == "int8":
            from osvos_tpu.models.quantize import calibrate_int8_scales

            scales = calibrate_int8_scales(
                adapted_params, jnp.asarray(first_frame)[None], icfg)
            icfg = _dc.replace(icfg, int8_scales=scales)
        return icfg

    def run_one(seq_name: str, parent_params):
        ocfg = OnlineConfig(**{**cfg.__dict__, "seq_name": seq_name})
        train_ds = DAVIS2016(train=True, db_root_dir=db_root,
                             seq_name=seq_name, data_config=data_cfg)
        img, gt = train_ds.make_img_gt_pair(0)
        from osvos_tpu.utils.profiling import annotate, device_trace

        t0 = time.perf_counter()
        with device_trace(args.profile_dir), annotate(f"fine_tune/{seq_name}"):
            result = run_online(parent_params, img, gt[..., None],
                                model_config, ocfg, aug_mode=args.aug_mode)
            jax.block_until_ready(result.params)
        ft_time = time.perf_counter() - t0

        from osvos_tpu.utils.logging import ScalarLogger

        log_dir = args.log_dir or os.path.join(save_root, "logs", seq_name)
        logger = ScalarLogger(log_dir)
        for step, loss in enumerate(np.asarray(result.losses)):
            logger.add_scalar("total_loss_epoch", float(loss), step)
        logger.close()

        test_ds = DAVIS2016(train=False, db_root_dir=db_root,
                            seq_name=seq_name, data_config=data_cfg)
        frames = [test_ds.make_img_gt_pair(i)[0] for i in range(len(test_ds))]
        icfg = make_infer_config(result.params, frames[0])
        t0 = time.perf_counter()
        masks = infer_sequence(result.params, frames, icfg)
        infer_time = time.perf_counter() - t0
        print(f"[{seq_name}] fine-tune {ft_time:.1f}s "
              f"({ocfg.n_steps} steps), inference [{infer_mode}] "
              f"{len(frames) / max(infer_time, 1e-9):.1f} f/s, "
              f"final loss {float(result.losses[-1]):.4f}", flush=True)

        if ocfg.vis_res:
            import cv2

            from osvos_tpu.data.helpers import overlay_mask

            mean = np.asarray(data_cfg.meanval, np.float32)
            for fi, (frame, mask) in enumerate(zip(frames, masks)):
                bgr = np.clip(frame + mean, 0, 255).astype(np.uint8)
                ov = overlay_mask(bgr, mask >= 128)
                stem = os.path.splitext(
                    os.path.basename(test_ds.img_list[fi]))[0]
                path = os.path.join(save_root, "Overlays", seq_name,
                                    f"{stem}.png")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                cv2.imwrite(path, ov)

        if ocfg.save_results:
            fnames = [test_ds.img_list[i] for i in range(len(test_ds))]
            save_sequence_results(masks, fnames, results_dir, seq_name)
            save_checkpoint(os.path.join(save_root, "models",
                                         f"{seq_name}_online.ckpt"),
                            result.params, step=ocfg.n_steps)
        if args.eval:
            ann_dir = os.path.join(db_root, "Annotations",
                                   data_cfg.resolution, seq_name)
            anns = _load_annotations(ann_dir)
            if len(anns) == len(masks):
                m = evaluate_sequence(anns, [mk >= 128 for mk in masks])
                print(f"[{seq_name}] J={m['J_mean']:.4f} "
                      f"F={m['F_mean']:.4f}", flush=True)
                return m
            print(f"[{seq_name}] WARNING: skipping J/F — {len(anns)} "
                  f"annotations in {ann_dir} vs {len(masks)} predicted "
                  f"masks (mismatched directory?)", flush=True)
        return None

    def run_batched(seqs):
        """All sequences adapt concurrently on the mesh (BASELINE config 5)."""
        import cv2

        from osvos_tpu.evaluation.infer import save_mask_png
        from osvos_tpu.parallel.batched_online import (batched_fine_tune,
                                                       batched_infer)
        from osvos_tpu.parallel.mesh import make_mesh

        h = w = None  # uniform static shape across the val split (native
        # resolution of the first sequence; DAVIS 480p is 480x854)
        first_imgs, first_masks, frame_lists, name_lists = [], [], [], []
        for seq in seqs:
            ds = DAVIS2016(train=True, db_root_dir=db_root, seq_name=seq,
                           data_config=data_cfg)
            img, gt = ds.make_img_gt_pair(0)
            if h is None:
                h, w = img.shape[:2]
            if img.shape[:2] != (h, w):
                img = cv2.resize(img, (w, h))
                gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_NEAREST)
            first_imgs.append(img)
            first_masks.append(gt[..., None])
            test_ds = DAVIS2016(train=False, db_root_dir=db_root,
                                seq_name=seq, data_config=data_cfg)
            frames = [test_ds.make_img_gt_pair(i)[0]
                      for i in range(len(test_ds))]
            frames = [f if f.shape[:2] == (h, w) else cv2.resize(f, (w, h))
                      for f in frames]
            frame_lists.append(frames)
            name_lists.append([test_ds.img_list[i]
                               for i in range(len(test_ds))])

        mesh = make_mesh("seq") if len(jax.devices()) > 1 else None
        t0 = time.perf_counter()
        adapted, losses = batched_fine_tune(
            params, jnp.asarray(np.stack(first_imgs)),
            jnp.asarray(np.stack(first_masks)), model_config, cfg,
            mesh=mesh, aug_mode=args.aug_mode)
        jax.block_until_ready(losses)
        ft = time.perf_counter() - t0
        print(f"[batched] {len(seqs)} sequences fine-tuned in {ft:.1f}s "
              f"({ft / len(seqs):.1f}s/seq amortized)", flush=True)

        icfg = model_config
        if infer_mode != model_config.compute_mode:
            import dataclasses as _dc

            icfg = _dc.replace(model_config, compute_mode=infer_mode,
                               int8_scales=None)
        act_scales = None
        if infer_mode == "int8":
            # Static per-sequence calibration (each sequence's first frame
            # against its own adapted trunk), fed through batched_infer as
            # a traced operand — one compile, static-scale throughput.
            from osvos_tpu.models.quantize import calibrate_int8_scales_batched

            act_scales = calibrate_int8_scales_batched(
                adapted, jnp.asarray(np.stack(first_imgs)), icfg)
        # ragged per-sequence lists: batched_infer pads and chunks the
        # frame axis under its per-device HBM budget instead of this
        # script materializing the full (S, t_max, H, W, 3) f32 stack
        # (~98 GB host / ~12 GB/device at the real 20-sequence protocol)
        masks = np.asarray(batched_infer(adapted, frame_lists, icfg,
                                         mesh=mesh, act_scales=act_scales))
        if not args.no_save:
            for si, seq in enumerate(seqs):
                for ti, fname in enumerate(name_lists[si]):
                    stem = os.path.splitext(os.path.basename(fname))[0]
                    save_mask_png(masks[si, ti],
                                  os.path.join(results_dir, seq,
                                               f"{stem}.png"))
        if args.eval:
            from osvos_tpu.evaluation.davis_j import evaluate_sequence

            js, fs = [], []
            for si, seq in enumerate(seqs):
                ann_dir = os.path.join(db_root, "Annotations",
                                       data_cfg.resolution, seq)
                anns = _load_annotations(ann_dir)
                n = len(name_lists[si])
                if len(anns) < n:
                    # mirror the serial path's warn-and-skip: one sequence
                    # with a mismatched annotation directory must not kill
                    # the whole 20-sequence eval
                    print(f"[{seq}] WARNING: skipping J/F — {len(anns)} "
                          f"annotations in {ann_dir} vs {n} predicted "
                          f"masks (mismatched directory?)", flush=True)
                    continue
                m = evaluate_sequence(anns[:n],
                                      [masks[si, t] >= 128 for t in range(n)])
                print(f"[{seq}] J={m['J_mean']:.4f} F={m['F_mean']:.4f}",
                      flush=True)
                js.append(m["J_mean"])
                fs.append(m["F_mean"])
            if js:
                print(f"[ALL] J-mean={np.mean(js):.4f} "
                      f"F-mean={np.mean(fs):.4f}", flush=True)

    if args.all_val:
        from osvos_tpu.data.davis import _read_split

        seqs = _read_split(db_root, train=False, year=data_cfg.year)
        if args.batched:
            run_batched(seqs)
        else:
            metrics = []
            for seq in seqs:
                m = run_one(seq, params)
                if m:
                    metrics.append(m)
            if metrics:
                print(f"[ALL] "
                      f"J-mean={np.mean([m['J_mean'] for m in metrics]):.4f} "
                      f"F-mean={np.mean([m['F_mean'] for m in metrics]):.4f}",
                      flush=True)
    else:
        run_one(args.seq_name, params)


if __name__ == "__main__":
    main()
