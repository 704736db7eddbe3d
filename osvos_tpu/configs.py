"""Typed configuration for every entry point.

Replaces the reference's hard-coded path class (``mypath.py:~8``) and the
module-level hyperparameter blocks at the top of its driver scripts
(``train_parent.py:~20-45``, ``train_online.py:~20-45``) with dataclasses that
carry defaults equal to the reference values and can be overridden from the
CLI (see ``scripts/``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

# Caffe-era BGR channel means used by the reference dataset loader
# (dataloaders/davis_2016.py:~95). Images are loaded as BGR and these means
# subtracted; no std scaling.
MEANVAL_BGR: Tuple[float, float, float] = (104.00699, 116.66877, 122.67892)


@dataclasses.dataclass
class PathConfig:
    """Filesystem layout. Reference: ``mypath.py`` (static hard-coded paths)."""

    db_root_dir: str = os.environ.get("OSVOS_DB_ROOT", "/root/data/DAVIS")
    save_root_dir: str = os.environ.get("OSVOS_SAVE_ROOT", "/root/repo/runs")
    models_dir: str = os.environ.get("OSVOS_MODELS_DIR", "/root/repo/runs/models")

    def results_dir(self) -> str:
        return os.path.join(self.save_root_dir, "Results")


@dataclasses.dataclass
class ModelConfig:
    """OSVOS network (networks/vgg_osvos.py:~15)."""

    # Per-stage conv widths; pooling (ceil mode, k=2 s=2) precedes stages 2-5.
    stages: Tuple[Tuple[int, ...], ...] = ((64, 64), (128, 128), (256, 256, 256),
                                           (512, 512, 512), (512, 512, 512))
    side_channels: int = 16
    # 'parity'  -> float32 + HIGHEST conv precision (matches torch bit-closely)
    # 'fast'    -> bfloat16 compute, float32 params (TPU MXU path)
    # 'flat'    -> training hot path: the whole trunk (fwd+bwd) runs in the
    #              flat-layout Pallas kernels (ops/pallas/flatconv.py) —
    #              no relayouts, elementwise fused into the conv kernels;
    #              heads/loss as 'fast'
    # 'int8'    -> inference-only: trunk convs on the int8 MXU path
    #              (per-channel weight + per-tensor activation
    #              quantization); everything else as 'fast'
    compute_mode: str = "parity"
    # fast mode: trunk convs use the relayout-free custom backward
    # (ops/fastconv.py) — XLA's default conv wgrad materializes activation
    # relayout copies (~45 ms/step at 480p batch 5).
    fast_conv_vjp: bool = True
    # Static per-trunk-conv activation scales for int8 mode, in
    # stage_conv_names order (from models.quantize.calibrate_int8_scales).
    # None -> dynamic per-batch max|x| quantization (exact but pays a full
    # activation reduction per conv: ~476 vs ~664 f/s at 480p batch 32).
    int8_scales: Optional[Tuple[float, ...]] = None
    # Keep the frozen bilinear upsampling as a fixed function (TPU-native;
    # the reference stores them as ConvTranspose2d params trained at lr=0,
    # train_parent.py:~75 — numerically identical since they never change).
    trainable_upsample: bool = False
    # flat mode: implementation of the four side_prep convs. The flat
    # kernels price a conv at row-streams x taps x lane TILES, so the
    # 16-channel side outputs pay a full 128-lane tile for 12.5% utility
    # (~7.5 ms/step fwd+bwd). Variants, all measured on chip (v5e, 480p
    # batch 5):
    # 'stacked' (default): Pallas forward + Pallas tap-stacked backward
    #   (flat_side_conv3x3 / _side_bwd_kernel): all nine taps stack into
    #   two 128-lane operands built in-kernel with lane-rolls, so
    #   dgrad+wgrad run 2+2 row-streams instead of 9+9. 49.5 vs 51.4
    #   ms/step. (A pure-XLA formulation of the same identity was slower
    #   than 'pallas' — the stack must be built in-kernel.)
    # 'pallas': both directions on the plain flat kernels.
    # 'xla': XLA convs over the NHWC view — XLA's conv backward
    #   reintroduces relayout churn: 59.9 vs 57.9 ms/step (pre-prefetch
    #   baseline).
    flat_side: str = "stacked"  # 'stacked' | 'pallas' | 'xla'


@dataclasses.dataclass
class DataConfig:
    """DAVIS-2016 loading (dataloaders/davis_2016.py)."""

    year: str = "2016"
    resolution: str = "480p"
    input_res: Optional[Tuple[int, int]] = None  # (H, W) resize; None = native
    meanval: Tuple[float, float, float] = MEANVAL_BGR
    # Augmentation knobs (train_parent.py:~95 transform composition).
    rots: Tuple[float, float] = (-30.0, 30.0)
    scales: Tuple[float, float] = (0.75, 1.25)
    hflip_prob: float = 0.5


@dataclasses.dataclass
class ParentConfig:
    """Parent-network training (train_parent.py:~20-45)."""

    n_epochs: int = 240
    batch_size: int = 1
    n_ave_grad: int = 10          # accumulate gradients over N steps
    snapshot_every: int = 40      # epochs between checkpoints
    lr: float = 1e-8
    weight_decay: float = 0.0002
    momentum: float = 0.9
    use_test: bool = True
    test_interval: int = 5        # val-loss probe cadence (epochs)
    resume_epoch: int = 0
    seed: int = 0
    # TPU additions (no reference equivalent — single GPU there):
    data_parallel: int = 1        # devices for batch-parallel training
    log_every_steps: int = 50
    # 'xla' | 'pallas' — fused single-pass CB-BCE kernel (ops/pallas/cbbce)
    loss_impl: str = "xla"


@dataclasses.dataclass
class OnlineConfig:
    """One-shot online fine-tuning (train_online.py:~20-45)."""

    seq_name: str = "blackswan"
    n_ave_grad: int = 5
    # 2000 effective optimizer steps == 10000 single-sample passes in the
    # reference (train_online.py: nEpochs = 2000 * nAveGrad).
    n_steps: int = 2000
    lr: float = 1e-8
    weight_decay: float = 0.0002
    momentum: float = 0.9
    seed: int = 0
    # Device-side augmentation (TPU-native replacement for the host cv2
    # pipeline; same distribution: flip p=.5, rot U(-30,30), scale U(.75,1.25)).
    rots: Tuple[float, float] = (-30.0, 30.0)
    scales: Tuple[float, float] = (0.75, 1.25)
    hflip_prob: float = 0.5
    save_results: bool = True
    vis_res: bool = False
    # 'xla' | 'pallas' — fused single-pass CB-BCE kernel (ops/pallas/cbbce)
    loss_impl: str = "xla"
    # Optimizer steps per device dispatch: long scans are split into chunks
    # so a single execution stays under remote-execution deadlines; the
    # (params, opt_state) carry is donated between chunks.
    scan_chunk: int = 250


@dataclasses.dataclass
class BenchConfig:
    """Benchmark harness knobs (bench.py)."""

    batch_size: int = 8
    height: int = 480
    width: int = 854
    warmup_iters: int = 3
    bench_iters: int = 10
