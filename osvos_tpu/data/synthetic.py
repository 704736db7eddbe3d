"""Synthetic DAVIS-2016-shaped data for tests and offline benchmarking.

The real DAVIS dataset is not available in this environment (no network
egress), so tests and the bench harness can generate a miniature dataset
with the exact on-disk layout the loader expects: JPEGImages/480p/<seq>/
NNNNN.jpg, Annotations/480p/<seq>/NNNNN.png, train_seqs.txt / val_seqs.txt.

Sequences are moving ellipses over textured backgrounds — enough signal
that a few hundred fine-tune steps measurably improve IoU, which the
integration tests assert.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import cv2
import numpy as np

DEFAULT_TRAIN_SEQS = ["synth-train-a", "synth-train-b"]
DEFAULT_VAL_SEQS = ["synth-val-a", "synth-val-b"]


def _frame(h: int, w: int, t: float, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg = (96 + 48 * np.sin(xx / (9 + seed % 5) + t)
          + 32 * np.cos(yy / (7 + seed % 3)))
    img = np.stack([bg, np.roll(bg, 3, 0), np.roll(bg, 5, 1)], -1)
    img += rng.randn(h, w, 3) * 4
    # moving, slowly deforming ellipse
    cy = h * (0.4 + 0.18 * np.sin(t + seed))
    cx = w * (0.4 + 0.22 * np.cos(0.8 * t + seed))
    ry = h * (0.16 + 0.03 * np.sin(2 * t))
    rx = w * (0.12 + 0.03 * np.cos(1.5 * t))
    mask = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
    obj = np.stack([200 + 25 * np.sin(yy / 5 + 3 * t),
                    60 + 20 * np.cos(xx / 6),
                    140 + 30 * np.sin((xx + yy) / 8)], -1)
    img = np.where(mask[..., None], obj, img)
    return np.clip(img, 0, 255).astype(np.uint8), mask.astype(np.uint8) * 255


def generate(root: str, height: int = 96, width: int = 160,
             n_frames: int = 8,
             train_seqs: List[str] | None = None,
             val_seqs: List[str] | None = None) -> str:
    """Write a synthetic DAVIS-2016 tree under ``root`` and return it."""
    train_seqs = train_seqs if train_seqs is not None else DEFAULT_TRAIN_SEQS
    val_seqs = val_seqs if val_seqs is not None else DEFAULT_VAL_SEQS
    for split, seqs in (("train_seqs.txt", train_seqs),
                        ("val_seqs.txt", val_seqs)):
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, split), "w") as f:
            f.write("\n".join(seqs) + "\n")
    for si, seq in enumerate(train_seqs + val_seqs):
        img_dir = os.path.join(root, "JPEGImages", "480p", seq)
        ann_dir = os.path.join(root, "Annotations", "480p", seq)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for fi in range(n_frames):
            img, mask = _frame(height, width, t=fi * 0.35, seed=si * 11 + 2)
            cv2.imwrite(os.path.join(img_dir, f"{fi:05d}.jpg"), img)
            cv2.imwrite(os.path.join(ann_dir, f"{fi:05d}.png"), mask)
    return root
