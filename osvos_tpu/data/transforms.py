"""Host-side sample transforms (reference: dataloaders/custom_transforms.py).

Each transform maps a sample dict ``{'image': HWC float32, 'gt': HW(1) float32,
['fname': str]}`` to the same structure. These run on the host in the parent
training pipeline; the jit'd online loop uses the device-side equivalent in
``osvos_tpu.ops.warp`` instead (same distribution).
"""

from __future__ import annotations

import random
from typing import Callable, Dict, Sequence, Tuple

import cv2
import numpy as np

Sample = Dict[str, object]


class Compose:
    def __init__(self, transforms: Sequence[Callable[[Sample], Sample]]):
        self.transforms = list(transforms)

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        return sample


class RandomHorizontalFlip:
    """Flip image+gt together with probability p
    (custom_transforms.py:~55)."""

    def __init__(self, p: float = 0.5, rng: random.Random | None = None):
        self.p = p
        self.rng = rng or random

    def __call__(self, sample: Sample) -> Sample:
        if self.rng.random() < self.p:
            for k, v in sample.items():
                if k == "fname":
                    continue
                sample[k] = np.ascontiguousarray(np.asarray(v)[:, ::-1])
        return sample


class ScaleNRotate:
    """Random rotation (deg) + scale about the center
    (custom_transforms.py:~15): rot ~ U(rots), sc ~ U(scales);
    cv2.warpAffine with INTER_CUBIC for images, INTER_NEAREST for
    near-binary gts, zero border."""

    def __init__(self, rots: Tuple[float, float] = (-30, 30),
                 scales: Tuple[float, float] = (0.75, 1.25),
                 rng: random.Random | None = None):
        self.rots = rots
        self.scales = scales
        self.rng = rng or random

    def __call__(self, sample: Sample) -> Sample:
        rot = self.rots[0] + self.rng.random() * (self.rots[1] - self.rots[0])
        sc = self.scales[0] + self.rng.random() * (self.scales[1] - self.scales[0])
        for k, v in sample.items():
            if k == "fname":
                continue
            img = np.asarray(v)
            h, w = img.shape[:2]
            m = cv2.getRotationMatrix2D((w / 2, h / 2), rot, sc)
            # near-binary arrays (gts) keep hard edges
            flag = (cv2.INTER_NEAREST
                    if ((img == 0) | (img == 1)).all() else cv2.INTER_CUBIC)
            warped = cv2.warpAffine(img, m, (w, h), flags=flag)
            if warped.ndim < img.ndim:  # cv2 drops trailing singleton dims
                warped = warped[..., None]
            sample[k] = warped.astype(np.float32)
        return sample


class Resize:
    """Resize to a fixed (H, W) (custom_transforms.py:~70)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size  # (H, W)

    def __call__(self, sample: Sample) -> Sample:
        h, w = self.size
        for k, v in sample.items():
            if k == "fname":
                continue
            img = np.asarray(v)
            flag = (cv2.INTER_NEAREST
                    if ((img == 0) | (img == 1)).all() else cv2.INTER_CUBIC)
            resized = cv2.resize(img, (w, h), interpolation=flag)
            if resized.ndim < img.ndim:
                resized = resized[..., None]
            sample[k] = resized.astype(np.float32)
        return sample


class ToArray:
    """Finalize to NHWC-ready float32 arrays; gts gain a channel dim.
    (The reference's ``ToTensor`` transposes to CHW torch tensors,
    custom_transforms.py:~90 — we stay HWC, the TPU-native layout.)"""

    def __call__(self, sample: Sample) -> Sample:
        for k, v in sample.items():
            if k == "fname":
                continue
            arr = np.asarray(v, np.float32)
            if arr.ndim == 2:
                arr = arr[..., None]
            sample[k] = np.ascontiguousarray(arr)
        return sample
