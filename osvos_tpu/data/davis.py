"""DAVIS-2016 dataset index + loader (reference: dataloaders/davis_2016.py).

Semantics match the reference ``DAVIS2016`` Dataset:

- ``train=True`` without ``seq_name``: every (frame, annotation) pair of the
  train split. With ``seq_name``: *only the first annotated frame* of that
  sequence — the one-shot fine-tuning set (davis_2016.py:~55-70).
- ``train=False`` with ``seq_name``: all frames of the sequence; only frame 0
  has a real annotation, the rest get all-zero gts (davis_2016.py:~55).
- Images load as **BGR float32 minus the caffe mean** (davis_2016.py:~95),
  gts as {0,1} float32 via division by max (davis_2016.py:~100).
- Split files: ``<db_root>/train_seqs.txt`` / ``val_seqs.txt`` as in the
  reference (davis_2016.py:~35), with a fallback to the official
  ``ImageSets/<year>/{train,val}.txt`` layout.

This is a plain indexable dataset; batching/prefetch is handled by the
callers (the parent pipeline streams via a background thread, the online
path loads its single frame once and keeps it device-resident).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from osvos_tpu.configs import DataConfig, PathConfig


def _read_split(db_root: str, train: bool, year: str) -> List[str]:
    fname = "train_seqs.txt" if train else "val_seqs.txt"
    ref_style = os.path.join(db_root, fname)
    if os.path.exists(ref_style):
        with open(ref_style) as f:
            return [ln.strip() for ln in f if ln.strip()]
    official = os.path.join(db_root, "ImageSets", year,
                            "train.txt" if train else "val.txt")
    if os.path.exists(official):
        with open(official) as f:
            # official 2016 files may list per-frame paths; collapse to seqs
            seqs = []
            for ln in f:
                ln = ln.strip()
                if not ln:
                    continue
                name = ln.split("/")[-2] if "/" in ln else ln
                if name not in seqs:
                    seqs.append(name)
            return seqs
    # Packaged copies of the standard DAVIS-2016 splits (the reference
    # expects train_seqs.txt/val_seqs.txt at the DAVIS root,
    # davis_2016.py:~35; we additionally ship them so a bare image tree
    # works). Only used when year == 2016.
    if year == "2016":
        packaged = os.path.join(os.path.dirname(__file__), "splits", fname)
        if os.path.exists(packaged):
            with open(packaged) as f:
                return [ln.strip() for ln in f if ln.strip()]
    raise FileNotFoundError(
        f"no split file at {ref_style} or {official}")


class DAVIS2016:
    """Indexable DAVIS-2016 dataset with reference-equivalent semantics."""

    def __init__(
        self,
        train: bool = True,
        db_root_dir: Optional[str] = None,
        transform=None,
        seq_name: Optional[str] = None,
        input_res: Optional[Tuple[int, int]] = None,
        data_config: DataConfig = DataConfig(),
    ):
        self.train = train
        self.db_root_dir = db_root_dir or PathConfig().db_root_dir
        self.transform = transform
        self.seq_name = seq_name
        self.input_res = input_res or data_config.input_res
        self.meanval = np.asarray(data_config.meanval, np.float32)
        self.resolution = data_config.resolution

        img_dir = os.path.join(self.db_root_dir, "JPEGImages", self.resolution)
        ann_dir = os.path.join(self.db_root_dir, "Annotations", self.resolution)

        img_list: List[str] = []
        labels: List[Optional[str]] = []
        if seq_name is None:
            seqs = _read_split(self.db_root_dir, train, data_config.year)
            for seq in seqs:
                frames = sorted(os.listdir(os.path.join(img_dir, seq)))
                img_list += [os.path.join("JPEGImages", self.resolution, seq, f)
                             for f in frames]
                anns = sorted(os.listdir(os.path.join(ann_dir, seq)))
                labels += [os.path.join("Annotations", self.resolution, seq, f)
                           for f in anns]
                assert len(img_list) == len(labels), seq
        else:
            frames = sorted(os.listdir(os.path.join(img_dir, seq_name)))
            anns = sorted(os.listdir(os.path.join(ann_dir, seq_name)))
            if train:
                # one-shot set: first annotated frame only
                img_list = [os.path.join("JPEGImages", self.resolution,
                                         seq_name, frames[0])]
                labels = [os.path.join("Annotations", self.resolution,
                                       seq_name, anns[0])]
            else:
                img_list = [os.path.join("JPEGImages", self.resolution,
                                         seq_name, f) for f in frames]
                labels = [os.path.join("Annotations", self.resolution,
                                       seq_name, anns[0])]
                labels += [None] * (len(frames) - 1)

        self.img_list = img_list
        self.labels = labels
        self.seqs_in_split = (None if seq_name else
                              _read_split(self.db_root_dir, train,
                                          data_config.year))

    def __len__(self) -> int:
        return len(self.img_list)

    def make_img_gt_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Load (image, gt) as float32 arrays (davis_2016.py:~95):
        image = BGR - meanval, HWC; gt = {0,1} HW (zeros if unannotated)."""
        img = cv2.imread(os.path.join(self.db_root_dir, self.img_list[idx]))
        assert img is not None, self.img_list[idx]
        if self.labels[idx] is not None:
            label = cv2.imread(
                os.path.join(self.db_root_dir, self.labels[idx]), 0)
            assert label is not None, self.labels[idx]
        else:
            label = None

        if self.input_res is not None:
            h, w = self.input_res
            img = cv2.resize(img, (w, h))
            if label is not None:
                label = cv2.resize(label, (w, h),
                                   interpolation=cv2.INTER_NEAREST)

        img = np.asarray(img, np.float32) - self.meanval
        if label is None:
            gt = np.zeros(img.shape[:2], np.float32)
        else:
            gt = np.asarray(label, np.float32)
            gt = gt / max(float(gt.max()), 1e-8)
        return img, gt

    def __getitem__(self, idx: int) -> Dict[str, object]:
        img, gt = self.make_img_gt_pair(idx)
        sample: Dict[str, object] = {"image": img, "gt": gt}
        if self.seq_name is not None:
            fname = os.path.join(self.seq_name,
                                 os.path.basename(self.img_list[idx]))
            sample["fname"] = os.path.splitext(fname)[0]
        if self.transform is not None:
            sample = self.transform(sample)
        return sample

    def get_img_size(self) -> Tuple[int, int]:
        img = cv2.imread(os.path.join(self.db_root_dir, self.img_list[0]))
        return img.shape[:2]

    def sequence_frames(self, seq_name: str) -> List[str]:
        img_dir = os.path.join(self.db_root_dir, "JPEGImages",
                               self.resolution, seq_name)
        return sorted(os.listdir(img_dir))


def iterate_batches(dataset: DAVIS2016, batch_size: int, shuffle: bool,
                    rng: np.random.RandomState):
    """Minimal host-side batcher stacking same-shape samples."""
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        idxs = order[start:start + batch_size]
        samples = [dataset[int(i)] for i in idxs]
        yield {
            "image": np.stack([s["image"] for s in samples]),
            "gt": np.stack([s["gt"] for s in samples]),
        }
