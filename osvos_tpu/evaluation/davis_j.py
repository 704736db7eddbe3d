"""In-repo DAVIS-2016 evaluation (J region similarity, F boundary measure).

The reference computes no metrics itself — it defers to the external DAVIS
toolkit (SURVEY.md §4.3). We implement the official protocol in-repo so the
full val benchmark is self-contained:

- J  = IoU(pred, gt) per frame; a sequence's J-mean averages frames
  1..N-2 (the annotated first frame and the last frame are excluded, per the
  official DAVIS-2016 benchmark code).
- F  = boundary F-measure: boundary pixels matched within a tolerance of
  0.8% of the image diagonal (dilation by a disk), F = 2PR/(P+R).

All host-side numpy/cv2 — evaluation is off the hot path.
"""

from __future__ import annotations

from typing import Dict, Sequence

import cv2
import numpy as np


def db_eval_iou(annotation: np.ndarray, segmentation: np.ndarray) -> float:
    """Jaccard index between binary masks; 1.0 when both are empty."""
    ann = np.asarray(annotation) > 0.5
    seg = np.asarray(segmentation) > 0.5
    union = float(np.count_nonzero(ann | seg))
    if union == 0.0:
        return 1.0
    return float(np.count_nonzero(ann & seg)) / union


def _mask_boundary(mask: np.ndarray) -> np.ndarray:
    """Binary boundary map: pixels of the mask with a non-mask 4-neighbour
    (including the image border)."""
    m = (np.asarray(mask) > 0.5).astype(np.uint8)
    padded = np.pad(m, 1, mode="constant")
    eroded = cv2.erode(padded, np.ones((3, 3), np.uint8))[1:-1, 1:-1]
    return (m & ~eroded).astype(bool)


def boundary_f_measure(annotation: np.ndarray, segmentation: np.ndarray,
                       bound_th: float = 0.008) -> float:
    """Official-protocol boundary F: precision/recall of boundary pixels
    matched within ``bound_th * image_diagonal`` pixels."""
    fg = _mask_boundary(segmentation)
    gt = _mask_boundary(annotation)
    h, w = fg.shape
    radius = max(1, int(np.ceil(bound_th * np.sqrt(h * h + w * w))))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                       (2 * radius + 1, 2 * radius + 1))
    fg_dil = cv2.dilate(fg.astype(np.uint8), kernel).astype(bool)
    gt_dil = cv2.dilate(gt.astype(np.uint8), kernel).astype(bool)

    n_fg = fg.sum()
    n_gt = gt.sum()
    if n_fg == 0 and n_gt == 0:
        return 1.0
    if n_fg == 0 or n_gt == 0:
        return 0.0
    precision = float((fg & gt_dil).sum()) / n_fg
    recall = float((gt & fg_dil).sum()) / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def evaluate_sequence(annotations: Sequence[np.ndarray],
                      segmentations: Sequence[np.ndarray],
                      exclude_first: bool = True,
                      exclude_last: bool = True,
                      compute_f: bool = True) -> Dict[str, float]:
    """Per-sequence J/F means over the evaluated frame range."""
    n = len(annotations)
    assert n == len(segmentations)
    start = 1 if (exclude_first and n > 2) else 0
    stop = n - 1 if (exclude_last and n > 2) else n
    js, fs = [], []
    for i in range(start, stop):
        js.append(db_eval_iou(annotations[i], segmentations[i]))
        if compute_f:
            fs.append(boundary_f_measure(annotations[i], segmentations[i]))
    out = {"J_mean": float(np.mean(js)) if js else float("nan")}
    if compute_f:
        out["F_mean"] = float(np.mean(fs)) if fs else float("nan")
    return out
