"""Independent torch-CPU oracles for numerics tests.

These re-state the *mathematical* definitions from the reference
(layers/osvos_layers.py, networks/vgg_osvos.py) in torch so our JAX ops can
be validated against an implementation that shares no code with them. Used
only by tests.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def cb_bce_oracle(output: np.ndarray, label: np.ndarray,
                  size_average: bool = False,
                  batch_average: bool = True) -> float:
    """Class-balanced BCE, the reference's stable expression
    (layers/osvos_layers.py:~10)."""
    x = torch.from_numpy(np.asarray(output, np.float32))
    y = torch.from_numpy(np.asarray(label, np.float32))
    labels = (y >= 0.5).float()
    num_pos = labels.sum()
    num_neg = (1 - labels).sum()
    num_total = num_pos + num_neg
    x_gt0 = (x >= 0).float()
    # per-pixel log-likelihood (the stable expanded form)
    loss_val = x * (labels - x_gt0) - torch.log1p(torch.exp(x - 2 * x * x_gt0))
    loss_pos = (-labels * loss_val).sum()
    loss_neg = (-(1 - labels) * loss_val).sum()
    final = num_neg / num_total * loss_pos + num_pos / num_total * loss_neg
    if size_average:
        final = final / y.numel()
    elif batch_average:
        final = final / y.shape[0]
    return float(final)


def center_crop_oracle(x: np.ndarray, height: int, width: int) -> np.ndarray:
    """F.pad with negative ceil/floor padding (layers/osvos_layers.py:~60).
    x is NCHW."""
    t = torch.from_numpy(x)
    ch = (x.shape[2] - height) / (-2.0)
    cw = (x.shape[3] - width) / (-2.0)
    out = F.pad(t, [math.ceil(cw), math.floor(cw), math.ceil(ch), math.floor(ch)])
    return out.numpy()


def bilinear_filter_oracle(size: int) -> np.ndarray:
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    return ((1 - abs(og[0] - center) / factor)
            * (1 - abs(og[1] - center) / factor)).astype(np.float32)


def upsample_oracle(x_nchw: np.ndarray, factor: int) -> np.ndarray:
    """Frozen diagonal-bilinear ConvTranspose2d(C, C, 2f, stride=f)."""
    c = x_nchw.shape[1]
    k = 2 * factor
    m = nn.ConvTranspose2d(c, c, k, stride=factor, bias=False)
    w = np.zeros((c, c, k, k), np.float32)
    filt = bilinear_filter_oracle(k)
    for i in range(c):
        w[i, i] = filt
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(w))
        return m(torch.from_numpy(x_nchw)).numpy()


class TorchOSVOS(nn.Module):
    """Reference-architecture OSVOS in torch (networks/vgg_osvos.py:~15),
    restated for oracle purposes: VGG-16 stages with ceil-mode pooling,
    3x3 side_prep to 16ch, 1x1 score_dsn to 1ch, frozen bilinear transposed
    convs, center_crop, 1x1 fuse over concatenated 64ch."""

    STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
              (512, 512, 512))

    def __init__(self):
        super().__init__()
        stages = []
        in_ch = 3
        for si, widths in enumerate(self.STAGES):
            layers = []
            if si > 0:
                layers.append(nn.MaxPool2d(2, stride=2, ceil_mode=True))
            for wdt in widths:
                layers += [nn.Conv2d(in_ch, wdt, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = wdt
            stages.append(nn.Sequential(*layers))
        self.stages = nn.ModuleList(stages)
        self.side_prep = nn.ModuleList(
            [nn.Conv2d(w[-1], 16, 3, padding=1) for w in self.STAGES[1:]])
        self.score_dsn = nn.ModuleList([nn.Conv2d(16, 1, 1) for _ in range(4)])
        self.upscale = nn.ModuleList([
            nn.ConvTranspose2d(16, 16, 2 ** (i + 2), stride=2 ** (i + 1), bias=False)
            for i in range(4)])
        self.upscale_ = nn.ModuleList([
            nn.ConvTranspose2d(1, 1, 2 ** (i + 2), stride=2 ** (i + 1), bias=False)
            for i in range(4)])
        self.fuse = nn.Conv2d(64, 1, 1)
        with torch.no_grad():
            for mlist, ch in ((self.upscale, 16), (self.upscale_, 1)):
                for i, m in enumerate(mlist):
                    k = 2 ** (i + 2)
                    w = np.zeros((ch, ch, k, k), np.float32)
                    filt = bilinear_filter_oracle(k)
                    for c in range(ch):
                        w[c, c] = filt
                    m.weight.copy_(torch.from_numpy(w))

    @staticmethod
    def _crop(x, h, w):
        ch = (x.shape[2] - h) / (-2.0)
        cw = (x.shape[3] - w) / (-2.0)
        return F.pad(x, [math.ceil(cw), math.floor(cw), math.ceil(ch), math.floor(ch)])

    def forward(self, x):
        h, w = x.shape[2], x.shape[3]
        x = self.stages[0](x)
        side, side_out = [], []
        for i in range(1, 5):
            x = self.stages[i](x)
            side_temp = self.side_prep[i - 1](x)
            side.append(self._crop(self.upscale[i - 1](side_temp), h, w))
            side_out.append(self._crop(
                self.upscale_[i - 1](self.score_dsn[i - 1](side_temp)), h, w))
        out = self.fuse(torch.cat(side, dim=1))
        return side_out + [out]
