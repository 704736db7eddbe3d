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


def grouped_sgd_oracle(net: "TorchOSVOS", base_lr: float, momentum: float,
                       weight_decay: float) -> torch.optim.SGD:
    """The reference's ~10-group SGD (train_parent.py:~60-90), restated:
    trunk/side weights at (lr, wd), all biases at (2lr, 0), score_dsn at
    (lr/10, wd)/(2lr/10, 0), fuse at (lr/100, wd)/(2lr/100, 0)."""
    def wb(mods):
        ws = [m.weight for m in mods if isinstance(m, nn.Conv2d)]
        bs = [m.bias for m in mods if isinstance(m, nn.Conv2d)]
        return ws, bs

    stage_w, stage_b = wb([m for s in net.stages for m in s])
    side_w, side_b = wb(net.side_prep)
    dsn_w, dsn_b = wb(net.score_dsn)
    groups = [
        dict(params=stage_w, lr=base_lr, weight_decay=weight_decay),
        dict(params=stage_b, lr=2 * base_lr, weight_decay=0),
        dict(params=side_w, lr=base_lr, weight_decay=weight_decay),
        dict(params=side_b, lr=2 * base_lr, weight_decay=0),
        dict(params=dsn_w, lr=base_lr / 10, weight_decay=weight_decay),
        dict(params=dsn_b, lr=2 * base_lr / 10, weight_decay=0),
        dict(params=[net.fuse.weight], lr=base_lr / 100,
             weight_decay=weight_decay),
        dict(params=[net.fuse.bias], lr=2 * base_lr / 100, weight_decay=0),
    ]
    return torch.optim.SGD(groups, lr=base_lr, momentum=momentum)


def online_finetune_oracle(net: "TorchOSVOS", pool_imgs: np.ndarray,
                           pool_masks: np.ndarray, draws, base_lr: float,
                           momentum: float, weight_decay: float,
                           n_ave_grad: int):
    """The reference online loop (train_online.py:~80-130): for each micro
    pass, draw an augmented (img, gt) pair, accumulate grads of
    ``cb_bce(out[-1], gt) / nAveGrad``, step grouped SGD every nAveGrad
    passes. ``draws`` is a flat list of (pool_idx, flip) pairs — the exact
    augmentation stream the JAX chunk consumed — with pool_imgs NHWC f32.
    Returns per-optimizer-step losses (post-division running sums)."""
    opt = grouped_sgd_oracle(net, base_lr, momentum, weight_decay)
    losses, run = [], 0.0
    opt.zero_grad()
    for micro, (idx, flip) in enumerate(draws):
        img = pool_imgs[idx]
        gt = pool_masks[idx]
        if flip:
            img, gt = img[:, ::-1, :], gt[:, ::-1, :]
        x = torch.from_numpy(
            np.ascontiguousarray(np.transpose(img, (2, 0, 1)))[None])
        y = torch.from_numpy(
            np.ascontiguousarray(np.transpose(gt, (2, 0, 1)))[None])
        out = net(x)[-1]
        labels = (y >= 0.5).float()
        num_pos = labels.sum()
        num_neg = (1 - labels).sum()
        x_gt0 = (out >= 0).float()
        ll = out * (labels - x_gt0) - torch.log1p(
            torch.exp(out - 2 * out * x_gt0))
        loss_pos = (-labels * ll).sum()
        loss_neg = (-(1 - labels) * ll).sum()
        tot = num_pos + num_neg
        loss = (num_neg / tot * loss_pos + num_pos / tot * loss_neg) \
            / n_ave_grad
        loss.backward()
        run += float(loss.detach())
        if (micro + 1) % n_ave_grad == 0:
            opt.step()
            opt.zero_grad()
            losses.append(run)
            run = 0.0
    return losses


class TorchOSVOS(nn.Module):
    """Reference-architecture OSVOS in torch (networks/vgg_osvos.py:~15),
    restated for oracle purposes: VGG-16 stages with ceil-mode pooling,
    3x3 side_prep to 16ch, 1x1 score_dsn to 1ch, frozen bilinear transposed
    convs, center_crop, 1x1 fuse over concatenated 64ch."""

    STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
              (512, 512, 512))

    def __init__(self, stages=None, side_channels=16):
        super().__init__()
        self.STAGES = tuple(stages) if stages is not None else self.STAGES
        stages_m = []
        in_ch = 3
        for si, widths in enumerate(self.STAGES):
            layers = []
            if si > 0:
                layers.append(nn.MaxPool2d(2, stride=2, ceil_mode=True))
            for wdt in widths:
                layers += [nn.Conv2d(in_ch, wdt, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = wdt
            stages_m.append(nn.Sequential(*layers))
        self.stages = nn.ModuleList(stages_m)
        sc = side_channels
        self.side_prep = nn.ModuleList(
            [nn.Conv2d(w[-1], sc, 3, padding=1) for w in self.STAGES[1:]])
        self.score_dsn = nn.ModuleList([nn.Conv2d(sc, 1, 1) for _ in range(4)])
        self.upscale = nn.ModuleList([
            nn.ConvTranspose2d(sc, sc, 2 ** (i + 2), stride=2 ** (i + 1), bias=False)
            for i in range(4)])
        self.upscale_ = nn.ModuleList([
            nn.ConvTranspose2d(1, 1, 2 ** (i + 2), stride=2 ** (i + 1), bias=False)
            for i in range(4)])
        self.fuse = nn.Conv2d(4 * sc, 1, 1)
        with torch.no_grad():
            for mlist, ch in ((self.upscale, sc), (self.upscale_, 1)):
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
