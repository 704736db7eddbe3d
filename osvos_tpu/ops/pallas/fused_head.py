"""Fused upsample + fuse + sigmoid -> uint8 tail as a Pallas TPU kernel.

After the fused-head algebra (models/vgg_osvos.py mode='infer'), what
remains per frame is: four low-resolution single-channel contribution maps
c_i (each already collapsed through its slice of the fuse 1x1), bilinear
upsampling of each to full resolution, a center crop, a sum, the fuse bias,
a sigmoid, and the 255*round->uint8 quantization (train_online.py:~135's
host-side sigmoid+scale moved on device). XLA materializes each upsampled
f32 map in HBM (~26 MB per frame per scale at 480p); this kernel computes
everything for one frame inside VMEM and writes only the final uint8 map
(0.4 MB) — ~60x less HBM write traffic for the tail.

Math: the 2-D transposed bilinear kernel is an outer product of 1-D tents,
so upsample+crop is ``crop_rows(U_h) @ c_i @ crop_cols(U_w)^T`` with dense
interpolation matrices (ops/upsample.py `_interp_matrix`), here pre-cropped
so the kernel needs no separate crop step. Two MXU dots per scale per
frame. Grid = (batch,); per-step VMEM: out (H*W*4) + the largest tmp
(H*w_i*4) + matrices (~3 MB at 480p) — comfortably under the ~16 MB/core
budget for 480p (pallas_guide.md 'Memory Hierarchy').
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from osvos_tpu.ops.upsample import _interp_matrix


@functools.lru_cache(maxsize=None)
def _cropped_interp(n_in: int, factor: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix with the reference center_crop
    folded in: rows [top : top + n_out] of the full transposed-conv matrix
    (ops/crop.py convention: top = (full - n_out) // 2)."""
    full = _interp_matrix(n_in, factor)  # ((n_in-1)*f + 2f, n_in)
    top = (full.shape[0] - n_out) // 2
    assert 0 <= top <= full.shape[0] - n_out, (full.shape, n_out)
    return np.ascontiguousarray(full[top:top + n_out])


def _tail_kernel(n_scales):
    def kernel(*refs):
        # refs: [c_0..c_{n-1}, uh_0..uh_{n-1}, uwt_0..uwt_{n-1}, bias, out]
        cs = refs[:n_scales]
        uhs = refs[n_scales:2 * n_scales]
        uwts = refs[2 * n_scales:3 * n_scales]
        bias_ref = refs[3 * n_scales]
        out_ref = refs[3 * n_scales + 1]

        acc = None
        for c_ref, uh_ref, uwt_ref in zip(cs, uhs, uwts):
            # (H, h_i) @ (h_i, w_i) -> (H, w_i), then @ (w_i, W) -> (H, W)
            tmp = jnp.dot(uh_ref[:], c_ref[0],
                          preferred_element_type=jnp.float32)
            term = jnp.dot(tmp, uwt_ref[:],
                           preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        logits = acc + bias_ref[0, 0]
        probs = jax.nn.sigmoid(logits)
        # Mosaic has no direct f32->u8 cast; round to i32 first (values are
        # in [0, 255], so the u8 truncation is exact).
        quant = jnp.round(255.0 * probs).astype(jnp.int32)
        out_ref[0] = quant.astype(jnp.uint8)

    return kernel


def fused_upsample_sigmoid_u8(
    contribs: Sequence[jnp.ndarray],   # per scale: (B, h_i, w_i) float32
    bias: jnp.ndarray,                 # scalar (fuse bias)
    out_hw: Tuple[int, int],
    factors: Sequence[int],
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W) uint8 = round(255*sigmoid(sum_i upsample_crop(c_i) + bias)).

    Drop-in twin of the XLA tail in models/vgg_osvos.py mode='infer' +
    evaluation/infer.py's sigmoid/quantize (tested against it). Forward
    only — inference path; training differentiates the XLA twin.
    """
    h, w = out_hw
    b = contribs[0].shape[0]
    n = len(contribs)
    assert n == len(factors)

    uhs = [jnp.asarray(_cropped_interp(c.shape[1], f, h))
           for c, f in zip(contribs, factors)]
    uwts = [jnp.asarray(_cropped_interp(c.shape[2], f, w).T)
            for c, f in zip(contribs, factors)]
    bias_arr = jnp.reshape(bias.astype(jnp.float32), (1, 1))

    in_specs = (
        [pl.BlockSpec((1, c.shape[1], c.shape[2]), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM) for c in contribs]
        + [pl.BlockSpec(u.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for u in uhs]
        + [pl.BlockSpec(u.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for u in uwts]
        + [pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    return pl.pallas_call(
        name="fused_head_tail",
        kernel=_tail_kernel(n),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*[c.astype(jnp.float32) for c in contribs], *uhs, *uwts, bias_arr)
