"""Fixed bilinear upsampling as transposed convolution.

The reference upsamples side outputs with ``ConvTranspose2d(C, C, k=2^(i+1),
stride=2^i, bias=False)`` whose weights are set once to a bilinear
interpolation kernel on the channel diagonal and frozen at lr=0 forever
(layers/osvos_layers.py:~75 ``upsample_filt`` + ~90 ``interp_surgery``;
train_parent.py:~75 lr=0 groups). TPU-native stance: since the weights are
constant, we bake the kernel in as a literal and express the op as a
*depthwise* input-dilated convolution — identical numerics (verified vs the
torch oracle in tests/test_ops.py), a fraction of the FLOPs of the dense
transposed conv (C^2 k^2 -> C k^2), and no wasted dW computation in the
backward pass.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


def bilinear_filter(size: int) -> np.ndarray:
    """The (size, size) bilinear interpolation kernel.

    Same construction as the reference's ``upsample_filt``
    (layers/osvos_layers.py:~75): a separable tent centered at
    ``factor - 1`` (odd size) or ``factor - 0.5`` (even size).
    """
    factor = (size + 1) // 2
    center = factor - 1.0 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    return filt.astype(np.float32)


def interp_surgery_weights(channels: int, size: int) -> np.ndarray:
    """The reference's ``interp_surgery`` weight tensor
    (layers/osvos_layers.py:~90): an OIHW (C, C, k, k) ConvTranspose2d
    weight that is the bilinear kernel on the channel diagonal and zero
    elsewhere. Exposed for API parity and checkpoint verification — the
    TPU model folds these frozen weights into the upsample op itself."""
    filt = bilinear_filter(size)
    w = np.zeros((channels, channels, size, size), np.float32)
    for c in range(channels):
        w[c, c] = filt
    return w


@functools.lru_cache(maxsize=None)
def _depthwise_kernel(size: int, channels: int) -> np.ndarray:
    """HWIO depthwise kernel (size, size, 1, C); the filter is symmetric so
    the conv-transpose spatial flip is a no-op, but we flip anyway to keep the
    general conv_transpose == dilated-conv-of-flipped-kernel identity."""
    filt = bilinear_filter(size)[::-1, ::-1]
    return np.broadcast_to(filt[:, :, None, None], (size, size, 1, channels)).copy()


def bilinear_upsample(x: jnp.ndarray, factor: int,
                      precision=lax.Precision.HIGHEST,
                      method: str = "conv") -> jnp.ndarray:
    """Upsample NHWC ``x`` by ``factor`` exactly as the reference's frozen
    ``ConvTranspose2d(C, C, 2*factor, stride=factor)`` with diagonal bilinear
    weights. Output spatial size: (dim - 1) * factor + 2 * factor.

    method='conv': input-dilated depthwise conv (bit-matches the torch
    oracle; VPU-bound on TPU since there is no channel contraction).
    method='matmul': the same linear map as two dense contractions with
    per-axis interpolation matrices (the 2-D bilinear kernel is an outer
    product of 1-D tents, so the transposed conv separates). This runs on
    the MXU and, for the large factors (8, 16), does ~16x fewer multiplies
    than the dilated conv because it never touches the zeros of the dilated
    input. Numerically identical up to f32 reassociation (tested).
    """
    if factor == 1:
        return x
    if method == "matmul":
        return _bilinear_upsample_matmul(x, factor, precision)
    k = 2 * factor
    c = x.shape[-1]
    kernel = jnp.asarray(_depthwise_kernel(k, c), dtype=x.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
    )


def _bilinear_filter_1d(size: int) -> np.ndarray:
    factor = (size + 1) // 2
    center = factor - 1.0 if size % 2 == 1 else factor - 0.5
    og = np.arange(size, dtype=np.float64)
    return (1 - np.abs(og - center) / factor).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, factor: int) -> np.ndarray:
    """(n_out, n_in) dense matrix of the 1-D transposed bilinear conv:
    out[p] = sum_i k1d[p - factor*i + (k-1)] * x[i] restricted to valid
    kernel support, n_out = (n_in - 1) * factor + 2 * factor."""
    k = 2 * factor
    n_out = (n_in - 1) * factor + k
    k1d = _bilinear_filter_1d(k)
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_in):
        lo = i * factor  # output offset of tap 0 for source i
        m[lo:lo + k, i] += k1d
    return m


def _bilinear_upsample_matmul(x: jnp.ndarray, factor: int,
                              precision) -> jnp.ndarray:
    n, h, w, c = x.shape
    uh = jnp.asarray(_interp_matrix(h, factor), dtype=x.dtype)
    uw = jnp.asarray(_interp_matrix(w, factor), dtype=x.dtype)
    # (N,H,W,C) -> (N,Ho,W,C) -> (N,Ho,Wo,C); both contractions on the MXU.
    y = jnp.einsum("ph,nhwc->npwc", uh, x, precision=precision)
    return jnp.einsum("qw,npwc->npqc", uw, y, precision=precision)
