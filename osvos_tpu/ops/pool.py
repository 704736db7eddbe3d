"""Ceil-mode max pooling.

The reference backbone pools with ``MaxPool2d(2, stride=2, ceil_mode=True)``
(networks/vgg_osvos.py:~120). JAX/XLA reduce_window is floor-mode, so odd
extents (854 -> 427 -> 214 -> 107 -> 54 on DAVIS 480p) would lose the last
row/column and shift every downstream side output by a pixel. We reproduce
ceil mode exactly with explicit right/bottom -inf padding: for k=2, s=2 a
trailing window exists iff the extent is odd, and it starts inside the input,
which matches torch's "window must start in the input" rule.

TPU note: the k=s=2 case (the only one the backbone uses) is written as an
elementwise max over the four non-overlapping window taps with a
hand-written VJP that routes the cotangent to the row-major-first argmax
tap. XLA's generic pool gradient lowers to SelectAndScatter, which is
extremely slow on TPU — it alone dominated the online fine-tune step
(~60 of 99 ms per step at 480p); the elementwise form is pure VPU work in
both directions. Other window/stride combinations fall back to
reduce_window (forward-only use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ceil_pad(dim: int, window: int, stride: int) -> int:
    """Trailing padding so every torch ceil-mode window fits; a window may
    not start inside the padding (torch rule)."""
    n_out = -(-max(dim - window, 0) // stride) + 1
    last_start = (n_out - 1) * stride
    if last_start >= dim:
        n_out -= 1
        last_start = (n_out - 1) * stride
    return max(last_start + window - dim, 0)


def _pad_hw(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                   constant_values=-jnp.inf)


def _pool_rw_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, _ceil_pad(x.shape[1], 2, 2)),
         (0, _ceil_pad(x.shape[2], 2, 2)), (0, 0)))


@jax.custom_vjp
def _max_pool_2x2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    return _pool_rw_2x2(x)


def _mp_fwd(x):
    y = _pool_rw_2x2(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    h, w = x.shape[1], x.shape[2]
    xp = _pad_hw(x, _ceil_pad(h, 2, 2), _ceil_pad(w, 2, 2))
    n, hp, wp, c = xp.shape
    r = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    a, b = r[:, :, 0, :, 0, :], r[:, :, 0, :, 1, :]
    cc, d = r[:, :, 1, :, 0, :], r[:, :, 1, :, 1, :]
    # Row-major-first argmax routing (torch CPU tie-break): a wins ties over
    # b over cc over d — a later tap receives the cotangent only when it
    # equals the max and no earlier tap does.
    wa = a == y
    wb = (b == y) & ~wa
    wc = (cc == y) & ~wa & ~wb
    wd = (d == y) & ~wa & ~wb & ~wc
    row0 = jnp.stack([jnp.where(wa, g, 0), jnp.where(wb, g, 0)], axis=3)
    row1 = jnp.stack([jnp.where(wc, g, 0), jnp.where(wd, g, 0)], axis=3)
    dx = jnp.stack([row0, row1], axis=2).reshape(n, hp, wp, c)
    return (dx[:, :h, :w, :],)


_max_pool_2x2_ceil.defvjp(_mp_fwd, _mp_bwd)


def max_pool_ceil(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC max pool with ceil-mode output sizing.

    Matches ``torch.nn.MaxPool2d(window, stride, ceil_mode=True)`` for the
    no-padding case used by the backbone (verified exactly in
    tests/test_ops.py against the torch oracle).
    """
    if window == 2 and stride == 2:
        return _max_pool_2x2_ceil(x)

    h, w = x.shape[1], x.shape[2]
    # NB: literal init value — a traced init breaks reverse-mode
    # linearization of reduce_window inside lax.scan.
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, _ceil_pad(h, window, stride)),
                 (0, _ceil_pad(w, window, stride)), (0, 0)),
    )
