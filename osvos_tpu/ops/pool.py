"""Ceil-mode max pooling.

The reference backbone pools with ``MaxPool2d(2, stride=2, ceil_mode=True)``
(networks/vgg_osvos.py:~120). JAX/XLA reduce_window is floor-mode, so odd
extents (854 -> 427 -> 214 -> 107 -> 54 on DAVIS 480p) would lose the last
row/column and shift every downstream side output by a pixel. We reproduce
ceil mode exactly with explicit right/bottom -inf padding: for k=2, s=2 a
trailing window exists iff the extent is odd, and it starts inside the input,
which matches torch's "window must start in the input" rule.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool_ceil(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """NHWC max pool with ceil-mode output sizing.

    Matches ``torch.nn.MaxPool2d(window, stride, ceil_mode=True)`` for the
    no-padding case used by the backbone (verified exactly in
    tests/test_ops.py against the torch oracle).
    """
    h, w = x.shape[1], x.shape[2]
    # Extra windows needed so that ceil((dim - window)/stride) + 1 fit, but a
    # window may not start inside the trailing padding (torch semantics).
    def pad_amount(dim: int) -> int:
        n_out = -(-max(dim - window, 0) // stride) + 1
        # last window start index:
        last_start = (n_out - 1) * stride
        if last_start >= dim:  # would start in padding: drop it (torch rule)
            n_out -= 1
            last_start = (n_out - 1) * stride
        return max(last_start + window - dim, 0)

    # NB: the init value must be a Python/numpy literal, not a traced array —
    # a traced init breaks reverse-mode linearization of reduce_window inside
    # lax.scan ("Linearization failed to produce known values"), which is
    # exactly where the online fine-tune loop differentiates this op.
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_amount(h)), (0, pad_amount(w)), (0, 0)),
    )
