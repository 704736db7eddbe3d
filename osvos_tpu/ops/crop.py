"""Center crop with the reference's exact offset convention.

The reference implements cropping as ``F.pad`` with negative padding computed
from ``ceil``/``floor`` of (target - size)/2 (layers/osvos_layers.py:~60):
pad_left = ceil((target-size)/2), pad_right = floor((target-size)/2). For
size > target this crops ``floor((size-target)/2)`` from the leading edge —
we use that closed form directly on a static slice (shapes are static under
jit, so this lowers to a free lax.slice).
"""

from __future__ import annotations

import jax.numpy as jnp


def center_crop(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Crop NHWC ``x`` to (height, width), reference offset convention."""
    h, w = x.shape[1], x.shape[2]
    if h == height and w == width:
        return x
    assert h >= height and w >= width, (
        f"center_crop: input {(h, w)} smaller than target {(height, width)}")
    top = (h - height) // 2
    left = (w - width) // 2
    return x[:, top:top + height, left:left + width, :]
