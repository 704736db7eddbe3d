"""Device-side geometric augmentation (ScaleNRotate + horizontal flip).

The reference augments on the host with OpenCV (dataloaders/
custom_transforms.py:~15 ``ScaleNRotate``: rot ~ U(rots), sc ~ U(scales),
``cv2.getRotationMatrix2D`` about the image center, ``warpAffine`` with
INTER_CUBIC for images / INTER_NEAREST for masks, zero border). That design
puts cv2 on the critical path of every optimizer step; on TPU we instead run
the same transform *on device*, inside the jit'd train step, so the one-shot
fine-tune loop (2000 steps) and the vmapped multi-sequence adaptation never
touch the host.

The warp here reproduces cv2's mapping exactly (inverse-affine resampling
about the center with the same rotation matrix) and its interpolation up to
the cubic kernel choice: we use the Catmull-Rom-family cubic with a = -0.75,
which is what OpenCV's INTER_CUBIC uses. Borders are zero-filled like
``borderValue=0``. Bit-equality with cv2 is not required (it only shifts the
augmentation distribution), but tests check close agreement on smooth data.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rotation_scale_matrix(angle_deg: jnp.ndarray, scale: jnp.ndarray,
                          center: Tuple[float, float]) -> jnp.ndarray:
    """cv2.getRotationMatrix2D-compatible 2x3 affine (maps src -> dst)."""
    a = jnp.deg2rad(angle_deg)
    alpha = scale * jnp.cos(a)
    beta = scale * jnp.sin(a)
    cx, cy = center
    return jnp.array(
        [[alpha, beta, (1 - alpha) * cx - beta * cy],
         [-beta, alpha, beta * cx + (1 - alpha) * cy]], dtype=jnp.float32)


def _invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine matrix."""
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.array([[ia, ib, -(ia * tx + ib * ty)],
                      [ic, id_, -(ic * tx + id_ * ty)]], dtype=jnp.float32)


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """BiCubic convolution weights for the 4 taps at offsets (-1, 0, 1, 2)
    relative to the floor sample, fractional position t in [0, 1).
    Returns shape t.shape + (4,)."""
    # distances of the 4 taps from the sample point
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    d2, d3 = d * d, d * d * d
    near = (a + 2.0) * d3 - (a + 3.0) * d2 + 1.0          # |d| <= 1
    far = a * d3 - 5.0 * a * d2 + 8.0 * a * d - 4.0 * a   # 1 < |d| < 2
    return jnp.where(d <= 1.0, near, far)


def _gather_hw(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Gather img[y, x, :] with zero padding outside. img HWC; ys/xs (H, W)."""
    h, w = img.shape[0], img.shape[1]
    inside = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    vals = img[yc, xc]  # (H, W, C)
    return jnp.where(inside[..., None], vals, 0.0)


def warp_affine(img: jnp.ndarray, matrix: jnp.ndarray,
                interp: str = "cubic") -> jnp.ndarray:
    """Apply a 2x3 forward affine (cv2 convention) to HWC ``img``.

    ``interp``: 'cubic' (INTER_CUBIC, a=-0.75), 'linear', or 'nearest'.
    Zero border. Output has the same shape as the input (cv2 dsize=(w, h)).
    """
    h, w = img.shape[0], img.shape[1]
    inv = _invert_affine(matrix)
    dst_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    dst_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    src_x = inv[0, 0] * dst_x + inv[0, 1] * dst_y + inv[0, 2]
    src_y = inv[1, 0] * dst_x + inv[1, 1] * dst_y + inv[1, 2]

    if interp == "nearest":
        # cv2 INTER_NEAREST truncation-compatible rounding of non-negative
        # coords; use round-half-up which matches for the grid we produce.
        ys = jnp.floor(src_y + 0.5).astype(jnp.int32)
        xs = jnp.floor(src_x + 0.5).astype(jnp.int32)
        return _gather_hw(img, ys, xs)

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    ty = src_y - y0
    tx = src_x - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    if interp == "linear":
        wy = jnp.stack([1.0 - ty, ty], axis=-1)
        wx = jnp.stack([1.0 - tx, tx], axis=-1)
        offs = (0, 1)
    elif interp == "cubic":
        wy = _cubic_weights(ty)
        wx = _cubic_weights(tx)
        offs = (-1, 0, 1, 2)
    else:
        raise ValueError(f"unknown interp {interp!r}")

    out = jnp.zeros(img.shape, dtype=jnp.float32)
    for iy, oy in enumerate(offs):
        for ix, ox in enumerate(offs):
            tap = _gather_hw(img, y0 + oy, x0 + ox).astype(jnp.float32)
            out = out + tap * (wy[..., iy] * wx[..., ix])[..., None]
    return out.astype(img.dtype)


def scale_n_rotate(key: jax.Array, image: jnp.ndarray, mask: jnp.ndarray,
                   rots=(-30.0, 30.0), scales=(0.75, 1.25),
                   hflip_prob: float = 0.5):
    """One random augmentation draw, same distribution as the reference's
    ``Compose([RandomHorizontalFlip(), ScaleNRotate(rots, scales)])``.

    image: (H, W, C) float; mask: (H, W, 1) float in {0, 1}.
    Returns (image', mask').
    """
    kf, kr, ks = jax.random.split(key, 3)
    do_flip = jax.random.uniform(kf) < hflip_prob
    image = jnp.where(do_flip, image[:, ::-1, :], image)
    mask = jnp.where(do_flip, mask[:, ::-1, :], mask)

    # Reference draws: rot = rots[0] + U(0,1) * (rots[1]-rots[0]) etc.
    rot = jax.random.uniform(kr, minval=rots[0], maxval=rots[1])
    sc = jax.random.uniform(ks, minval=scales[0], maxval=scales[1])
    h, w = image.shape[0], image.shape[1]
    m = rotation_scale_matrix(rot, sc, (w / 2.0, h / 2.0))
    image = warp_affine(image, m, interp="cubic")
    mask = warp_affine(mask, m, interp="nearest")
    return image, mask
