"""Fused class-balanced BCE reduction as a Pallas TPU kernel.

The XLA path (ops/loss.py) materializes several full-resolution f32
temporaries between the logit map and the scalar loss (labels threshold,
two softplus maps, two masked products) — at 480p that is ~410k pixels of
pure HBM traffic per map per step, five maps per parent step. This kernel
streams the logit/label tiles through VMEM once and produces the four
sufficient statistics (num_pos, num_neg, sum_pos_ce, sum_neg_ce) in a
single pass; the backward pass is a second single-pass elementwise kernel
reusing the class weights. Semantics are identical to
``class_balanced_cross_entropy_loss`` (reference layers/osvos_layers.py:~10)
and are tested against it and the torch oracle.

TPU notes (pallas_guide.md): tiles are (TILE_ROWS, 128) f32 in VMEM; the
grid walks row-chunks sequentially on the core, accumulating into a VMEM
(1, 4) accumulator that is copied to the output on the last step; scalar
statistics ride back to the caller as a (1, 4) array. Padding uses
logits=-1e30 / labels=0 (zero CE contribution) and subtracts the static pad
count from the negative-class census outside the kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_ROWS = 512          # (512, 128) f32 tile = 256 KiB in VMEM
_PAD_LOGIT = -1e30        # softplus(x)=0, softplus(-x) huge but masked by z=0


def _stats_kernel(x_ref, z_ref, out_ref, acc_ref):
    """Accumulate (num_pos, num_neg, sum_pos_ce, sum_neg_ce) over the grid.

    acc_ref is SMEM scratch — scalar accumulation across the sequential TPU
    grid (pallas_guide.md 'Reductions')."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for j in range(4):
            acc_ref[j] = 0.0

    x = x_ref[:]
    z = (z_ref[:] >= 0.5).astype(jnp.float32)
    # -log sigmoid(x) = softplus(-x); -log sigmoid(-x) = softplus(x)
    ce_pos = jax.nn.softplus(-x)
    ce_neg = jax.nn.softplus(x)
    acc_ref[0] += jnp.sum(z)
    acc_ref[1] += jnp.sum(1.0 - z)
    acc_ref[2] += jnp.sum(z * ce_pos)
    acc_ref[3] += jnp.sum((1.0 - z) * ce_neg)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = jnp.stack([acc_ref[0], acc_ref[1], acc_ref[2],
                                acc_ref[3]]).reshape(1, 4)


def _grad_kernel(x_ref, z_ref, w_ref, dx_ref):
    """dx = scale * (w_pos * z * (-sigmoid(-x)) + w_neg * (1-z) * sigmoid(x)).

    w_ref is a (1, 4) SMEM block: (w_pos, w_neg, scale, unused)."""
    x = x_ref[:]
    z = (z_ref[:] >= 0.5).astype(jnp.float32)
    w_pos = w_ref[0, 0]
    w_neg = w_ref[0, 1]
    scale = w_ref[0, 2]
    sig = jax.nn.sigmoid(x)
    dx_ref[:] = scale * (w_pos * z * (sig - 1.0) + w_neg * (1.0 - z) * sig)


def _pad_flat(arr: jnp.ndarray, rows: int) -> jnp.ndarray:
    flat = arr.reshape(-1)
    total = rows * _LANES
    return jnp.pad(flat, (0, total - flat.size)).reshape(rows, _LANES)


def _padded_rows(n: int) -> int:
    rows = -(-n // _LANES)
    return -(-rows // _TILE_ROWS) * _TILE_ROWS


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cbbce_stats(logits: jnp.ndarray, labels: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    n = logits.size
    rows = _padded_rows(n)
    flat_x = logits.astype(jnp.float32).reshape(-1)
    pad = rows * _LANES - n
    x = jnp.pad(flat_x, (0, pad), constant_values=_PAD_LOGIT).reshape(
        rows, _LANES)
    z = _pad_flat(labels.astype(jnp.float32), rows)
    grid = rows // _TILE_ROWS
    stats = pl.pallas_call(
        _stats_kernel,
        name="cbbce_stats",
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(x, z)
    # Padding lanes counted as negatives with zero CE; correct the census.
    return stats - jnp.asarray([0.0, float(pad), 0.0, 0.0], jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cbbce_grad(logits: jnp.ndarray, labels: jnp.ndarray,
                weights: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n = logits.size
    rows = _padded_rows(n)
    x = _pad_flat(logits.astype(jnp.float32), rows)
    z = _pad_flat(labels.astype(jnp.float32), rows)
    grid = rows // _TILE_ROWS
    dx = pl.pallas_call(
        _grad_kernel,
        name="cbbce_grad",
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, z, weights)
    return dx.reshape(-1)[:n].reshape(logits.shape)


def _pad_flat_batched(arr: jnp.ndarray, rows: int) -> jnp.ndarray:
    b = arr.shape[0]
    flat = arr.reshape(b, -1)
    total = rows * _LANES
    return jnp.pad(flat, ((0, 0), (0, total - flat.shape[1]))).reshape(
        b, rows, _LANES)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cbbce_stats_per_sample(logits: jnp.ndarray, labels: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, 4) per-sample sufficient statistics — grid (B, tiles), the SMEM
    accumulator resets at each sample's first tile and flushes to that
    sample's output row on its last."""
    b = logits.shape[0]
    n = logits.size // b
    rows = _padded_rows(n)
    pad = rows * _LANES - n
    flat_x = logits.astype(jnp.float32).reshape(b, -1)
    x = jnp.pad(flat_x, ((0, 0), (0, pad)),
                constant_values=_PAD_LOGIT).reshape(b, rows, _LANES)
    z = _pad_flat_batched(labels.astype(jnp.float32), rows)
    tiles = rows // _TILE_ROWS

    def kernel(x_ref, z_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for j in range(4):
                acc_ref[j] = 0.0

        xv = x_ref[0]
        zv = (z_ref[0] >= 0.5).astype(jnp.float32)
        acc_ref[0] += jnp.sum(zv)
        acc_ref[1] += jnp.sum(1.0 - zv)
        acc_ref[2] += jnp.sum(zv * jax.nn.softplus(-xv))
        acc_ref[3] += jnp.sum((1.0 - zv) * jax.nn.softplus(xv))

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            out_ref[pl.ds(i, 1), :] = jnp.stack(
                [acc_ref[0], acc_ref[1], acc_ref[2],
                 acc_ref[3]]).reshape(1, 4)

    # out block == whole (b, 4) array: hardware Mosaic only allows
    # sub-(8, 128) blocks when they cover the full array (the per-row
    # (1, 4) spec lowered in interpret mode but not on the chip)
    stats = pl.pallas_call(
        kernel,
        name="cbbce_stats_ps",
        out_shape=jax.ShapeDtypeStruct((b, 4), jnp.float32),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 4), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(x, z)
    return stats - jnp.asarray([0.0, float(pad), 0.0, 0.0], jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cbbce_grad_per_sample(logits: jnp.ndarray, labels: jnp.ndarray,
                           weights: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Per-sample elementwise backward; weights: (B, 4) rows of
    (w_pos, w_neg, scale, unused)."""
    b = logits.shape[0]
    n = logits.size // b
    rows = _padded_rows(n)
    x = _pad_flat_batched(logits.astype(jnp.float32), rows)
    z = _pad_flat_batched(labels.astype(jnp.float32), rows)
    tiles = rows // _TILE_ROWS

    def kernel(x_ref, z_ref, w_ref, dx_ref):
        i = pl.program_id(0)
        xv = x_ref[0]
        zv = (z_ref[0] >= 0.5).astype(jnp.float32)
        w_pos, w_neg, scale = w_ref[i, 0], w_ref[i, 1], w_ref[i, 2]
        sig = jax.nn.sigmoid(xv)
        dx_ref[0] = scale * (w_pos * zv * (sig - 1.0)
                             + w_neg * (1.0 - zv) * sig)

    dx = pl.pallas_call(
        kernel,
        name="cbbce_grad_ps",
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.float32),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_ROWS, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM block: hardware Mosaic rejects sub-(8,128)
            # blocks that don't cover the array
            pl.BlockSpec((b, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_ROWS, _LANES),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, z, weights)
    return dx.reshape(b, -1)[:, :n].reshape(logits.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def class_balanced_cross_entropy_loss_per_sample_pallas(
    output: jnp.ndarray,
    label: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused drop-in for ops.loss.class_balanced_cross_entropy_loss_per_sample
    — (B,) per-sample class-balanced BCE in one HBM pass each direction."""
    loss, _ = _fwd_ps(output, label, interpret)
    return loss


def _fwd_ps(output, label, interpret):
    stats = _cbbce_stats_per_sample(output, label, interpret=interpret)
    num_pos, num_neg = stats[:, 0], stats[:, 1]
    total = num_pos + num_neg
    loss = (num_neg / total) * stats[:, 2] + (num_pos / total) * stats[:, 3]
    return loss, (output, label, num_pos, num_neg)


def _bwd_ps(interpret, residuals, g):
    output, label, num_pos, num_neg = residuals
    total = num_pos + num_neg
    weights = jnp.stack(
        [num_neg / total, num_pos / total, g.astype(jnp.float32),
         jnp.zeros_like(total)], axis=1)
    dx = _cbbce_grad_per_sample(output, label, weights, interpret=interpret)
    return dx.astype(output.dtype), jnp.zeros_like(label)


class_balanced_cross_entropy_loss_per_sample_pallas.defvjp(_fwd_ps, _bwd_ps)


def _norm(label_shape, label_size: int, size_average: bool,
          batch_average: bool) -> float:
    if size_average:
        return float(label_size)
    if batch_average:
        return float(label_shape[0])
    return 1.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def class_balanced_cross_entropy_loss_pallas(
    output: jnp.ndarray,
    label: jnp.ndarray,
    size_average: bool = False,
    batch_average: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused equivalent of ops.loss.class_balanced_cross_entropy_loss.

    ``interpret=True`` runs the kernels in the Pallas interpreter (CPU test
    path); on TPU leave it False.
    """
    loss, _ = _fwd(output, label, size_average, batch_average, interpret)
    return loss


def _fwd(output, label, size_average, batch_average, interpret):
    stats = _cbbce_stats(output, label, interpret=interpret)
    num_pos, num_neg, sum_pos, sum_neg = (stats[0, 0], stats[0, 1],
                                          stats[0, 2], stats[0, 3])
    total = num_pos + num_neg
    loss = (num_neg / total) * sum_pos + (num_pos / total) * sum_neg
    loss = loss / _norm(label.shape, label.size, size_average, batch_average)
    return loss, (output, label, num_pos, num_neg)


def _bwd(size_average, batch_average, interpret, residuals, g):
    output, label, num_pos, num_neg = residuals
    total = num_pos + num_neg
    scale = g / _norm(label.shape, label.size, size_average, batch_average)
    weights = jnp.stack([num_neg / total, num_pos / total, scale,
                         jnp.float32(0.0)]).reshape(1, 4)
    dx = _cbbce_grad(output, label, weights, interpret=interpret)
    return dx.astype(output.dtype), jnp.zeros_like(label)


class_balanced_cross_entropy_loss_pallas.defvjp(_fwd, _bwd)
