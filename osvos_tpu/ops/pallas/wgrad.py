"""Pallas 3x3-conv weight-gradient kernel (single pass over activations).

XLA's conv wgrad relayouts the saved activations; the shift-einsum
formulation (ops/fastconv.py) avoids that but materializes nine shifted
copies of the padded input. This kernel reads each activation row range
ONCE into VMEM (manual DMA with a halo) and accumulates all nine
``dk[kh, kw] += x_shift^T @ g`` contractions from the same resident block
— activation HBM traffic drops ~9x (~4.5x for 64-channel layers, which pay
a 2x channel pad). Accumulation is float32 in the output block across the
sequential TPU grid (pallas_guide.md 'Reductions').

Mosaic constraints shaping the design:
- manual-DMA slices must be lane-aligned (last dim multiple of 128) and
  sublane-aligned (16 rows for bf16): channels are padded to a multiple of
  128 and the per-step DMA covers ``T + 16`` rows at 16-aligned offsets
  (the 2-row halo rides inside the over-read);
- in-kernel reshapes may merge major dims but never split the lane dim;
- ``tpu.matmul`` rejects multi-contracting-dim dots, so operands are
  major-merged to 2-D before each contraction.

STATUS: numerically validated (interpret mode, tests/test_pallas.py) but
DISABLED in production (ops/fastconv._USE_PALLAS_WGRAD): this toolchain's
remote Mosaic compile of the 480p shapes is OOM-killed (SIGKILL in
tpu_compile_helper). Revisit when the compiler budget grows or with a
smaller unrolled tap count per kernel instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_tile(h: int, wp: int, c: int, d: int,
               budget: int = 6 * 2**20) -> int:
    per_row = wp * c * 2 + wp * d * 2
    t = max(16, (budget // max(per_row, 1)) // 16 * 16)
    return min(_round_up(h, 16), t)


def _kernel(t_rows: int, w: int, c_pad: int, d: int):
    row_block = t_rows + 16  # halo rows live inside the 16-aligned over-read

    def kernel(xpad_hbm, g_ref, out_ref, xs, sem):
        n_i = pl.program_id(0)
        t_i = pl.program_id(1)

        @pl.when((n_i == 0) & (t_i == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        dma = pltpu.make_async_copy(
            xpad_hbm.at[n_i, pl.ds(t_i * t_rows, row_block)], xs, sem)
        dma.start()
        dma.wait()

        # merging the two major dims keeps the lane dim intact — the only
        # reshape flavor Mosaic's layout inference accepts here
        g = g_ref[0].reshape(t_rows * w, d)
        for kh in range(3):
            for kw in range(3):
                a = xs[kh:kh + t_rows, kw:kw + w, :].reshape(
                    t_rows * w, c_pad)
                out_ref[kh, kw] += jax.lax.dot_general(
                    a, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def wgrad3x3(x: jnp.ndarray, g: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """dk (3,3,C,D) f32 for a SAME-padded 3x3 NHWC conv.

    x: (N, H, W, C) saved input; g: (N, H, W, D) cotangent. Matches the
    autodiff weight gradient (tested against the XLA path).
    """
    n, h, w, c = x.shape
    d = g.shape[-1]
    c_pad = _round_up(c, 128)
    wp = w + 2
    t_rows = _pick_tile(h, wp, c_pad, d)
    n_tiles = -(-h // t_rows)
    h_rows = n_tiles * t_rows + 16  # DMA over-read room past the last tile
    xpad = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (1, h_rows - h - 1), (1, 1), (0, c_pad - c)))
    g_hpad = n_tiles * t_rows
    gpad = jnp.pad(g.astype(jnp.bfloat16),
                   ((0, 0), (0, g_hpad - h), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _kernel(t_rows, w, c_pad, d),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_pad, d), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xpad stays in HBM
            pl.BlockSpec((1, t_rows, w, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c_pad, d), lambda i, j: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t_rows + 16, wp, c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xpad, gpad)
    return out[:, :, :c, :]
