"""Pallas 3x3-conv weight-gradient kernel (flat layout, aligned taps).

XLA's conv wgrad relayouts the saved activations, and the shift-einsum
formulation (ops/fastconv.py) materializes nine shifted slices AND pays
full-tensor relayout copies because merging ``(N, H, W, C) -> (NHW, C)``
is only layout-free when W is a multiple of the sublane tile — DAVIS
widths (854/427/214/107/54) never are. Profiled at 480p batch 5 those
copies + dots were ~45 ms of the 128 ms online fine-tune step.

Design (what v5e microbenchmarks actually demanded):

- **Flat layout.** x is zero-padded to ``(N, Hp, Wp, C)`` with
  ``Wp = round_up(W+2, 16)`` and flattened to ``(N*Hp*Wp, C)`` — a layout
  no-op since Wp is sublane-aligned. In flat space a conv tap (kh, kw)
  becomes a ROW OFFSET ``kh*Wp + kw``: the weight gradient is nine plain
  ``a[off : off+K]^T @ g`` dots over ``K = T*Wp`` rows. Cross-row border
  taps are killed by the zero pad columns, exactly like the classic
  flattened-conv lowering.
- **Dots stream straight from refs.** Each dot's lhs is a 2-D ref slice —
  measured ~500 TFLOP/s on v5e. (The round-1 kernel sliced+reshaped 3-D
  blocks into *values*, which Mosaic materializes through the VPU: ~6x
  slower and pathological to compile.)
- **kh taps are 16-aligned** (multiples of Wp). Unaligned lhs offsets run
  10x slower (measured), so the kw in {1, 2} shifts are done once per
  block with 32-bit tricks on the bf16-pair-packed view: shift-by-2 is a
  u32 sublane roll, shift-by-1 is ``(v >> 16) | (roll(v) << 16)``
  (bit-exact on hardware, tests/test_pallas.py covers the kernel e2e).
- x rows are DMA'd manually (HBM -> VMEM) at 16-aligned offsets with the
  +2-row halo riding inside the over-read; g streams through the
  auto-pipeline; the (3, 3, C, d_blk) f32 output block stays resident
  across the sequential (n, h_tiles) grid dims.

Grid: ``(d_tiles, n, h_tiles)``. D is tiled to bound the double-buffered
f32 output block; x is re-read per d-tile (only the small deep stages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


_T = 16  # rows per block: the bf16 sublane tile, keeps DMA offsets aligned


def _plan(w: int, h: int, c: int, d: int):
    """(wp, h_tiles, d_blk, d_tiles) fitting the ~16 MB scoped VMEM.

    Both the g input block and the f32 output block are double-buffered by
    the pipeline; the two x scratches are single. Budget ~13 MB.
    """
    wp = _round_up(w + 2, 16)
    h_tiles = -(-h // _T)
    xs_rows = (_T + 2) * wp + 32
    xs_bytes = xs_rows * c * 2
    d_blk = min(_round_up(d, 128) if d > 64 else d, 256)
    budget = 13 * 2**20
    while d_blk > 64:
        total = (xs_bytes + 2 * (_T * wp * max(d_blk, 128) * 2)
                 + 2 * (3 * 3 * c * d_blk * 4))
        if total <= budget:
            break
        d_blk //= 2
    d_tiles = -(-d // d_blk)
    return wp, h_tiles, d_blk, d_tiles


def _kernel(wp: int, hp: int, c: int, d_blk: int):
    k_rows = _T * wp
    xs_rows = (_T + 2) * wp + 32

    def kernel(xf_hbm, g_ref, out_ref, xs, sem):
        i = pl.program_id(1)   # batch
        j = pl.program_id(2)   # row tile

        @pl.when((i == 0) & (j == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        dma = pltpu.make_async_copy(
            xf_hbm.at[pl.ds((i * hp + j * _T) * wp, xs_rows)], xs, sem)
        dma.start()
        dma.wait()

        def taps(kw):
            for kh in range(3):
                out_ref[kh, kw] += jax.lax.dot_general(
                    xs[pl.ds(kh * wp, k_rows), :], g_ref[...],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        def shift_in_place():
            # xs[r] <- xs[r + 1] via the bf16-pair-packed u32 view:
            # word m = (x[2m], x[2m+1]) -> (x[2m+1], x[2m+2]). Chunked so
            # the unaligned-slice temps stay ~1/8 block (a full-block roll
            # temp blew the scoped-vmem cap). Chunks walk upward, each
            # reading 2 rows past its write window — the next chunk's
            # source is untouched.
            # +8 words past the tap range: the second (chained) in-place
            # shift corrupts its last produced word, which must therefore
            # lie beyond every tap read.
            n_sh = ((_T + 2) * wp) // 2 + 8
            ch = _round_up(-(-n_sh // 8), 8)
            for a in range(0, n_sh, ch):
                b = min(a + ch, n_sh)
                wv = pltpu.bitcast(xs[pl.ds(2 * a, 2 * (b - a) + 2), :],
                                   jnp.uint32)
                va, vb = wv[0:b - a], wv[1:b - a + 1]
                xs[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
                    (va >> 16) | (vb << 16), jnp.bfloat16)

        def ordered_after(out_elem, fn):
            # The in-place shift must not be hoisted above the dots still
            # reading xs — Mosaic does NOT track this WAR hazard through
            # dynamic dot slices (observed on v5e). Predicate the phase on
            # a value those dots just accumulated: x * 0 is in {0, -0, NaN}
            # for every float, so the branch ALWAYS runs — but cannot be
            # folded away (x * 0 may be NaN).
            @pl.when(out_elem * jnp.float32(0.0) != jnp.float32(1.0))
            def _():
                fn()

        taps(0)
        ordered_after(out_ref[2, 0, 0, 0], shift_in_place)
        taps(1)
        ordered_after(out_ref[2, 1, 0, 0], shift_in_place)
        taps(2)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def wgrad3x3(x: jnp.ndarray, g: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """dk (3,3,C,D) f32 for a SAME-padded 3x3 NHWC conv.

    x: (N, H, W, C) saved input; g: (N, H, W, D) cotangent. Matches the
    autodiff weight gradient (tested against the XLA path,
    tests/test_pallas.py).
    """
    n, h, w, c = x.shape
    d = g.shape[-1]
    # HBM DMA needs the lane (channel) extent 128-aligned
    c_pad = c if c >= 128 else _round_up(c, 128)
    wp, h_tiles, d_blk, d_tiles = _plan(w, h, c_pad, d)
    d_pad = d_tiles * d_blk
    hp = h_tiles * _T + 4  # +2 halo +2 slack for the 16-row DMA over-read

    # x: +1 left pad (SAME); flatten (N,Hp,Wp) — layout-free, wp % 16 == 0.
    xf = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, hp - h - 1), (1, wp - w - 1),
                  (0, c_pad - c))).reshape(n * hp * wp, c_pad)
    # g: NO left pad (its (h, w) indexes the conv output); zero pads kill
    # the cross-row and shift-wrap contributions.
    hg = h_tiles * _T
    gf = jnp.pad(g.astype(jnp.bfloat16),
                 ((0, 0), (0, hg - h), (0, wp - w), (0, d_pad - d))
                 ).reshape(n * hg * wp, d_pad)

    out = pl.pallas_call(
        name="wgrad3x3",
        kernel=_kernel(wp, hp, c_pad, d_blk),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_pad, d_pad), jnp.float32),
        grid=(d_tiles, n, h_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xf stays in HBM
            pl.BlockSpec((_T * wp, d_blk), lambda di, i, j: (i * (hg // _T)
                                                             + j, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c_pad, d_blk),
                               lambda di, i, j: (0, 0, 0, di),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((_T + 2) * wp + 32, c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, gf)
    return out[:, :, :c, :d]
