"""Flat-layout 3x3 conv trunk kernels (fwd + dgrad + wgrad), TPU Pallas.

Why this exists: the online fine-tune step is dominated not by MXU time but
by layout churn — XLA's NHWC convs pick non-row-major activation layouts,
and every custom op (Pallas wgrad, pool VJP, loss) pins row-major, so
relayout copies appear between them (measured: Pallas-wgrad-in-graph is
*slower* than shift-einsums, 106.5 vs 98.0 ms/step, scripts/bench_step.py).
The fix is to own the whole trunk hot path in ONE layout nothing wants to
change: activations stay in flat ``(rows, C)`` bf16 buffers and every conv
pass — forward, input-gradient, weight-gradient — is a Pallas kernel over
aligned row-offset matmuls. Elementwise work (bias, ReLU, ReLU-mask,
bias-grad) rides inside the kernels' prologues/epilogues, so between
kernels there is zero elementwise traffic and zero relayouts.

Flat layout (``FlatGeom``): image pixel (n, h, w) lives at flat row
``lead + n*hp*wp + (h+1)*wp + (w+1)`` with ``wp = round_up(w+2, 16)``
(>=1 zero column left and right), ``hp = round_up(h+2, t)`` (one zero row
above, >=1 below), ``lead = t*wp`` (one block of zero rows so the first
block's halo DMA never reads a negative offset) and one trailing zero
block absorbing the DMA over-read. Zero padding is load-bearing: a conv
tap (kh, kw) is then exactly the row offset ``(kh-1)*wp + (kw-1)`` and
cross-row/cross-image contributions vanish against the zeros.

Kernel recipe (shared by all three passes):
- grid ``(d_tiles, total_tiles)``; the activation input is DMA'd manually
  (HBM->VMEM) per tile from the 16-aligned offset ``b - wp`` with the +-1
  row halo riding inside the over-read; weights/aux stream through the
  auto-pipeline.
- the nine taps run as three phases over aligned lhs offsets
  ``16 + kh*wp`` (the scratch carries a 16-row DMA'd lead so the -1 shift
  has real halo data below it):
  phase kw=1 on the raw buffer, then an in-place +1 row shift (u32
  pair-packed ``(v>>16)|(roll<<16)`` trick) for kw=2, then an in-place
  -2 row shift (a plain one-word downward roll) for kw=0. Each phase's
  dots stream straight from 2-D ref slices into the MXU.
- fwd epilogue: bias add + validity mask (computed from an iota over the
  block rows) so pad rows/cols stay exactly zero; the conv INPUT gets
  ReLU'd in the prologue (buffers store pre-activation z; consumers apply
  the nonlinearity, which also makes max-pool commute: pool(relu(z)) ==
  relu(pool(z))).
- dgrad epilogue: multiply by ``(z_in > 0)`` — the ReLU backward mask —
  which doubles as the pad mask because z's pads are zero.
- wgrad: contraction over the row dim (lhs^T @ g), the (9, C, d_blk) f32
  result block stays resident across tiles; the bias gradient
  (column-sum of g) accumulates as a free second output.

``flat_conv3x3`` wraps the three kernels in a ``jax.custom_vjp`` so the
trunk autodiffs through pure flat ops. Reference semantics (what the
kernels must equal): ``networks/vgg_osvos.py:~120 make_layers_osvos`` —
Conv2d(3x3, pad 1) + ReLU chains; equality is tested against an XLA twin
(tests/test_flat.py) in both directions.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@dataclasses.dataclass(frozen=True)
class FlatGeom:
    """Static geometry of one flat activation buffer."""

    n: int
    h: int
    w: int
    c: int
    t: int  # rows of image per kernel block (per-stage; see stage_t)

    @property
    def wp(self) -> int:
        return _round_up(self.w + 2, 16)

    @property
    def hp(self) -> int:
        return _round_up(self.h + 2, self.t)

    @property
    def c_pad(self) -> int:
        return _round_up(self.c, 128)

    @property
    def jt(self) -> int:  # tiles per image
        return self.hp // self.t

    @property
    def total_tiles(self) -> int:  # + lead + tail zero blocks
        return self.n * self.jt + 2

    @property
    def block_rows(self) -> int:
        return self.t * self.wp

    @property
    def rows(self) -> int:
        return self.total_tiles * self.block_rows

    @property
    def lead(self) -> int:
        return self.block_rows


def stage_t(h: int) -> int:
    """Block rows per stage resolution, sized to the ~13 MB VMEM budget."""
    return 8 if h >= 480 else 16


def to_flat(x: jnp.ndarray, g: FlatGeom) -> jnp.ndarray:
    """(n, h, w, c) -> (rows, c_pad) bf16 flat buffer (zero-padded)."""
    core = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (1, g.hp - g.h - 1), (1, g.wp - g.w - 1),
                    (0, g.c_pad - g.c)))
    core = core.reshape(g.n * g.hp * g.wp, g.c_pad)
    return jnp.pad(core, ((g.lead, g.block_rows), (0, 0)))


def from_flat(zf: jnp.ndarray, g: FlatGeom) -> jnp.ndarray:
    """(rows, c_pad) -> (n, h, w, c) bf16 (lazy slices; XLA fuses)."""
    z = zf[g.lead:g.lead + g.n * g.hp * g.wp, :g.c]
    z = z.reshape(g.n, g.hp, g.wp, g.c)
    return z[:, 1:g.h + 1, 1:g.w + 1, :]


def _pick_d_blk(d_pad: int) -> int:
    return min(d_pad, 256)


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------


_LEAD_ROWS = 16  # DMA'd lead rows so shifted taps never read below 0


def _shift_up_1(xs, n_rows: int) -> None:
    """In-place xs[r] <- xs[r+1] on the bf16 pair-packed u32 view.

    Operates on the tap region (words 8..8+n_rows/2+8; the 16-row lead
    needs no shifting). Chunks walk upward; each reads 2 rows past its
    write window, so the next chunk's source is untouched. Every ref
    read/write lands on a 16-row boundary — odd word offsets only appear
    as sub-slices of an already-read value (register shuffles), which is
    what keeps Mosaic's lowering (and compile time) sane.
    """
    n_sh = n_rows // 2 + 8
    ch = _round_up(-(-n_sh // 8), 8)
    for a in range(8, 8 + n_sh, ch):
        b = min(a + ch, 8 + n_sh)
        wv = pltpu.bitcast(xs[pl.ds(2 * a, 2 * (b - a) + 2), :], jnp.uint32)
        va, vb = wv[0:b - a], wv[1:b - a + 1]
        xs[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
            (va >> 16) | (vb << 16), jnp.bfloat16)


def _shift_down_2(xs, n_rows: int) -> None:
    """In-place xs[r] <- xs[r-2] (one u32 word down) over the tap region.

    Chunks walk downward; each reads an aligned window starting 8 words
    below its write window (valid data: the 16-row lead), selects the
    off-by-one words as a value sub-slice, and writes aligned. Lower
    chunks' sources are untouched until their own turn.
    """
    n_sh = n_rows // 2 + 8
    ch = _round_up(-(-n_sh // 8), 8)
    starts = list(range(8, 8 + n_sh, ch))
    for a in reversed(starts):
        b = min(a + ch, 8 + n_sh)
        wv = pltpu.bitcast(xs[pl.ds(2 * (a - 8), 2 * (b - a) + 16), :],
                           jnp.uint32)
        xs[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
            wv[7:7 + (b - a)], jnp.bfloat16)


def _ordered_after(anchor, fn):
    """Run ``fn`` strictly after the dots that produced ``anchor``.

    Mosaic does not track the WAR hazard between dots reading xs via
    dynamic slices and a subsequent in-place shift of xs (observed on
    v5e). Predicating the shift on a value the dots just accumulated
    forces the order; ``x * 0 != 1`` is always true (0, -0 or NaN) but
    cannot be constant-folded (x * 0 may be NaN).
    """

    @pl.when(anchor * jnp.float32(0.0) != jnp.float32(1.0))
    def _():
        fn()


# ---------------------------------------------------------------------------
# forward kernel: z_out = conv3x3(relu(z_in)) @ K + bias   (pads masked to 0)
# ---------------------------------------------------------------------------


def _fwd_kernel(g_in: FlatGeom, h_out_valid: int, w_out_valid: int,
                relu_input: bool):
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    jt, last = g_in.jt, g_in.total_tiles - 1

    def kernel(xf_hbm, kref, bref, out_ref, xs, acc, sem):
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(jnp.logical_not(edge))
        def _():
            off = pl.multiple_of((tt * t - 1) * wp - _LEAD_ROWS, 16)
            dma = pltpu.make_async_copy(
                xf_hbm.at[pl.ds(off, xs_rows)], xs, sem)
            dma.start()
            dma.wait()
            if relu_input:
                xs[...] = jnp.maximum(xs[...], jnp.bfloat16(0))

            def taps(kw, first):
                for kh in range(3):
                    d = jax.lax.dot_general(
                        xs[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :], kref[kh * 3 + kw],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if first and kh == 0:
                        acc[...] = d
                    else:
                        acc[...] += d

            taps(1, True)
            _ordered_after(acc[0, 0], lambda: _shift_up_1(xs, (t + 2) * wp))
            taps(2, False)

            def back2():
                _shift_down_2(xs, (t + 2) * wp)

            _ordered_after(acc[0, 1], back2)
            taps(0, False)

            # epilogue: bias + validity mask (pad rows/cols stay zero)
            j = (tt - 1) % jt
            it = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
            h_p = j * t + it // wp
            w_p = it % wp
            valid = ((h_p >= 1) & (h_p <= h_out_valid)
                     & (w_p >= 1) & (w_p <= w_out_valid))
            out = acc[...] + bref[0][None, :]
            out_ref[...] = jnp.where(valid, out, 0.0).astype(out_ref.dtype)

    return kernel


def _flat_conv_fwd_impl(zf: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, g_in: FlatGeom, d: int,
                        relu_input: bool, interpret: bool) -> jnp.ndarray:
    """zf: (rows, c_pad) bf16; kernel: (3, 3, C, D); bias: (D,)."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _round_up(d, 128)
    d_blk = _pick_d_blk(d_pad)
    d_tiles = d_pad // d_blk
    kp = jnp.pad(kernel.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, c_pad - c), (0, d_pad - d)))
    kp = kp.reshape(9, c_pad, d_pad)
    bp = jnp.pad(bias.astype(jnp.float32), (0, d_pad - d))[None, :]

    g_out = dataclasses.replace(g_in, c=d)
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    out = pl.pallas_call(
        _fwd_kernel(g_in, g_in.h, g_in.w, relu_input),
        out_shape=jax.ShapeDtypeStruct((g_out.rows, d_pad), jnp.bfloat16),
        grid=(d_tiles, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zf stays in HBM
            pl.BlockSpec((9, c_pad, d_blk), lambda di, tt: (0, 0, di),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_blk), lambda di, tt: (0, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_in.block_rows, d_blk),
                               lambda di, tt: (tt, di),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
            pltpu.VMEM((g_in.block_rows, d_blk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(zf, kp, bp)
    return out


# ---------------------------------------------------------------------------
# dgrad kernel: dz_in = conv3x3(g_out, flip(K)^T) * (z_in > 0)
# ---------------------------------------------------------------------------


def _dgrad_kernel(g_geom: FlatGeom):
    wp, t = g_geom.wp, g_geom.t
    k_rows = g_geom.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    last = g_geom.total_tiles - 1

    def kernel(gf_hbm, kref, zref, out_ref, xs, acc, sem):
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(jnp.logical_not(edge))
        def _():
            off = pl.multiple_of((tt * t - 1) * wp - _LEAD_ROWS, 16)
            dma = pltpu.make_async_copy(
                gf_hbm.at[pl.ds(off, xs_rows)], xs, sem)
            dma.start()
            dma.wait()

            def taps(kw, first):
                for kh in range(3):
                    d = jax.lax.dot_general(
                        xs[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :], kref[kh * 3 + kw],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if first and kh == 0:
                        acc[...] = d
                    else:
                        acc[...] += d

            taps(1, True)
            _ordered_after(acc[0, 0], lambda: _shift_up_1(xs, (t + 2) * wp))
            taps(2, False)

            def back2():
                _shift_down_2(xs, (t + 2) * wp)

            _ordered_after(acc[0, 1], back2)
            taps(0, False)

            # ReLU backward + pad mask in one: z's pads are zero.
            out_ref[...] = jnp.where(zref[...] > 0, acc[...],
                                     0.0).astype(out_ref.dtype)

    return kernel


def _flat_conv_dgrad_impl(gf: jnp.ndarray, kernel: jnp.ndarray,
                          zf_in: jnp.ndarray, g_in: FlatGeom, d: int,
                          interpret: bool) -> jnp.ndarray:
    """gf: (rows, d_pad) cotangent of z_out; returns dz_in (rows, c_pad)."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _round_up(d, 128)
    o_blk = _pick_d_blk(c_pad)
    o_tiles = c_pad // o_blk
    # dgrad conv kernel: spatial flip + in/out channel swap
    kflip = kernel.astype(jnp.bfloat16)[::-1, ::-1].transpose(0, 1, 3, 2)
    kp = jnp.pad(kflip, ((0, 0), (0, 0), (0, d_pad - d), (0, c_pad - c)))
    kp = kp.reshape(9, d_pad, c_pad)

    g_geom = dataclasses.replace(g_in, c=d)
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    out = pl.pallas_call(
        _dgrad_kernel(g_geom),
        out_shape=jax.ShapeDtypeStruct((g_in.rows, c_pad), jnp.bfloat16),
        grid=(o_tiles, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gf stays in HBM
            pl.BlockSpec((9, d_pad, o_blk), lambda oi, tt: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_in.block_rows, o_blk), lambda oi, tt: (tt, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_in.block_rows, o_blk),
                               lambda oi, tt: (tt, oi),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, d_pad), jnp.bfloat16),
            pltpu.VMEM((g_in.block_rows, o_blk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gf, kp, zf_in)
    return out


# ---------------------------------------------------------------------------
# wgrad kernel: dK[kh,kw] = relu(z_in)^T_shifted @ g_out ; db = colsum(g_out)
# ---------------------------------------------------------------------------


def _wgrad_kernel(g_in: FlatGeom, relu_input: bool):
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    last = g_in.total_tiles - 1

    def kernel(xf_hbm, g_ref, out_ref, db_ref, xs, sem):
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        @pl.when(tt == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(jnp.logical_not(edge))
        def _():
            off = pl.multiple_of((tt * t - 1) * wp - _LEAD_ROWS, 16)
            dma = pltpu.make_async_copy(
                xf_hbm.at[pl.ds(off, xs_rows)], xs, sem)
            dma.start()
            dma.wait()
            if relu_input:
                xs[...] = jnp.maximum(xs[...], jnp.bfloat16(0))

            def taps(kw):
                for kh in range(3):
                    out_ref[kh * 3 + kw] += jax.lax.dot_general(
                        xs[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :], g_ref[...],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            taps(1)
            _ordered_after(out_ref[7, 0, 0],
                           lambda: _shift_up_1(xs, (t + 2) * wp))
            taps(2)

            def back2():
                _shift_down_2(xs, (t + 2) * wp)

            _ordered_after(out_ref[8, 0, 0], back2)
            taps(0)

            db_ref[0:1, :] += jnp.sum(g_ref[...].astype(jnp.float32),
                                      axis=0, keepdims=True)

    return kernel


def _flat_conv_wgrad_impl(zf: jnp.ndarray, gf: jnp.ndarray, g_in: FlatGeom,
                          d: int, relu_input: bool, interpret: bool
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dk (3,3,C,D) f32, db (D,) f32)."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _round_up(d, 128)
    d_blk = _pick_d_blk(d_pad)
    d_tiles = d_pad // d_blk
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32

    dk, db = pl.pallas_call(
        _wgrad_kernel(g_in, relu_input),
        out_shape=(
            jax.ShapeDtypeStruct((9, c_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        grid=(d_tiles, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zf stays in HBM
            pl.BlockSpec((g_in.block_rows, d_blk), lambda di, tt: (tt, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((9, c_pad, d_blk), lambda di, tt: (0, 0, di),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_blk), lambda di, tt: (0, di),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(zf, gf)
    dk = dk.reshape(3, 3, c_pad, d_pad)[:, :, :c, :d]
    return dk, db[0, :d]


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flat_conv3x3(zf, kernel, bias, g_in: FlatGeom, relu_input: bool = True,
                 interpret: bool = False):
    """z_out = conv3x3(relu?(z_in)) + bias in flat layout.

    zf: (g_in.rows, g_in.c_pad) bf16 flat buffer holding PRE-activation z
    (the kernel applies the ReLU internally when relu_input=True; the
    stem output is stored pre-relu too, so every trunk conv passes True).
    kernel: (3, 3, C, D) float32 params; bias: (D,).
    Returns the (rows, d_pad) bf16 flat buffer of the NEXT geometry
    (same n/h/w/t, c=D). Matches nn.Conv(3x3, SAME) + ReLU chains
    (reference make_layers_osvos, networks/vgg_osvos.py:~120); tested
    against the XLA twin in tests/test_flat.py.
    """
    return _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                               relu_input, interpret)


def _fc_fwd(zf, kernel, bias, g_in, relu_input, interpret):
    out = _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                              relu_input, interpret)
    return out, (zf, kernel)


def _fc_bwd(g_in, relu_input, interpret, res, gf):
    zf, kernel = res
    d = kernel.shape[-1]
    gf = gf.astype(jnp.bfloat16)
    if not relu_input:
        raise NotImplementedError(
            "flat_conv3x3 backward assumes a ReLU'd input (the VGG trunk "
            "always has one); forward-only use may pass relu_input=False")
    dz = _flat_conv_dgrad_impl(gf, kernel, zf, g_in, d, interpret)
    dk, db = _flat_conv_wgrad_impl(zf, gf, g_in, d, relu_input, interpret)
    return dz, dk.astype(kernel.dtype), db.astype(jnp.float32)


flat_conv3x3.defvjp(_fc_fwd, _fc_bwd)


# ---------------------------------------------------------------------------
# XLA twin (tests + CPU fallback)
# ---------------------------------------------------------------------------


def flat_conv3x3_ref(zf, kernel, bias, g_in: FlatGeom,
                     relu_input: bool = True):
    """Pure-XLA reference with identical flat-buffer semantics."""
    x = from_flat(zf, g_in).astype(jnp.float32)
    if relu_input:
        x = jnp.maximum(x, 0)
    y = lax.conv_general_dilated(
        x, kernel.astype(jnp.bfloat16).astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(jnp.float32)
    g_out = dataclasses.replace(g_in, c=kernel.shape[-1])
    return to_flat(y, g_out)
