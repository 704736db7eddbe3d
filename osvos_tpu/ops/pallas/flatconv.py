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
``lead + n*hp*wp + (h+2)*wp + (w+2)`` with ``wp = round_up(w+4, 16)``
(TWO zero columns left, >=2 right), ``hp = round_up(h+4, t)`` (two zero
rows above, >=2 below), ``lead = t*wp`` (one block of zero rows so the
first block's halo DMA never reads a negative offset) and one trailing
zero block absorbing the DMA over-read. Zero padding is load-bearing
twice over: a conv tap (kh, kw) is exactly the row offset
``(kh-1)*wp + (kw-1)`` with cross-row/cross-image contributions vanishing
against the zeros, and the EVEN pad offset makes 2x2 pooling an aligned
pairwise reduction directly on the flat view (pool_flat) — pixel pair
(2h, 2h+1) sits at padded pair index h+1, so no repacking is needed
between conv and pool.

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
- fwd epilogue: bias add + the trunk's ReLU (fused free into the same
  select) + validity mask (computed from an iota over the block rows) so
  pad rows/cols stay exactly zero. Buffers store POST-relu activations
  (relu_output=True producers), so no consumer pays a ReLU prologue
  pass; the legacy pre-activation convention (relu_input=True) is kept
  for generality and tested equally.
- dgrad epilogue: multiply by ``(input > 0)`` — the upstream ReLU's
  backward mask (on post-relu buffers, input>0 <=> z>0) — which doubles
  as the pad mask because the pads are zero.
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


def _lane_pad(c: int) -> int:
    """Buffer lane count. Always full 128-lane tiles: hardware Mosaic
    rejects sub-128 lane extents in slices ("Slice shape along dimension 1
    must be aligned to tiling (128)"), so even the packed image buffer
    rides in 128 lanes (its 120 zero lanes cost bandwidth, not MXU time
    beyond the padded dots)."""
    return _round_up(c, 128)


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
        return _round_up(self.w + 4, 16)

    @property
    def hp(self) -> int:
        return _round_up(self.h + 4, self.t)

    @property
    def c_pad(self) -> int:
        return _lane_pad(self.c)

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
    """Block rows per stage resolution: sized to the ~13 MB VMEM budget at
    full res, and to the hp rounding waste at tiny res (stage 5's h=30
    pads to hp=48 under t=16 — 41% dead row-streams; t=8 gives 40).
    t=32 for the mid stages was measured SLOWER (49.1 vs 48.2 ms/step)
    despite identical hp — halving the tile count coarsens the DMA
    double-buffering and VMEM pressure more than it saves in per-tile
    overhead. The fused-bwd kernels pay a per-dot weight-(re)load that
    only rows-per-dot amortizes, so SMALL stages want the largest t that
    doesn't inflate hp: h=30 at t=36 runs one 2560-row tile per image
    (hp=36, jt=1) instead of five 512-row tiles (A/B'd on chip).
    ``OSVOS_STAGE_T`` ("h:t,h:t") overrides per-resolution for A/Bs."""
    ov = _os.environ.get("OSVOS_STAGE_T")
    if ov:
        for pair in ov.split(","):
            hh, tt = pair.split(":")
            if int(hh) == h:
                return int(tt)
    if h + 4 <= 40:
        return _round_up(h + 4, 4)  # one tile per image
    if h >= 480:
        return 8
    return 16


def to_flat(x: jnp.ndarray, g: FlatGeom) -> jnp.ndarray:
    """(n, h, w, c) -> (rows, c_pad) bf16 flat buffer (zero-padded)."""
    core = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (2, g.hp - g.h - 2), (2, g.wp - g.w - 2),
                    (0, g.c_pad - g.c)))
    core = core.reshape(g.n * g.hp * g.wp, g.c_pad)
    return jnp.pad(core, ((g.lead, g.block_rows), (0, 0)))


def from_flat(zf: jnp.ndarray, g: FlatGeom) -> jnp.ndarray:
    """(rows, c_pad) -> (n, h, w, c) bf16 (lazy slices; XLA fuses)."""
    z = zf[g.lead:g.lead + g.n * g.hp * g.wp, :g.c]
    z = z.reshape(g.n, g.hp, g.wp, g.c)
    return z[:, 2:g.h + 2, 2:g.w + 2, :]


# ---------------------------------------------------------------------------
# haloed-core layout: the one-pad input form for manually-DMA'd buffers
# ---------------------------------------------------------------------------
#
# ``to_flat`` costs TWO full-buffer pad passes (the spatial/channel pad,
# then the lead/tail pad — XLA cannot fuse sequential pads), measured at
# ~1.7 ms/step on the 278 MB packed image buffer alone. But the global
# lead/tail blocks exist ONLY so the halo DMA window of the first/last
# interior tile reads zeros — and 2 extra per-image h-rows inside the
# FIRST pad provide the same guarantee at ~0.7% extra write. Buffers in
# this layout are consumed exclusively through the manual-DMA path
# (`_with_prefetched_xs(haloed=...)`), which offsets per (image, tile)
# instead of assuming one uniform row stride; the auto-pipelined
# operands and all OUTPUT buffers keep the standard lead/tail layout.


def _halo_eb(wp: int) -> int:
    """Extra BOTTOM h-rows per image: the last tile's DMA window over-runs
    its image block by 32 rows + one h-row, so (eb-1)*wp >= 32."""
    return max(2, 1 + -(-32 // wp))


def haloed_stride(g: FlatGeom) -> int:
    """Rows per image block in the haloed-core layout."""
    return (g.hp + 2 + _halo_eb(g.wp)) * g.wp


def to_flat_haloed(x: jnp.ndarray, g: FlatGeom) -> jnp.ndarray:
    """(n, h, w, c) -> haloed-core flat buffer (ONE pad op): per image,
    2 extra zero h-rows above the standard hp block and _halo_eb below,
    no global lead/tail."""
    eb = _halo_eb(g.wp)
    core = jnp.pad(x.astype(jnp.bfloat16),
                   ((0, 0), (4, g.hp - g.h - 2 + eb),
                    (2, g.wp - g.w - 2), (0, g.c_pad - g.c)))
    return core.reshape(g.n * (g.hp + 2 + eb) * g.wp, g.c_pad)


# ---------------------------------------------------------------------------
# shared in-kernel helpers
# ---------------------------------------------------------------------------


_LEAD_ROWS = 16  # DMA'd lead rows so shifted taps never read below 0

# Experiment flag: one f32 accumulator per kh tap row (3 chains) instead of
# a single chained accumulator — probes whether the RAW chain on `acc`
# serializes the MXU between dots. Toggled by scripts/bench_ablate A/Bs.
# Measured: ~0.5 ms/step of 57.9 (noise band) — left off.
_SPLIT_ACC = False

# Timing-only flag (WRONG RESULTS): skip the relu prologue and the
# validity-mask epilogue in the fwd kernel, leaving dots + shifts + DMA.
# Sizes the VPU overhead share of kernel time.
_TIMING_BARE = False

# Weight-gradient dot orientation. The wgrad contraction runs over the ROW
# dim of both operands; as written (dot_general ((0,),(0,))) Mosaic pays an
# operand transpose feeding the MXU on EVERY such dot (micro-bench
# scripts/bench_wgrad_orient.py: 9 rows-contraction dots cost up to ~7x
# nine canonical dots from a pre-transposed operand, and an explicit
# in-kernel transpose is far cheaper than what Mosaic inserts). With this
# flag the kernels transpose the SHARED operand ONCE per tile into scratch
# (z for the fused backward, g for the separate wgrad) and run every tap
# dot in the MXU-native (1,0) orientation. Exactness: tests/test_flat.py
# runs both settings. Env-overridable for step A/Bs.
import os as _os

_WGRAD_XPOSE = _os.environ.get("OSVOS_WGRAD_XPOSE", "1") != "0"
# Lane-stacked WIDE wgrad operand for the unmerged fused backward: the
# shifted-tap copies land in lane blocks [xs | ym+1 | ym-1] of ONE wide
# (rows, 3*d_pad) buffer (plus a delta=0 copy of the cotangent window),
# so each kh's three wgrad rows-contractions become ONE dot streaming 3x
# the output columns per operand load (bench_wgrad_orient rows3w: +22%
# at 128 lanes, ~neutral at 256, ~+1% at 512 over rows9). Composes with
# _WGRAD_XPOSE. Gated per-kernel on c_pad for step A/Bs.
_WGRAD_WIDE = _os.environ.get("OSVOS_WGRAD_WIDE", "0") != "0"
_WGRAD_WIDE_MIN = int(_os.environ.get("OSVOS_WGRAD_WIDE_MIN", "128"))
_WGRAD_WIDE_MAX = int(_os.environ.get("OSVOS_WGRAD_WIDE_MAX", "8192"))
# transposed-wgrad lane-width gate (bench_wgrad_orient: win at 512 lanes,
# neutral at 256 standalone — but inside the fused kernel the one transpose
# replaces NINE per-dot operand transposes, so the threshold is A/B'd
# end-to-end; override for experiments)
_WGRAD_XPOSE_MIN = int(_os.environ.get("OSVOS_WGRAD_XPOSE_MIN", "512"))
# Split the non-transposed wgrad rows-contraction into per-128-lane-tile
# dots (the dk output's c rows, 128 at a time; the contraction and the
# cotangent operand are unchanged, so numerics are bit-identical). The
# in-kernel ablation (BASELINE r5) shows c_pad=256 wgrad dots at ~49% of
# SoL while the single-lane-tile c128 form runs at ~95%; each split dot
# is exactly that efficient shape class. Chip A/B: 41.95 vs 42.04
# ms/step (min-of-3, identical loss) — a small real win, default on.
_WGRAD_SPLIT = _os.environ.get("OSVOS_WGRAD_SPLIT", "1") != "0"
# Group the fused backward's dots by KIND — all 9 dgrad dots, then all 9
# wgrad rows-contractions — instead of interleaving 3+3 per tap group.
# Probes whether alternating the MXU between the standard and the
# rows-contraction orientation is what holds the multi-lane-tile fused
# backwards at 60-75% of SoL. Each dk tap is still written exactly once
# per tile and the dgrad accumulation order is unchanged, so numerics
# are bit-identical to the interleaved order.
_BWD_GROUPED = _os.environ.get("OSVOS_BWD_GROUPED", "0") != "0"
# TIMING-ONLY ablation for the fused backward (wrong numerics; see
# scripts/bench_bwd_ablate.py): one of "", "nodgrad", "nowgrad",
# "noshift", "nodb", "noepi". Because these branches silently corrupt
# gradients, a non-empty value additionally requires the acknowledgement
# var OSVOS_BWD_ABLATE_ACK=1 (the bench script sets it) — an env var
# accidentally inherited by a training process fails loudly instead.
_BWD_ABLATE = _os.environ.get("OSVOS_BWD_ABLATE", "")
if _BWD_ABLATE and _os.environ.get("OSVOS_BWD_ABLATE_ACK") != "1":
    raise RuntimeError(
        f"OSVOS_BWD_ABLATE={_BWD_ABLATE!r} disables gradient terms in the "
        "fused backward (TIMING-ONLY, wrong numerics). Set "
        "OSVOS_BWD_ABLATE_ACK=1 to confirm this is a timing run, or unset "
        "OSVOS_BWD_ABLATE.")
# TIMING-ONLY ablation for the tap-stacked side FORWARD kernel (wrong
# numerics): comma list of "collapse" (skip the VPU tap-collapse loop),
# "mask" (skip the validity masking pass), "pool" (skip the fused pool
# epilogue's compute+copies). Same ACK guard as the backward ablation.
_SIDE_ABLATE = set(filter(None, _os.environ.get(
    "OSVOS_SIDE_ABLATE", "").split(",")))
if _SIDE_ABLATE and _os.environ.get("OSVOS_BWD_ABLATE_ACK") != "1":
    raise RuntimeError(
        f"OSVOS_SIDE_ABLATE={sorted(_SIDE_ABLATE)} disables side-forward "
        "terms (TIMING-ONLY, wrong numerics). Set OSVOS_BWD_ABLATE_ACK=1 "
        "to confirm this is a timing run, or unset OSVOS_SIDE_ABLATE.")


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


def _merge_pairs_to(ym, xs, n_rows: int, half: int) -> None:
    """ym[r] <- [xs[r-1].hi -> lanes <half | xs[r+1].lo -> lanes half..2half).

    The cross-pair conv taps (packed delta = +-1) are 3/4-zero block
    matrices; merging both neighbours' live halves into ONE operand row
    lets a single dense dot replace two sparse ones (9 -> 6 dots per conv
    pass). Built OUT OF PLACE over the tap region in one pass: xs is only
    read, so no write-after-read ordering against the dots is needed at
    all (and xs stays pristine for the db column-sum / epilogue masks).
    The +-1 row reads ride the u32 sublane-pair packing: row r+1 of an
    aligned window is ``(w >> 16) | (w_next << 16)``, row r-1 is
    ``(w_prev >> 16) | (w << 16)``; lanes move with 32-bit rolls (one u32
    lane = one bf16 lane). Lanes >= 2*half of ym carry roll garbage — the
    merged weight rows there are zero, so the dots ignore them.
    """
    n_sh = n_rows // 2 + 8
    ch = _round_up(-(-n_sh // 8), 8)
    for a in range(8, 8 + n_sh, ch):
        b = min(a + ch, 8 + n_sh)
        w = pltpu.bitcast(xs[pl.ds(2 * (a - 8), 2 * (b - a) + 18), :],
                          jnp.uint32)
        wcur = w[8:8 + (b - a)]
        up1 = (wcur >> 16) | (w[9:9 + (b - a)] << 16)     # row r+1
        dn1 = (w[7:7 + (b - a)] >> 16) | (wcur << 16)     # row r-1
        prev_hi = pltpu.roll(dn1, (128 - half) % 128, axis=1)
        next_lo = pltpu.roll(up1, half, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, prev_hi.shape, 1)
        ym[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
            jnp.where(lane < half, prev_hi, next_lo), jnp.bfloat16)


def _copy_shifted(ym, xs, n_rows: int, delta: int, lane_off: int = None
                  ) -> None:
    """ym[r] <- xs[r + delta] (delta in {-1, +1, 0}) over the tap region,
    OUT OF PLACE: xs is only read, so the consuming dots need no
    write-after-read ordering against the other phases — removing the
    _ordered_after barriers between shift passes and dots lets Mosaic
    overlap these VPU passes with the dense-phase MXU work. Same u32
    sublane-pair trick as the in-place shifts.

    ``lane_off``: store into lanes [lane_off, lane_off + width(xs)) of a
    WIDER ym (the _WGRAD_WIDE [xs|ym+1|ym-1] lane-stacked wgrad operand;
    must be a multiple of 128 so the store stays tile-aligned).
    delta == 0 is the plain copy for that stacked buffer's block 0."""
    n_sh = n_rows // 2 + 8
    ch = _round_up(-(-n_sh // 8), 8)
    d_pad = xs.shape[-1]
    for a in range(8, 8 + n_sh, ch):
        b = min(a + ch, 8 + n_sh)
        if delta == 0:
            outv = xs[pl.ds(2 * (a - 8) + 16, 2 * (b - a)), :]
        else:
            w = pltpu.bitcast(xs[pl.ds(2 * (a - 8), 2 * (b - a) + 18), :],
                              jnp.uint32)
            if delta == 1:
                out = (w[8:8 + (b - a)] >> 16) | (w[9:9 + (b - a)] << 16)
            else:
                out = (w[7:7 + (b - a)] >> 16) | (w[8:8 + (b - a)] << 16)
            outv = pltpu.bitcast(out, jnp.bfloat16)
        if lane_off is None:
            ym[pl.ds(2 * a, 2 * (b - a)), :] = outv
        else:
            ym[pl.ds(2 * a, 2 * (b - a)), pl.ds(lane_off, d_pad)] = outv


def merge_packed_taps(k9: jnp.ndarray, a: int, b: int) -> jnp.ndarray:
    """(9, in_pad, out_pad) pair-packed taps -> (6, in_pad, out_pad):
    [0..2] the dense delta=0 taps, [3..5] the merged cross-pair taps
    matching ``_merge_pairs_to``'s operand layout — M[0:a, 0:b] applies
    the delta=-1 corner (in-hi -> out-lo) to the merged row's prev-hi
    lanes, M[a:2a, b:2b] the delta=+1 corner (in-lo -> out-hi) to its
    next-lo lanes. Works for forward packed weights and their dgrad flip
    alike (the flip preserves the corner convention)."""
    dense = [k9[3 * kh + 1] for kh in range(3)]
    merged = []
    for kh in range(3):
        m = jnp.zeros_like(k9[0])
        m = m.at[0:a, 0:b].set(k9[3 * kh + 0][a:2 * a, 0:b])
        m = m.at[a:2 * a, b:2 * b].set(k9[3 * kh + 2][0:a, b:2 * b])
        merged.append(m)
    return jnp.stack(dense + merged)


def _shift_up2_inplace(xs, n_rows: int) -> None:
    """xs[r] <- xs[r+2]: one aligned u32-word roll, chunks walk upward."""
    n_w = n_rows // 2
    ch = _round_up(-(-n_w // 8), 8)
    for a in range(0, n_w, ch):
        b = min(a + ch, n_w)
        wv = pltpu.bitcast(xs[pl.ds(2 * (a + 1), 2 * (b - a)), :],
                           jnp.uint32)
        xs[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(wv, jnp.bfloat16)


def _roll2_bf16(v):
    """roll a bf16 (rows, C) value down 2 rows: one u32-word roll (the
    hardware rotate only supports 32-bit data)."""
    u = pltpu.bitcast(v, jnp.uint32)
    return pltpu.bitcast(pltpu.roll(u, 1, axis=0), jnp.bfloat16)


def _dup_lo(u):
    lo = u & jnp.uint32(0xFFFF)
    return lo | (lo << 16)


def _dup_hi(u):
    hi = u & jnp.uint32(0xFFFF0000)
    return (u >> 16) | hi


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


def _with_prefetched_xs(src_hbm, xs0, xs1, sem, tt, t: int, wp: int,
                        xs_rows: int, last: int, body,
                        haloed=None, extra_copies=None,
                        pre_rows: int = 0) -> None:
    """Double-buffered halo DMA across grid steps.

    The back-to-back ``start(); wait()`` form serializes every tile's
    activation transfer with its compute — measured as ~1.4-2.5 ms of
    fixed overhead per kernel call, dominating the dots (which run at
    ~160 TF/s once resident). Here tile tt+1's window is started before
    tile tt is waited on, so the copy rides under the dots. ``body(xs)``
    runs on the slot holding tile tt and may destroy it in place (the kw
    shifts); the in-flight copy always targets the other slot. The
    leading edge tile (tt == 0, present in every d-tile sweep) warms the
    pipeline by starting tile 1's copy.

    ``haloed``: (jt, stride) when src_hbm is a haloed-core buffer
    (to_flat_haloed) — windows offset per (image, tile) instead of the
    uniform lead+core+tail stride; values and zero-halo guarantees are
    identical by construction.

    ``extra_copies(tile_idx, slot)``: optional further async copies that
    ride the same double-buffered slot schedule (started with the tile's
    window, waited before its body). The body can address the matching
    scratch slot as ``tt % 2`` — body(xs1) runs exactly in the tt-odd
    branch.
    """

    def start_extra(tile_idx, slot):
        if extra_copies is not None:
            for cp in extra_copies(tile_idx, slot):
                cp.start()

    def wait_extra(tile_idx, slot):
        if extra_copies is not None:
            for cp in extra_copies(tile_idx, slot):
                cp.wait()

    def dma(tile_idx, xs_ref, sem_ref):
        if haloed is not None:
            jt, stride = haloed
            nj = tile_idx - 1
            off = pl.multiple_of(
                (nj // jt) * stride + ((nj % jt) * t + 1) * wp - _LEAD_ROWS,
                16)
        else:
            off = pl.multiple_of(
                (tile_idx * t - 1) * wp - _LEAD_ROWS - pre_rows, 16)
        return pltpu.make_async_copy(src_hbm.at[pl.ds(off, xs_rows)],
                                     xs_ref, sem_ref)

    @pl.when(tt == 0)
    def _():
        dma(1, xs1, sem.at[1]).start()
        start_extra(1, 1)

    interior = (tt >= 1) & (tt < last)

    @pl.when(interior & (tt + 1 < last) & (tt % 2 == 1))
    def _():
        dma(tt + 1, xs0, sem.at[0]).start()
        start_extra(tt + 1, 0)

    @pl.when(interior & (tt + 1 < last) & (tt % 2 == 0))
    def _():
        dma(tt + 1, xs1, sem.at[1]).start()
        start_extra(tt + 1, 1)

    @pl.when(interior & (tt % 2 == 1))
    def _():
        dma(tt, xs1, sem.at[1]).wait()
        wait_extra(tt, 1)
        body(xs1, 1)

    @pl.when(interior & (tt % 2 == 0))
    def _():
        dma(tt, xs0, sem.at[0]).wait()
        wait_extra(tt, 0)
        body(xs0, 0)


def _pick_out_blk(t: int, wp: int, c_contract: int, out_pad: int,
                  n_aux_streams: int) -> int:
    """Largest output-channel block keeping the kernel inside ~13 MB VMEM
    (2x halo scratch + f32 accumulator + double-buffered out/aux pipeline
    blocks + double-buffered weight slice)."""
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    k_rows = t * wp
    fixed = 2 * xs_rows * c_contract * 2
    for blk in (512, 256, 128):
        if blk > out_pad or out_pad % blk:
            continue
        tot = (fixed + k_rows * blk * 4
               + 2 * k_rows * blk * 2 * (1 + n_aux_streams)
               + 2 * 9 * c_contract * blk * 2)
        if tot <= 13 * 2 ** 20:
            return blk
    # narrow outputs (out_pad < 128, e.g. the 8-lane image buffer) use one
    # full-width block — a zero-size grid would leave the output unwritten
    return min(out_pad, 128)


# ---------------------------------------------------------------------------
# forward kernel: z_out = conv3x3(relu(z_in)) @ K + bias   (pads masked to 0)
# ---------------------------------------------------------------------------


def _kernel_lane_shift(v, s: int):
    """bf16 (rows, 128): cyclic lane shift (result[l] = v[l-s]) riding the
    32-bit hardware rotate on the u32 view (lane rolls move whole words,
    so the bf16 sublane-pair packing is untouched)."""
    u = pltpu.bitcast(v, jnp.uint32)
    return pltpu.bitcast(pltpu.roll(u, s % v.shape[-1], axis=1),
                         jnp.bfloat16)


def _fwd_kernel(g_in: FlatGeom, h_out_valid: int, w_out_valid: int,
                relu_input: bool, merged: int = 0,
                relu_output: bool = False, pool=None,
                src_haloed: bool = False):
    haloed = (g_in.jt, haloed_stride(g_in)) if src_haloed else None
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    jt, last = g_in.jt, g_in.total_tiles - 1
    if pool is not None:
        # fused packed 2x2/2 ceil-mode pool epilogue (see
        # _flat_conv_fwd_impl); all static geometry
        g2, p_half, p_co = pool
        t2w = (t // 2) * wp
        gap = g2.hp - jt * (t // 2)  # uncovered hp-pad rows per image

    def kernel(xf_hbm, kref, bref, out_ref, *rest):
        if pool is not None:
            pooled_hbm = rest[0]
            xs0, xs1, acc, sem = rest[1:5]
            pb0, pb1, carry, zbuf, psem, zsem = rest[5:11]
            opt_ym = rest[11:]
        else:
            xs0, xs1, acc, sem = rest[0:4]
            opt_ym = rest[4:]
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        def zero_dmas(base: int, total: int):
            # all chunks read the constant-zero zbuf and write disjoint
            # HBM rows: start them on distinct semaphore slots and wait
            # after, instead of a serial start();wait() chain per chunk
            cps = [pltpu.make_async_copy(
                       zbuf.at[pl.ds(0, min(t2w, total - a))],
                       pooled_hbm.at[pl.ds(base + a, min(t2w, total - a))],
                       zsem.at[i % 4])
                   for i, a in enumerate(range(0, total, t2w))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        def pcopy(tile, pb):
            # conv tile (n, j) pools to padded pooled rows
            # [j*(t//2), (j+1)*(t//2)) of image n: in padded row pair
            # (q, q+1), q even, holds pixel pair (q-2, q-1) -> pooled
            # pixel (q-2)/2 -> pooled padded row q/2 + 1; the tile's
            # pairs start at q = j*t - 2 (the carry rows).
            jj = (tile - 1) % jt
            nn = (tile - 1) // jt
            off = g2.block_rows + (nn * g2.hp + jj * (t // 2)) * wp
            return pltpu.make_async_copy(
                pb, pooled_hbm.at[pl.ds(off, t2w)], psem.at[tile % 2])

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        if pool is not None:
            # lead/tail blocks of the pooled buffer are never written by
            # interior tiles: zero them (zbuf stays all-zero throughout)
            @pl.when(tt == 0)
            def _():
                zbuf[...] = jnp.zeros_like(zbuf)

                # the copies must read zbuf AFTER the zero store; Mosaic
                # does not track vector-store -> DMA-read ordering (see
                # _ordered_after), so anchor them on a readback. The read
                # must cover EVERY stored row: Mosaic may alias at
                # sub-ref granularity, and a full-ref vector store lowers
                # to per-tile stores — a 16-row readback would only order
                # the tiles it overlaps. A full-buffer scalar reduction
                # depends on all of them (runs once, at tt == 0).
                anchor = jnp.sum(zbuf[...].astype(jnp.float32))

                @pl.when(anchor * jnp.float32(0) != jnp.float32(1))
                def _():
                    zero_dmas(0, g2.block_rows)

            @pl.when(tt == last)
            def _():
                zero_dmas(g2.rows - g2.block_rows, g2.block_rows)
                # drain the last interior tiles' pooled-row copies
                for tprev in (last - 2, last - 1):
                    if tprev >= 1:
                        pcopy(tprev, pb0 if tprev % 2 == 0 else pb1).wait()

        def body(xs, slot=0):
            if relu_input and not _TIMING_BARE:
                xs[...] = jnp.maximum(xs[...], jnp.bfloat16(0))

            def taps(src, kw, first, stride=3):
                for kh in range(3):
                    d = jax.lax.dot_general(
                        src[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :],
                        kref[kh * stride + kw],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if _SPLIT_ACC:
                        if first:
                            acc[kh] = d
                        else:
                            acc[kh] += d
                    elif first and kh == 0:
                        acc[...] = d
                    else:
                        acc[...] += d

            if merged:
                ym = opt_ym[0]
                _merge_pairs_to(ym, xs, (t + 2) * wp, merged)
                taps(xs, 0, True, stride=1)   # dense taps (kref 0..2)
                taps(ym, 3, False, stride=1)  # merged taps (kref 3..5)
            else:
                ym1, ym2 = opt_ym
                _copy_shifted(ym1, xs, (t + 2) * wp, 1)
                _copy_shifted(ym2, xs, (t + 2) * wp, -1)
                taps(xs, 1, True)
                taps(ym1, 2, False)
                taps(ym2, 0, False)

            # epilogue: bias + (optional fused output ReLU) + validity
            # mask (pad rows/cols stay zero)
            if _SPLIT_ACC:
                out = acc[0] + acc[1] + acc[2] + bref[0][None, :]
            else:
                out = acc[...] + bref[0][None, :]
            if relu_output:
                out = jnp.maximum(out, 0.0)
            if _TIMING_BARE:
                out_ref[...] = out.astype(out_ref.dtype)
                return
            j = (tt - 1) % jt
            it = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
            h_p = j * t + it // wp
            w_p = it % wp
            valid = ((h_p >= 2) & (h_p <= h_out_valid + 1)
                     & (w_p >= 2) & (w_p <= w_out_valid + 1))
            res = jnp.where(valid, out, 0.0).astype(out_ref.dtype)
            out_ref[...] = res
            if pool is not None:
                _pool_epilogue(res, j)

        def _pool_epilogue(res, j):
            # 2x2/2 ceil-mode max pool of the bf16 value just stored, on
            # the PACKED layout: the horizontal pair is the row's lane
            # halves, the vertical pair is two adjacent padded rows (pair
            # q = j*t - 2 + 2i comes from the PREVIOUS tile's last two
            # rows for i == 0 -> the carry scratch). Post-relu values and
            # exact-zero pads make ceil-mode free: max(x, 0) == x.
            def pool_into(pb):
                # validity folds into each block's store (the whole-block
                # row test is a traced scalar, the col/lane test a static
                # (wp, 128) mask) — the former full-buffer masking pass
                # was a read+write of pb per tile
                u = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (wp, 128), 1)
                col_ok = ((u >= 2) & (u <= g2.w + 1) & (lane < p_co))
                for i in range(t // 2):
                    if i == 0:
                        va = carry[pl.ds(0, wp), :]
                        vb = carry[pl.ds(wp, wp), :]
                    else:
                        va = res[(2 * i - 2) * wp:(2 * i - 1) * wp, :]
                        vb = res[(2 * i - 1) * wp:(2 * i) * wp, :]
                    v = jnp.maximum(va, vb)
                    m = jnp.maximum(v, _kernel_lane_shift(v, -p_half))
                    p_i = j * (t // 2) + i
                    ok = col_ok & (p_i >= 2) & (p_i <= g2.h + 1)
                    pb[pl.ds(i * wp, wp), :] = jnp.where(
                        ok, m, jnp.bfloat16(0))

                # DMA must read pb AFTER the stores above (same hazard as
                # the zbuf copies). Full-buffer reduction, not a 16-row
                # readback: the masking store above lowers to per-tile
                # stores and the anchor must depend on every one of them
                # (costs ~0.5 us/tile on the VPU; chip-A/B'd neutral).
                anchor = jnp.sum(pb[...].astype(jnp.float32))

                @pl.when(anchor * jnp.float32(0) != jnp.float32(1))
                def _():
                    pcopy(tt, pb).start()

            # slot tt%2 last carried tile tt-2's copy: drain before reuse
            @pl.when((tt >= 3) & (tt % 2 == 0))
            def _():
                pcopy(tt - 2, pb0).wait()

            @pl.when((tt >= 3) & (tt % 2 == 1))
            def _():
                pcopy(tt - 2, pb1).wait()

            @pl.when(tt % 2 == 0)
            def _():
                pool_into(pb0)

            @pl.when(tt % 2 == 1)
            def _():
                pool_into(pb1)

            # hand this tile's last two rows to tile tt+1 (read before
            # write: pool_into consumed the previous tile's carry above)
            carry[...] = res[(t - 2) * wp:, :]

            # rows [jt*(t//2), g2.hp) of each image are hp-rounding pad
            # never produced by any tile: zero them at the image's last
            # tile (zbuf was zeroed at tt == 0 and never rewritten)
            if gap > 0:
                nn = (tt - 1) // jt

                @pl.when(j == jt - 1)
                def _():
                    base = g2.block_rows + (nn * g2.hp
                                            + jt * (t // 2)) * wp
                    zero_dmas(base, gap * wp)

        _with_prefetched_xs(xf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body, haloed=haloed)

    return kernel


def _flat_conv_fwd_impl(zf: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, g_in: FlatGeom, d: int,
                        relu_input: bool, interpret: bool,
                        merged: int = 0,
                        relu_output: bool = False,
                        pool_out: "FlatGeom" = None,
                        src_haloed: bool = False):
    """zf: (rows, c_pad) bf16; kernel: (3, 3, C, D); bias: (D,).

    ``merged``: in-half lane count for pair-packed inputs — kernel must
    then already be the packed (3, 3, 2*hi, 2*ho) layout; the cross-pair
    taps run merged (6 dots instead of 9, see merge_packed_taps).
    ``relu_output``: fuse max(., 0) into the epilogue (free — it rides
    the existing validity-mask where); the post-relu storage mode.
    ``pool_out``: PACKED inputs only — also emit the ceil-mode 2x2/2 max
    pool of the conv output into this natural-layout geometry, computed
    in the epilogue (the packed lane-half/row-pair identity of
    flatpool.pool_packed_fwd_pallas) so the pool never re-reads the
    stage buffer from HBM. Returns (out, pooled); requires even h/w,
    single-lane-tile buffers and a single out-channel tile."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _lane_pad(d)
    d_blk = _pick_out_blk(g_in.t, g_in.wp, c_pad, d_pad,
                          0 if pool_out is None else 1)
    d_tiles = d_pad // d_blk
    if pool_out is not None:
        g2 = pool_out
        assert merged and relu_output, "fused pool needs the packed path"
        assert d_tiles == 1 and d == d_pad == 128 and g2.c_pad == 128, (
            d_tiles, d, d_pad, g2)
        assert g_in.h % 2 == 0 and g_in.t % 2 == 0, (g_in.h, g_in.t)
        assert g2.w == g_in.w and g2.wp == g_in.wp, (g2, g_in)
        assert g2.h == g_in.h // 2 and g2.c <= d_pad // 2, (g2, g_in)
        assert g2.hp >= g_in.jt * (g_in.t // 2), (g2.hp, g_in)
    kp = jnp.pad(kernel.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, c_pad - c), (0, d_pad - d)))
    kp = kp.reshape(9, c_pad, d_pad)
    n_taps = 9
    if merged:
        kp = merge_packed_taps(kp, merged, d // 2)
        n_taps = 6
    bp = jnp.pad(bias.astype(jnp.float32), (0, d_pad - d))[None, :]

    g_out = dataclasses.replace(g_in, c=d)
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    acc_shape = ((3, g_in.block_rows, d_blk) if _SPLIT_ACC
                 else (g_in.block_rows, d_blk))
    scratch = [
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.VMEM(acc_shape, jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    pool = None
    out_shape = jax.ShapeDtypeStruct((g_out.rows, d_pad), jnp.bfloat16)
    out_specs = pl.BlockSpec((g_in.block_rows, d_blk),
                             lambda di, tt: (tt, di),
                             memory_space=pltpu.VMEM)
    if pool_out is not None:
        pool = (g2, d_pad // 2, g2.c)
        t2w = (g_in.t // 2) * g_in.wp
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((g2.rows, 128), jnp.bfloat16))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((t2w, 128), jnp.bfloat16),   # pb0
            pltpu.VMEM((t2w, 128), jnp.bfloat16),   # pb1
            pltpu.VMEM((2 * g_in.wp, 128), jnp.bfloat16),  # carry
            pltpu.VMEM((t2w, 128), jnp.bfloat16),   # zbuf
            pltpu.SemaphoreType.DMA((2,)),          # psem
            pltpu.SemaphoreType.DMA((4,)),          # zsem
        ]
    # merged: one cross-pair operand buffer; unmerged: two out-of-place
    # shifted-tap buffers (barrier-free dots)
    for _ in range(1 if merged else 2):
        scratch.append(pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16))
    out = pl.pallas_call(
        _fwd_kernel(g_in, g_in.h, g_in.w, relu_input, merged, relu_output,
                    pool, src_haloed),
        name=(f"fconv_fwd_c{c}d{d}_h{g_in.h}w{g_in.w}"
              + ("_mrg" if merged else "")
              + ("_pool" if pool_out is not None else "")),
        out_shape=out_shape,
        grid=(d_tiles, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zf stays in HBM
            pl.BlockSpec((n_taps, c_pad, d_blk), lambda di, tt: (0, 0, di),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_blk), lambda di, tt: (0, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
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

    def kernel(gf_hbm, kref, zref, out_ref, xs0, xs1, acc, sem):
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def body(xs, slot=0):
            def taps(kw, first):
                for kh in range(3):
                    d = jax.lax.dot_general(
                        xs[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :],
                        kref[kh * 3 + kw],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if first and kh == 0:
                        acc[...] = d
                    else:
                        acc[...] += d

            taps(1, True)
            _ordered_after(acc[0, 0], lambda: _shift_up_1(xs, (t + 2) * wp))
            taps(2, False)
            _ordered_after(acc[0, 1], lambda: _shift_down_2(xs, (t + 2) * wp))
            taps(0, False)

            # ReLU backward + pad mask in one: z's pads are zero. The
            # compare runs in f32 — Mosaic rejects bf16 comparisons on
            # this target ("Target does not support this comparison").
            zmask = zref[...].astype(jnp.float32) > 0.0
            out_ref[...] = jnp.where(zmask, acc[...],
                                     0.0).astype(out_ref.dtype)

        _with_prefetched_xs(gf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body)

    return kernel


def _flat_conv_dgrad_impl(gf: jnp.ndarray, kernel: jnp.ndarray,
                          zf_in: jnp.ndarray, g_in: FlatGeom, d: int,
                          interpret: bool) -> jnp.ndarray:
    """gf: (rows, d_pad) cotangent of z_out; returns dz_in (rows, c_pad)."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _lane_pad(d)
    o_blk = _pick_out_blk(g_in.t, g_in.wp, d_pad, c_pad, 1)
    o_tiles = c_pad // o_blk
    # dgrad conv kernel: spatial flip + in/out channel swap
    kflip = kernel.astype(jnp.bfloat16)[::-1, ::-1].transpose(0, 1, 3, 2)
    kp = jnp.pad(kflip, ((0, 0), (0, 0), (0, d_pad - d), (0, c_pad - c)))
    kp = kp.reshape(9, d_pad, c_pad)

    g_geom = dataclasses.replace(g_in, c=d)
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    out = pl.pallas_call(
        _dgrad_kernel(g_geom),
        name=f"fconv_dgrad_c{c}d{d}_h{g_in.h}w{g_in.w}",
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
            pltpu.VMEM((xs_rows, d_pad), jnp.bfloat16),
            pltpu.VMEM((g_in.block_rows, o_blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(gf, kp, zf_in)
    return out


# ---------------------------------------------------------------------------
# wgrad kernel: dK[kh,kw] = relu(z_in)^T_shifted @ g_out ; db = colsum(g_out)
# ---------------------------------------------------------------------------


def _wgrad_kernel(g_in: FlatGeom, relu_input: bool, merged: int = 0,
                  src_haloed: bool = False):
    haloed = (g_in.jt, haloed_stride(g_in)) if src_haloed else None
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    last = g_in.total_tiles - 1

    def kernel(xf_hbm, g_ref, out_ref, db_ref, xs0, xs1, sem, *opt_ym):
        tt = pl.program_id(1)
        edge = (tt == 0) | (tt == last)

        @pl.when(tt == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def body(xs, slot=0):
            if relu_input:
                xs[...] = jnp.maximum(xs[...], jnp.bfloat16(0))

            def taps(src, kw, stride=3):
                for kh in range(3):
                    out_ref[kh * stride + kw] += jax.lax.dot_general(
                        src[pl.ds(_LEAD_ROWS + kh * wp, k_rows), :],
                        g_ref[...],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            if merged:
                ym = opt_ym[0]
                _merge_pairs_to(ym, xs, (t + 2) * wp, merged)
                taps(xs, 0, stride=1)  # dense delta=0 taps (out 0..2)
                taps(ym, 3, stride=1)  # merged cross-pair taps (out 3..5)
            else:
                taps(xs, 1)
                _ordered_after(out_ref[7, 0, 0],
                               lambda: _shift_up_1(xs, (t + 2) * wp))
                taps(xs, 2)
                _ordered_after(out_ref[8, 0, 0],
                               lambda: _shift_down_2(xs, (t + 2) * wp))
                taps(xs, 0)

            db_ref[0:1, :] += jnp.sum(g_ref[...].astype(jnp.float32),
                                      axis=0, keepdims=True)

        _with_prefetched_xs(xf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body, haloed=haloed)

    return kernel


def _flat_conv_wgrad_impl(zf: jnp.ndarray, gf: jnp.ndarray, g_in: FlatGeom,
                          d: int, relu_input: bool, interpret: bool,
                          merged: int = 0, src_haloed: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dk (3,3,C,D) f32, db (D,) f32). With ``merged`` (packed
    pair layout), dk is the RAW (6, c_pad, d_pad) tap accumulator —
    decode with ``unpack_dk_merged_rows``."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _lane_pad(d)
    n_taps = 6 if merged else 9
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    # budget: 2x xs halo scratch + double-buffered (taps, c_pad, d_blk) f32
    # result block + double-buffered g blocks <= ~13 MB
    fixed = (2 + bool(merged)) * xs_rows * c_pad * 2
    d_blk = min(d_pad, 128)
    for blk in (512, 256, 128):
        if blk > d_pad or d_pad % blk:
            continue
        tot = (fixed + 2 * n_taps * c_pad * blk * 4
               + 2 * g_in.block_rows * blk * 2)
        if tot <= 13 * 2 ** 20:
            d_blk = blk
            break
    d_tiles = d_pad // d_blk

    scratch = [
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if merged:
        scratch.append(pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16))
    dk, db = pl.pallas_call(
        _wgrad_kernel(g_in, relu_input, merged, src_haloed),
        name=(f"fconv_wgrad_c{c}d{d}_h{g_in.h}w{g_in.w}"
              + ("_mrg" if merged else "")),
        out_shape=(
            jax.ShapeDtypeStruct((n_taps, c_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        grid=(d_tiles, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zf stays in HBM
            pl.BlockSpec((g_in.block_rows, d_blk), lambda di, tt: (tt, di),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_taps, c_pad, d_blk), lambda di, tt: (0, 0, di),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_blk), lambda di, tt: (0, di),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(zf, gf)
    if merged:
        return dk, db[0, :d]
    dk = dk.reshape(3, 3, c_pad, d_pad)[:, :, :c, :d]
    return dk, db[0, :d]


# ---------------------------------------------------------------------------
# fused backward kernel: dz + dK + db in ONE pass over gf/zf
# ---------------------------------------------------------------------------
#
# dgrad and wgrad both sweep the full activation-sized buffers: dgrad DMAs
# gf (shifting it through the three kw phases) and streams zf for the ReLU
# mask; wgrad DMAs zf (shifting it) and streams gf. Run separately that is
# two reads of gf, two reads of zf and two full sets of VPU shift passes.
# The identity dK[kh,kw] = sum_s z[s] * g[s - (kh-1)wp - (kw-1)] lets the
# wgrad taps consume the SAME shifted gf the dgrad taps read: at dgrad
# phase (kh', kw') the xs slice holds g[r + (kh'-1)wp + (kw'-1)], which is
# exactly the wgrad operand for tap (2-kh', 2-kw'). One kernel therefore
# reads gf once, reads zf once (as the pipelined block: wgrad lhs + ReLU
# mask + dz epilogue mask), shifts once, and emits all three cotangents.


def _bwd_fused_kernel(g_in: FlatGeom, relu_input: bool, merged: int = 0,
                      xpose: bool = False, pool_in=None,
                      wide: bool = False, split: bool = False):
    assert not (wide and (merged or pool_in is not None))
    assert not (split and xpose)
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    # pool_in: the cotangent source is the fused conv+pool output — the
    # packed pool BACKWARD (flatpool._pp_bwd_kernel's routing, verbatim)
    # runs in this kernel's PROLOGUE against the conv-output window and
    # the pooled value/cotangent windows, writing gf into the xs slot in
    # place. One extra h-row is DMA'd at the front (pre = wp) so the halo
    # row q = j*t-1 has its pair-top (q-1) available for the tie routing.
    pre = wp if pool_in is not None else 0
    lead = _LEAD_ROWS + pre
    tap_rows = (t + 2) * wp + pre
    xs_rows = _LEAD_ROWS + tap_rows + 32
    last = g_in.total_tiles - 1
    jt1 = g_in.jt
    if pool_in is not None:
        g2, half = pool_in
        assert merged, "pool_in requires the packed (merged-tap) path"
        wp2 = g2.wp
        assert wp2 == wp and t % 2 == 0, (wp2, wp, t)
        w2_rows = (t // 2 + 2) * wp2
        h1, co = g_in.h, g2.c
        w_odd = (2 * g_in.w) % 2 == 1
        last_col = g2.w + 1

    def kernel(*refs):
        if pool_in is not None:
            (gf_hbm, pz_hbm, pg_hbm, kref, zref, dz_ref, dk_ref, db_ref,
             xs0, xs1, acc, sem) = refs[:12]
            rest = refs[12:]
        else:
            (gf_hbm, kref, zref, dz_ref, dk_ref, db_ref,
             xs0, xs1, acc, sem) = refs[:10]
            rest = refs[10:]
        if xpose:
            zt, rest = rest[0], rest[1:]
        else:
            zt = None
        if pool_in is not None:
            zs0, zs1, gs0, gs1, psem = rest[:5]
            opt_ym = rest[5:]
        else:
            opt_ym = rest
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        def pool_copies(tile, slot):
            j = (tile - 1) % jt1
            nimg = (tile - 1) // jt1
            off = pl.multiple_of(
                (g2.t + nimg * g2.hp + (j * t) // 2) * wp2, 16)
            zsb = zs0 if slot == 0 else zs1
            gsb = gs0 if slot == 0 else gs1
            return (
                pltpu.make_async_copy(pz_hbm.at[pl.ds(off, w2_rows)],
                                      zsb, psem.at[0, slot]),
                pltpu.make_async_copy(pg_hbm.at[pl.ds(off, w2_rows)],
                                      gsb, psem.at[1, slot]),
            )

        def route_pool(xs, slot):
            # flatpool._pp_bwd_kernel routing on the window's t+3 h-rows
            # (q = j*t-2 .. j*t+t): reference row-major-first argmax tie
            # order on the packed lane-half / row-pair layout. Rows read
            # their zin (conv output) value first, then are overwritten
            # with the routed cotangent; pairs are (2k, 2k+1) — the extra
            # front row makes the window pair-aligned.
            zsb = zs0 if slot == 0 else zs1
            gsb = gs0 if slot == 0 else gs1
            j = (tt - 1) % jt1
            ss = jax.lax.broadcasted_iota(jnp.int32, (wp2, 1), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (wp2, 128), 1)
            is_hi = (lane >= half) & (lane < 2 * half)
            ch_ok = (((lane % half) < co) if half > co
                     else (lane < 2 * half))
            col_ok = ((ss >= 2) & (ss <= last_col) & ch_ok
                      & (lane < 2 * half))
            if w_odd:
                col_ok = col_ok & ~(is_hi & (ss == last_col))
            is_hif = is_hi.astype(jnp.float32)
            for k in range(t // 2 + 2):
                zo = zsb[pl.ds(k * wp2, wp2), :]
                go = gsb[pl.ds(k * wp2, wp2), :]
                e_z = zo + _kernel_lane_shift(zo, half)
                e_g = (go + _kernel_lane_shift(go, half)).astype(jnp.float32)
                rows = ((2 * k, 2 * k + 1) if 2 * k + 1 <= t + 2
                        else (2 * k,))
                zin_rows = [xs[pl.ds(_LEAD_ROWS + r * wp, wp2), :]
                            for r in rows]
                m_top = None
                outs = []
                for idx, r in enumerate(rows):
                    q = j * t - 2 + r
                    m_eq = jnp.where(
                        col_ok & (zin_rows[idx].astype(jnp.float32)
                                  == e_z.astype(jnp.float32)),
                        jnp.float32(1), jnp.float32(0))
                    partner = pltpu.roll(m_eq, half, axis=1)
                    if idx == 0:
                        route = m_eq * (1.0 - is_hif * partner)
                        m_top = m_eq
                    else:
                        any_top = jnp.maximum(
                            m_top,
                            jnp.maximum(
                                pltpu.roll(m_top, half, axis=1),
                                pltpu.roll(m_top, (-half) % 128, axis=1)))
                        route = (m_eq * (1.0 - any_top)
                                 * (1.0 - is_hif * partner))
                    row_ok = ((q >= 2) & (q <= h1 + 1)).astype(jnp.float32)
                    outs.append((e_g * route * row_ok).astype(xs.dtype))
                for idx, r in enumerate(rows):
                    xs[pl.ds(_LEAD_ROWS + r * wp, wp2), :] = outs[idx]

        @pl.when(tt == 0)
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(edge)
        def _():
            dz_ref[...] = jnp.zeros_like(dz_ref)

        def body(xs, slot=0):
            if pool_in is not None:
                route_pool(xs, slot)
            if relu_input:
                zref[...] = jnp.maximum(zref[...], jnp.bfloat16(0))
            if xpose:
                # transpose the SHARED wgrad operand ONCE per tile; the
                # tap dots below then run in the MXU-native orientation
                # instead of paying Mosaic's per-dot operand transpose
                zt[...] = zref[...].T

            def phase(src, kidx, widx, first, stride=3,
                      do_dgrad=True, do_wgrad=True):
                for kh in range(3):
                    if not do_dgrad:
                        break
                    if _BWD_ABLATE == "nodgrad":
                        if first and kh == 0:
                            acc[...] = jnp.zeros_like(acc)
                        break
                    d = jax.lax.dot_general(
                        src[pl.ds(lead + kh * wp, k_rows), :],
                        kref[kh * stride + kidx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if first and kh == 0:
                        acc[...] = d
                    else:
                        acc[...] += d
                if _BWD_ABLATE == "nowgrad" or not do_wgrad:
                    return
                for kh in range(3):
                    if xpose:
                        dk_ref[(2 - kh) * stride + widx] += (
                            jax.lax.dot_general(
                                zt[...],
                                src[pl.ds(lead + kh * wp, k_rows), :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
                    elif split:
                        for ci in range(g_in.c_pad // 128):
                            dk_ref[(2 - kh) * stride + widx,
                                   pl.ds(ci * 128, 128), :] += (
                                jax.lax.dot_general(
                                    zref[:, pl.ds(ci * 128, 128)],
                                    src[pl.ds(lead + kh * wp, k_rows), :],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32))
                    else:
                        dk_ref[(2 - kh) * stride + widx] += (
                            jax.lax.dot_general(
                                zref[...],
                                src[pl.ds(lead + kh * wp, k_rows), :],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))

            if merged:
                ym = opt_ym[0]
                _merge_pairs_to(ym, xs, tap_rows, merged)
                phase(xs, 0, 0, True, stride=1)   # dense taps
                phase(ym, 3, 3, False, stride=1)  # merged cross-pair taps
            elif wide:
                # lane-stacked wide operand [xs | ym+1 | ym-1]: dgrad
                # reads its 128-multiple lane blocks (dense block from
                # the pristine xs window, as before), wgrad runs ONE
                # 3x-wide rows-contraction per kh into the (3, c_pad,
                # 3*d_pad) accumulator — decoded by the impl
                (gw,) = opt_ym
                dw = gw.shape[-1] // 3
                if _BWD_ABLATE != "noshift":
                    _copy_shifted(gw, xs, tap_rows, 0, lane_off=0)
                    _copy_shifted(gw, xs, tap_rows, 1, lane_off=dw)
                    _copy_shifted(gw, xs, tap_rows, -1, lane_off=2 * dw)
                first = True
                for kh in range(3):
                    if _BWD_ABLATE == "nodgrad":
                        acc[...] = jnp.zeros_like(acc)
                        break
                    for blk, kidx in ((None, 1), (1, 2), (2, 0)):
                        src = (xs[pl.ds(lead + kh * wp, k_rows), :]
                               if blk is None else
                               gw[pl.ds(lead + kh * wp, k_rows),
                                  pl.ds(blk * dw, dw)])
                        dd = jax.lax.dot_general(
                            src, kref[kh * 3 + kidx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        if first:
                            acc[...] = dd
                            first = False
                        else:
                            acc[...] += dd
                if _BWD_ABLATE != "nowgrad":
                    for kh in range(3):
                        srcw = gw[pl.ds(lead + kh * wp, k_rows), :]
                        if xpose:
                            dk_ref[kh] += jax.lax.dot_general(
                                zt[...], srcw, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            dk_ref[kh] += jax.lax.dot_general(
                                zref[...], srcw, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            else:
                ym1, ym2 = opt_ym
                if _BWD_ABLATE != "noshift":
                    _copy_shifted(ym1, xs, tap_rows, 1)
                    _copy_shifted(ym2, xs, tap_rows, -1)
                if _BWD_GROUPED:
                    phase(xs, 1, 1, True, do_wgrad=False)
                    phase(ym1, 2, 0, False, do_wgrad=False)
                    phase(ym2, 0, 2, False, do_wgrad=False)
                    phase(xs, 1, 1, False, do_dgrad=False)
                    phase(ym1, 2, 0, False, do_dgrad=False)
                    phase(ym2, 0, 2, False, do_dgrad=False)
                else:
                    phase(xs, 1, 1, True)
                    phase(ym1, 2, 0, False)
                    phase(ym2, 0, 2, False)
            if _BWD_ABLATE != "nodb":
                db_ref[0:1, :] += jnp.sum(
                    xs[pl.ds(lead + wp, k_rows), :].astype(jnp.float32),
                    axis=0, keepdims=True)

            if _BWD_ABLATE == "noepi":
                dz_ref[...] = acc[...].astype(dz_ref.dtype)
                return
            # ReLU backward + pad mask (zref holds relu(z); z pads are 0)
            zmask = zref[...].astype(jnp.float32) > 0.0
            dz_ref[...] = jnp.where(zmask, acc[...],
                                    0.0).astype(dz_ref.dtype)

        _with_prefetched_xs(gf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body, pre_rows=pre,
                            extra_copies=(pool_copies
                                          if pool_in is not None else None))

    return kernel


def _flat_conv_bwd_fused_impl(zf: jnp.ndarray, gf: jnp.ndarray,
                              kernel: jnp.ndarray, g_in: FlatGeom, d: int,
                              relu_input: bool, interpret: bool,
                              merged: int = 0, pool_in=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """One-pass backward: returns (dz (rows, c_pad) bf16, dk, db (D,) f32).
    Equal to dgrad+wgrad run separately (tested both against them and
    against the XLA twin's autodiff, tests/test_flat.py).

    Unmerged, dk is the unpadded (3, 3, C, D) f32. With ``merged`` (packed
    pair layout; kernel must be the packed (3,3,2hi,2ho) weights), dk is
    the RAW (6, c_pad, d_pad) tap accumulator — decode with
    ``unpack_dk_merged_cols``.

    ``pool_in`` = (zout, pooled, d_pooled_bf16, g2): the conv output fed a
    fused 2x2/2 ceil-mode pool (packed_conv_pool) and ``gf`` is IGNORED —
    the pool backward's argmax routing runs in this kernel's prologue
    against zout/pooled windows (one kernel instead of pool-bwd + conv-bwd;
    the full-buffer gf write + re-read and the pool kernel's zout re-read
    all disappear)."""
    c, c_pad = g_in.c, g_in.c_pad
    d_pad = _lane_pad(d)
    kflip = kernel.astype(jnp.bfloat16)[::-1, ::-1].transpose(0, 1, 3, 2)
    kp = jnp.pad(kflip, ((0, 0), (0, 0), (0, d_pad - d), (0, c_pad - c)))
    kp = kp.reshape(9, d_pad, c_pad)
    n_taps = 9
    if merged:
        kp = merge_packed_taps(kp, d // 2, merged)
        n_taps = 6

    pre = g_in.wp if pool_in is not None else 0
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32 + pre
    # once-per-tile transposed z for MXU-native wgrad dots: a win only on
    # wide-lane operands (bench_wgrad_orient: ~+18% at 512 lanes, neutral
    # at 256, a small LOSS at 128 where rows-contraction is already fine)
    xpose = _WGRAD_XPOSE and c_pad >= _WGRAD_XPOSE_MIN
    wide = (_WGRAD_WIDE and not merged and pool_in is None
            and _WGRAD_WIDE_MIN <= c_pad <= _WGRAD_WIDE_MAX)
    # per-128-lane-tile wgrad dots (bit-identical numerics; targets the
    # c_pad=256 stages where the single wide rows-contraction measures
    # ~49% of SoL — see _WGRAD_SPLIT)
    split = _WGRAD_SPLIT and not xpose and not wide and c_pad > 128
    scratch = [
        pltpu.VMEM((xs_rows, d_pad), jnp.bfloat16),
        pltpu.VMEM((xs_rows, d_pad), jnp.bfloat16),
        pltpu.VMEM((g_in.block_rows, c_pad), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if xpose:
        scratch.append(pltpu.VMEM((c_pad, g_in.block_rows), jnp.bfloat16))
    kernel_pool = None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # gf / zout stays in HBM
        pl.BlockSpec((n_taps, d_pad, c_pad), lambda tt: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g_in.block_rows, c_pad), lambda tt: (tt, 0),
                     memory_space=pltpu.VMEM),
    ]
    if pool_in is not None:
        zout, pooled, d_pooled, g2 = pool_in
        assert merged and d == d_pad == 128, (merged, d, d_pad)
        assert g2.wp == g_in.wp and g_in.t % 2 == 0, (g2, g_in)
        assert g2.c_pad == 128 and g2.c <= d // 2, g2
        kernel_pool = (g2, d // 2)
        w2_rows = (g_in.t // 2 + 2) * g2.wp
        # pooled value/cotangent windows ride the same double-buffered
        # slot schedule as the zout windows (extra_copies)
        scratch += [
            pltpu.VMEM((w2_rows, 128), jnp.bfloat16),   # zs0
            pltpu.VMEM((w2_rows, 128), jnp.bfloat16),   # zs1
            pltpu.VMEM((w2_rows, 128), jnp.bfloat16),   # gs0
            pltpu.VMEM((w2_rows, 128), jnp.bfloat16),   # gs1
            pltpu.SemaphoreType.DMA((2, 2)),            # psem
        ]
        in_specs = ([in_specs[0],
                     pl.BlockSpec(memory_space=pl.ANY),   # pooled z
                     pl.BlockSpec(memory_space=pl.ANY)]   # pooled ct
                    + in_specs[1:])
        operands = (zout, pooled, d_pooled, kp, zf)
    else:
        operands = (gf, kp, zf)
    # merged: one cross-pair operand buffer; unmerged: two out-of-place
    # shifted-tap buffers (barrier-free dots); wide: ONE lane-stacked
    # [xs | ym+1 | ym-1] buffer (see _WGRAD_WIDE)
    if wide:
        scratch.append(pltpu.VMEM((xs_rows, 3 * d_pad), jnp.bfloat16))
    else:
        for _ in range(1 if merged else 2):
            scratch.append(pltpu.VMEM((xs_rows, d_pad), jnp.bfloat16))
    dk_shape = ((3, c_pad, 3 * d_pad) if wide
                else (n_taps, c_pad, d_pad))
    dz, dk, db = pl.pallas_call(
        _bwd_fused_kernel(g_in, relu_input, merged, xpose, kernel_pool,
                          wide, split),
        name=(f"fconv_bwd_c{c}d{d}_h{g_in.h}w{g_in.w}"
              + ("_mrg" if merged else "") + ("_xp" if xpose else "")
              + ("_w" if wide else "") + ("_sp" if split else "")
              + ("_pool" if pool_in is not None else "")),
        out_shape=(
            jax.ShapeDtypeStruct((g_in.rows, c_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct(dk_shape, jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        grid=(g_in.total_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g_in.block_rows, c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(dk_shape, lambda tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_pad), lambda tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*operands)
    if merged:
        return dz, dk, db[0, :d]
    if wide:
        # decode the (3, c_pad, 3*d_pad) wide accumulator back to the
        # 9-tap order: lane block 0 = xs (widx 1), 1 = ym+1 (widx 0),
        # 2 = ym-1 (widx 2), rows flipped like the per-dot form
        blocks = {1: dk[:, :, 0:d_pad], 0: dk[:, :, d_pad:2 * d_pad],
                  2: dk[:, :, 2 * d_pad:3 * d_pad]}
        dk = jnp.stack([blocks[t9 % 3][2 - t9 // 3] for t9 in range(9)])
    dk = dk.reshape(3, 3, c_pad, d_pad)[:, :, :c, :d]
    return dz, dk, db[0, :d]


_USE_FUSED_BWD = True  # separate dgrad/wgrad kept for A/B + fallback


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flat_conv3x3(zf, kernel, bias, g_in: FlatGeom, relu_input: bool = True,
                 interpret: bool = False, relu_output: bool = False):
    """relu?(conv3x3(relu?(z_in)) + bias) in flat layout.

    Two storage conventions, both tested against the XLA twin:
    - relu_input=True (legacy): zf holds PRE-activation z; the kernel
      applies the ReLU to its input internally.
    - relu_input=False: zf holds POST-relu activations (the producer
      fused max(., 0) into its epilogue via relu_output=True). This
      skips the consumer-side ReLU prologue pass; the backward is
      UNCHANGED — the dz epilogue's (input > 0) mask is exactly the
      producer's ReLU backward (on post-relu values, input>0 <=> z>0),
      so the mask each consumer already applies routes the chain
      correctly, including through pools (a zero-max window's cotangent
      is killed by the downstream consumer before the pool routes it).

    kernel: (3, 3, C, D) float32 params; bias: (D,).
    Returns the (rows, d_pad) bf16 flat buffer of the NEXT geometry
    (same n/h/w/t, c=D). Matches nn.Conv(3x3, SAME) + ReLU chains
    (reference make_layers_osvos, networks/vgg_osvos.py:~120); bf16
    rounding commutes with ReLU, so either convention composes to the
    same values as the 'fast' path.
    """
    return _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                               relu_input, interpret,
                               relu_output=relu_output)


def _fc_fwd(zf, kernel, bias, g_in, relu_input, interpret, relu_output):
    out = _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                              relu_input, interpret,
                              relu_output=relu_output)
    return out, (zf, kernel)


def _fc_bwd(g_in, relu_input, interpret, relu_output, res, gf):
    zf, kernel = res
    d = kernel.shape[-1]
    # Head-adjacent convs (side_prep) receive an f32 cotangent; bias
    # gradients are cancellation-heavy, so sum that one in f32 in XLA
    # rather than through the kernel's (bf16-input) fused column-sum —
    # matches the 'fast' path's precision. Trunk cotangents arrive bf16
    # already and keep the free in-kernel db.
    db_f32 = None
    if gf.dtype != jnp.bfloat16:
        db_f32 = jnp.sum(gf.astype(jnp.float32), axis=0)[:d]
        gf = gf.astype(jnp.bfloat16)
    if _USE_FUSED_BWD:
        dz, dk, db = _flat_conv_bwd_fused_impl(zf, gf, kernel, g_in, d,
                                               relu_input, interpret)
    else:
        dz = _flat_conv_dgrad_impl(gf, kernel, zf, g_in, d, interpret)
        dk, db = _flat_conv_wgrad_impl(zf, gf, g_in, d, relu_input,
                                       interpret)
    if db_f32 is not None:
        db = db_f32
    return dz, dk.astype(kernel.dtype), db.astype(jnp.float32)


flat_conv3x3.defvjp(_fc_fwd, _fc_bwd)


# ---------------------------------------------------------------------------
# tap-stacked side backward kernel: dz + dK + db for narrow-d convs
# ---------------------------------------------------------------------------
#
# A D=16-channel side conv pays the full row-streams x 9 taps x lane-tiles
# price in each backward pass for 12.5% lane utility. Its cotangent buffer
# is zero beyond lane D, so all nine taps stack into TWO 128-lane operands
# built with plain lane-rolls (rolled garbage is zero!):
#   G01[s, 16t + d] = gf[s - off_t, d]   (taps 0..7)
#   G2 [s,       d] = gf[s - off_8, d]   (tap 8)
# and both gradients become 2-stream dots instead of 9:
#   dz  = G01 @ KS01 + G2 @ KS2          (KS[16t+d, c] = K[kh, kw, c, d])
#   dK[kh, kw, c, d] = (zf^T @ G01)[c, 16t + d]   (t=8 from G2)
# The XLA formulation of the same identity was measured SLOWER (it
# materializes the shift-concat + re-pad as full passes, see
# flat_side_conv3x3's docstring) — in-kernel the stack build rides the VPU
# under the dots.


def _stem_wgrad_kernel(g_in: FlatGeom, width: int):
    """Tap-stacked STEM weight gradient: the packed image buffer has only
    ``width`` = 2*_half_pad(3) = 8 real lanes, so all nine taps fit in ONE
    128-lane stacked operand X[s, width*t + c] = img[s + off_t, c] (built
    with lane-rolls; zero lanes beyond width make the rolled values
    disjoint) and dKp for every tap is one rows-contraction dot
    dK[width*t + c, dd] = sum_s X[s, ...] gf[s, dd] — 1 MXU stream per
    tile instead of the merged kernel's 6. No input ReLU (it is the
    image), no dz (images are never differentiated)."""
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    last = g_in.total_tiles - 1
    assert 9 * width <= 128, width

    def kernel(zf_hbm, g_ref, dk_ref, db_ref, xs0, xs1, stk, sem):
        tt = pl.program_id(1)

        @pl.when(tt == 0)
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        def body(xs, slot=0):
            n_sh = k_rows // 2
            ch = _round_up(-(-n_sh // 8), 8)
            for a in range(8, 8 + n_sh, ch):
                b = min(a + ch, 8 + n_sh)
                acc = None
                for tap, (kh, kw) in enumerate(
                        (kh, kw) for kh in range(3) for kw in range(3)):
                    base = 2 * (a - 8) + kh * wp
                    w = pltpu.bitcast(
                        xs[pl.ds(base, 2 * (b - a) + 18), :], jnp.uint32)
                    if kw == 2:
                        v = (w[8:8 + (b - a)] >> 16) | (w[9:9 + (b - a)]
                                                        << 16)
                    elif kw == 0:
                        v = (w[7:7 + (b - a)] >> 16) | (w[8:8 + (b - a)]
                                                        << 16)
                    else:
                        v = w[8:8 + (b - a)]
                    if tap:
                        v = pltpu.roll(v, tap * width, axis=1)
                    acc = v if acc is None else acc | v
                stk[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
                    acc, jnp.bfloat16)

            dk_ref[...] += jax.lax.dot_general(
                stk[pl.ds(_LEAD_ROWS, k_rows), :], g_ref[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[0:1, :] += jnp.sum(g_ref[...].astype(jnp.float32),
                                      axis=0, keepdims=True)

        _with_prefetched_xs(zf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows,
                            last, body)

    return kernel


def _stem_wgrad_stacked_impl(zfp, gf, g_in: FlatGeom, d_pad: int,
                             width: int, interpret: bool):
    """Returns (dk_stack (128, d_pad) f32 — rows width*t + c hold the
    packed tap matrices, decode via reshape + unpack_dk — and
    db (8, d_pad) f32)."""
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    dk, db = pl.pallas_call(
        _stem_wgrad_kernel(g_in, width),
        name=f"stem_wgrad_h{g_in.h}w{g_in.w}",
        out_shape=(
            jax.ShapeDtypeStruct((128, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, d_pad), jnp.float32),
        ),
        grid=(1, g_in.total_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed image, HBM
            pl.BlockSpec((g_in.block_rows, d_pad), lambda di, tt: (tt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((128, d_pad), lambda di, tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d_pad), lambda di, tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, g_in.c_pad), jnp.bfloat16),
            pltpu.VMEM((xs_rows, g_in.c_pad), jnp.bfloat16),
            pltpu.VMEM((xs_rows, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zfp, gf)
    return dk, db


def _side_bwd_kernel(g_in: FlatGeom, d: int, with_extra: bool = False,
                     src_haloed: bool = False, pool_out: FlatGeom = None):
    haloed = (g_in.jt, haloed_stride(g_in)) if src_haloed else None
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32
    jt1, last = g_in.jt, g_in.total_tiles - 1
    ls = _side_lane_stride(d)
    assert 8 * ls <= 128 and d <= ls, d
    assert not (with_extra and pool_out is not None)
    if pool_out is not None:
        # fused stage-boundary pool backward (see _sap_bwd): the argmax
        # routing of flatpool._bwd_kernel runs in this kernel's epilogue
        # against the ALREADY-STREAMED zref tile, and the routed rows add
        # into dz as they are written
        pg = pool_out
        wp2 = pg.wp
        w2_rows = (t // 2 + 2) * wp2
        h1, w1 = g_in.h, g_in.w

    def kernel(gf_hbm, *rest):
        # kw3: ONE stacked (3, 128, c_pad) weights ref, one G3 stack
        # buffer, one (3, c_pad, 128) dk accumulator (no ks2/g2/dk2)
        if _SIDE_KW3:
            ks01_ref, zref = rest[0], rest[1]
            ks2_ref = None
            rest = rest[2:]
        else:
            ks01_ref, ks2_ref, zref = rest[0], rest[1], rest[2]
            rest = rest[3:]
        extra_ref = None
        if with_extra:
            # pre-merged second cotangent (the pool-backward's dz): the
            # stage-boundary dz_side + dz_pool add rides this kernel's
            # epilogue instead of a separate full-buffer XLA add
            extra_ref, rest = rest[0], rest[1:]
        elif pool_out is not None:
            zout_hbm, gout_hbm = rest[0], rest[1]
            rest = rest[2:]
        if _SIDE_KW3:
            (dz_ref, dk01_ref, db_ref, xs0, xs1, g01, acc, sem) = rest[:8]
            dk2_ref = g2 = None
            rest = rest[8:]
        else:
            (dz_ref, dk01_ref, dk2_ref, db_ref,
             xs0, xs1, g01, g2, acc, sem) = rest[:10]
            rest = rest[10:]
        if pool_out is not None:
            zs0, zs1, gs0, gs1, psem = rest
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        def pool_copies(tile, slot):
            j = (tile - 1) % jt1
            nimg = (tile - 1) // jt1
            off = pl.multiple_of(
                (pg.t + nimg * pg.hp + (j * t) // 2) * wp2, 16)
            zsb = zs0 if slot == 0 else zs1
            gsb = gs0 if slot == 0 else gs1
            return (
                pltpu.make_async_copy(zout_hbm.at[pl.ds(off, w2_rows)],
                                      zsb, psem.at[0, slot]),
                pltpu.make_async_copy(gout_hbm.at[pl.ds(off, w2_rows)],
                                      gsb, psem.at[1, slot]),
            )

        @pl.when(tt == 0)
        def _():
            dk01_ref[...] = jnp.zeros_like(dk01_ref)
            if dk2_ref is not None:
                dk2_ref[...] = jnp.zeros_like(dk2_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(edge)
        def _():
            dz_ref[...] = jnp.zeros_like(dz_ref)

        def body(xs, slot=0):
            if _SIDE_KW3:
                # kw-only stack over the EXTENDED row range [0,
                # (t+2)*wp): G3[g, ls*kw + dd] = gfwin[g + 16 + kw - 1];
                # the kh offsets become plain row-offset dot reads below
                # (3 accumulating dgrad dots + 3 wgrad rows-contractions
                # instead of 2+2, for a 3x-smaller VPU stack build)
                n3 = -(-((t + 2) * wp) // 2)
                ch = _round_up(-(-n3 // 8), 8)
                for a in range(0, n3, ch):
                    b = min(a + ch, n3)
                    acc01 = None
                    w = pltpu.bitcast(
                        xs[pl.ds(2 * a, 2 * (b - a) + 18), :], jnp.uint32)
                    for kw in range(3):
                        if kw == 2:
                            v = (w[8:8 + (b - a)] >> 16
                                 ) | (w[9:9 + (b - a)] << 16)
                        elif kw == 0:
                            v = (w[7:7 + (b - a)] >> 16
                                 ) | (w[8:8 + (b - a)] << 16)
                        else:
                            v = w[8:8 + (b - a)]
                        if kw:
                            v = pltpu.roll(v, kw * ls, axis=1)
                        acc01 = v if acc01 is None else acc01 | v
                    g01[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
                        acc01, jnp.bfloat16)

                for kh in range(3):
                    sl = pl.ds(kh * wp, k_rows)
                    dd = jax.lax.dot_general(
                        g01[sl, :], ks01_ref[kh], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if kh == 0:
                        acc[...] = dd
                    else:
                        acc[...] += dd
                    dk01_ref[kh] += jax.lax.dot_general(
                        zref[...], g01[sl, :], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                db_ref[0:1, :] += jnp.sum(
                    xs[pl.ds(_LEAD_ROWS + wp, k_rows), :].astype(
                        jnp.float32), axis=0, keepdims=True)
                return _epilogue(xs, slot)

            # build the stacked operands chunkwise over the tile's own
            # k_rows: G row (16 + j) at stack slot ``tap`` holds
            # gf[j + (kh-1)*wp + (kw-1)] — the SAME +off reads as the fwd
            # taps; the flip that turns them into the dgrad's -off lives
            # in the weight stack (KS built from the flipped kernel) and
            # the tap-reversed dK unpack, exactly like the fused kernel's
            # kflip + inverted indices. The +-1 row reads ride the u32
            # sublane-pair tricks; lane placement is a roll (zero lanes
            # beyond d make the rolled values disjoint, so OR merges).
            n_sh = k_rows // 2
            ch = _round_up(-(-n_sh // 8), 8)
            for a in range(8, 8 + n_sh, ch):
                b = min(a + ch, 8 + n_sh)
                acc01 = None
                acc2 = None
                for kh in range(3):
                    base = 2 * (a - 8) + kh * wp
                    # one window load per kh (the three kw taps slice the
                    # same u32 window) — see the fwd collapse loop
                    w = pltpu.bitcast(
                        xs[pl.ds(base, 2 * (b - a) + 18), :], jnp.uint32)
                    for kw in range(3):
                        tap = 3 * kh + kw
                        if kw == 2:
                            v = (w[8:8 + (b - a)] >> 16
                                 ) | (w[9:9 + (b - a)] << 16)
                        elif kw == 0:
                            v = (w[7:7 + (b - a)] >> 16
                                 ) | (w[8:8 + (b - a)] << 16)
                        else:
                            v = w[8:8 + (b - a)]
                        if tap == 8:
                            acc2 = v
                        else:
                            rolled = pltpu.roll(v, tap * ls, axis=1)
                            acc01 = (rolled if acc01 is None
                                     else acc01 | rolled)
                g01[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
                    acc01, jnp.bfloat16)
                g2[pl.ds(2 * a, 2 * (b - a)), :] = pltpu.bitcast(
                    acc2, jnp.bfloat16)

            sl = pl.ds(_LEAD_ROWS, k_rows)
            acc[...] = jax.lax.dot_general(
                g01[sl, :], ks01_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc[...] += jax.lax.dot_general(
                g2[sl, :], ks2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk01_ref[...] += jax.lax.dot_general(
                zref[...], g01[sl, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk2_ref[...] += jax.lax.dot_general(
                zref[...], g2[sl, :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db_ref[0:1, :] += jnp.sum(
                xs[pl.ds(_LEAD_ROWS + wp, k_rows), :].astype(jnp.float32),
                axis=0, keepdims=True)
            return _epilogue(xs, slot)

        def _epilogue(xs, slot):

            zmask = zref[...].astype(jnp.float32) > 0.0
            dz = jnp.where(zmask, acc[...], 0.0)
            if with_extra:
                dz = dz + extra_ref[...].astype(jnp.float32)
            if pool_out is None:
                dz_ref[...] = dz.astype(dz_ref.dtype)
                return

            # fused pool backward: flatpool._bwd_kernel's routing verbatim
            # (reference row-major-first argmax tie order), with the
            # stage activation coming from the already-resident zref tile
            # and the routed rows ADDED into dz as each pair is written
            zsb = zs0 if slot == 0 else zs1
            gsb = gs0 if slot == 0 else gs1
            jj = (tt - 1) % jt1
            _shift_up2_inplace(zsb, w2_rows - 2)
            _shift_up2_inplace(gsb, w2_rows - 2)

            ca = jax.lax.broadcasted_iota(jnp.int32, (wp, 1), 0)
            col_valid = ((ca >= 2) & (ca <= w1 + 1)).astype(jnp.float32)
            col_odd = (ca % 2 == 1).astype(jnp.float32)

            def expand(row):
                inter = jnp.stack([row, row], axis=1)
                inter = inter.reshape(2 * wp2, row.shape[-1])
                return _roll2_bf16(inter[:wp, :])

            for k in range(t // 2):
                lo_r = k + 1
                zo = zsb[pl.ds(lo_r * wp2, wp2), :]
                go = gsb[pl.ds(lo_r * wp2, wp2), :]
                e_z = expand(zo)
                e_g = expand(go).astype(jnp.float32)

                m_top_bits_prev = None
                for r in (2 * k, 2 * k + 1):
                    zin_row = zref[pl.ds(r * wp, wp), :]
                    m_eq = (zin_row.astype(jnp.float32)
                            == e_z.astype(jnp.float32)).astype(jnp.float32)
                    m_bits = pltpu.bitcast(m_eq.astype(jnp.bfloat16),
                                           jnp.uint32)
                    prev_even = pltpu.bitcast(_dup_lo(m_bits), jnp.bfloat16
                                              ).astype(jnp.float32)
                    if r % 2 == 0:
                        route = m_eq * (1.0 - col_odd * prev_even)
                        m_top_bits_prev = m_bits
                    else:
                        any_top = pltpu.bitcast(
                            _dup_lo(m_top_bits_prev)
                            | _dup_hi(m_top_bits_prev),
                            jnp.bfloat16).astype(jnp.float32)
                        route = (m_eq * (1.0 - any_top)
                                 * (1.0 - col_odd * prev_even))
                    q = jj * t + r
                    row_ok = ((q >= 2) & (q <= h1 + 1)).astype(jnp.float32)
                    prow = e_g * route * col_valid * row_ok
                    dz_ref[pl.ds(r * wp, wp), :] = (
                        dz[r * wp:(r + 1) * wp] + prow).astype(dz_ref.dtype)

        _with_prefetched_xs(gf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body, haloed=haloed,
                            extra_copies=(pool_copies
                                          if pool_out is not None else None))

    return kernel


def _flat_side_bwd_impl(zf, gf, kernel, g_in: FlatGeom, interpret: bool,
                        extra=None, src_haloed: bool = False, pool=None):
    """Tap-stacked backward for a narrow-d flat conv. gf: the flat
    (rows, 128) cotangent buffer with zeros beyond lane d (haloed-core
    layout when ``src_haloed``). ``extra``: optional second dz
    contribution (same flat geometry) summed into the output in the
    epilogue. ``pool``: (g_out, pooled_values, pooled_cotangent) — fuse
    the stage-boundary pool BACKWARD into this kernel's epilogue (the
    routed pool cotangent adds into dz; replaces extra). Returns
    (dz (rows, c_pad) bf16, dk (3,3,C,D) f32, db (D,) f32)."""
    c, c_pad = g_in.c, g_in.c_pad
    d = kernel.shape[-1]
    pool_g = None
    if pool is not None:
        assert extra is None
        pool_g, zout, gout = pool
        assert pool_g.c_pad == c_pad and 2 * pool_g.wp >= g_in.wp, (
            pool_g, g_in)
        assert g_in.t % 2 == 0, g_in
        w2_rows = (g_in.t // 2 + 2) * pool_g.wp
    # G slot ``tap`` reads gf at +off_tap, so the dgrad stack holds the
    # FLIPPED kernel: KS[ls*tap + dd, cc] = K[2-kh, 2-kw, cc, dd] (taps
    # at lane stride ls — see _side_lane_stride)
    d_ls = _side_lane_stride(d)
    k9 = jnp.pad(kernel.astype(jnp.bfloat16)[::-1, ::-1].transpose(
        0, 1, 3, 2).reshape(9, d, c),
        ((0, 0), (0, d_ls - d), (0, c_pad - c)))
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32
    if _SIDE_KW3:
        # ONE (3, 128, c_pad) stack: ks3[kh][ls*kw + dd, cc]
        ks3 = jnp.pad(k9.reshape(3, 3 * d_ls, c_pad),
                      ((0, 0), (0, 128 - 3 * d_ls), (0, 0)))
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # gf stays in HBM
            pl.BlockSpec((3, 128, c_pad), lambda tt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_in.block_rows, c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [gf, ks3, zf]
    else:
        ks01 = jnp.pad(k9[:8].reshape(8 * d_ls, c_pad),
                       ((0, 128 - 8 * d_ls), (0, 0)))
        ks2 = jnp.pad(k9[8], ((0, 128 - d_ls), (0, 0)))
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # gf stays in HBM
            pl.BlockSpec((128, c_pad), lambda tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, c_pad), lambda tt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_in.block_rows, c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [gf, ks01, ks2, zf]
    if extra is not None:
        in_specs.append(pl.BlockSpec((g_in.block_rows, c_pad),
                                     lambda tt: (tt, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(extra)
    if pool is not None:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # pooled values
                     pl.BlockSpec(memory_space=pl.ANY)]   # pooled cotangent
        operands += [zout, gout]
    if _SIDE_KW3:
        dk_shapes = (jax.ShapeDtypeStruct((3, c_pad, 128), jnp.float32),)
        dk_specs = (pl.BlockSpec((3, c_pad, 128), lambda tt: (0, 0, 0),
                                 memory_space=pltpu.VMEM),)
        g_bufs = [pltpu.VMEM((xs_rows, 128), jnp.bfloat16)]
    else:
        dk_shapes = (jax.ShapeDtypeStruct((c_pad, 128), jnp.float32),
                     jax.ShapeDtypeStruct((c_pad, 128), jnp.float32))
        dk_specs = (pl.BlockSpec((c_pad, 128), lambda tt: (0, 0),
                                 memory_space=pltpu.VMEM),) * 2
        g_bufs = [pltpu.VMEM((xs_rows, 128), jnp.bfloat16),
                  pltpu.VMEM((xs_rows, 128), jnp.bfloat16)]
    dz, *dks, db = pl.pallas_call(
        _side_bwd_kernel(g_in, d, with_extra=extra is not None,
                         src_haloed=src_haloed, pool_out=pool_g),
        name=(f"side_bwd_c{g_in.c}_h{g_in.h}w{g_in.w}"
              + ("_xtra" if extra is not None else "")
              + ("_pool" if pool_g is not None else "")),
        out_shape=(
            jax.ShapeDtypeStruct((g_in.rows, c_pad), jnp.bfloat16),
        ) + dk_shapes + (
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        grid=(g_in.total_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g_in.block_rows, c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),
        ) + dk_specs + (
            pl.BlockSpec((8, 128), lambda tt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, 128), jnp.bfloat16),
            pltpu.VMEM((xs_rows, 128), jnp.bfloat16),
        ] + g_bufs + [
            pltpu.VMEM((g_in.block_rows, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([
            pltpu.VMEM((w2_rows, c_pad), jnp.bfloat16),   # zs0
            pltpu.VMEM((w2_rows, c_pad), jnp.bfloat16),   # zs1
            pltpu.VMEM((w2_rows, c_pad), jnp.bfloat16),   # gs0
            pltpu.VMEM((w2_rows, c_pad), jnp.bfloat16),   # gs1
            pltpu.SemaphoreType.DMA((2, 2)),              # psem
        ] if pool is not None else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*operands)
    # G slot tap accumulated sum_s z[s] (x) gf[s + off_tap] = dK[8 - tap]
    if _SIDE_KW3:
        (dk3,) = dks
        dk9 = dk3[:, :c, :3 * d_ls].reshape(3, c, 3, d_ls)[
            :, :, :, :d].transpose(1, 0, 2, 3).reshape(c, 9, d)
    else:
        dk01, dk2 = dks
        dk8 = dk01[:c, :8 * d_ls].reshape(c, 8, d_ls)[:, :, :d]
        dk9 = jnp.concatenate([dk8, dk2[:c, None, :d]], axis=1)
    dk = dk9[:, ::-1, :].transpose(1, 0, 2).reshape(3, 3, c, d)
    db = db[0, :d]
    return dz, dk, db


def _pair_max_words(v):
    """bf16 (2m, C) -> f32 (m, C) max of row pairs (2k, 2k+1), riding the
    sublane-pair u32 word packing (lane-half unpack via ``<<16`` /
    ``&0xffff0000`` f32 bitcasts — flatpool._pair_max_row's trick)."""
    u = pltpu.bitcast(v, jnp.uint32)
    lo = pltpu.bitcast(u << 16, jnp.float32)
    hi = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return jnp.maximum(lo, hi)


def _side_lane_stride(d: int) -> int:
    """Lane stride of the tap blocks in the stacked side operands: taps
    sit at lanes [ls*t, ls*t + d). For d < 8 the stride stays 8 — lane
    rolls by non-multiples of 8 lower to much slower multi-step shuffles
    (chip A/B at d=2: ~+1.5 ms/step with d-stride rolls 126/124/...)."""
    return d if d >= 8 else 8


# kw-only tap stacking for the side kernels: the round-5 SoL table put
# the 9-tap stacked kernels at 14-45% of SoL — the 9-term VPU
# collapse/stack loop dominates their 2-row-stream dots (ablating it:
# -2.2 ms/step). Splitting the taps puts kh back IN THE DOT as three
# accumulating row-offset reads (exactly the main conv kernels' `phase`
# structure, which runs at 85-96%) and leaves only the three kw taps
# (row offsets +-1, lane blocks [ls*kw, ls*kw+d)) for the VPU: ~3x less
# VPU for 1.5x more dot streams on a tiny base. Gated for step A/Bs;
# both settings exactness-tested.
_SIDE_KW3 = _os.environ.get("OSVOS_SIDE_KW3", "1") != "0"


def _side_fwd_kernel(g_in: FlatGeom, d: int, pool=None):
    """Tap-stacked side FORWARD: one 2-tile dot computes every tap's
    projection O[u, d*t + dd] = (K_t^T x[u])[dd] over the halo'd input,
    then side[s] = sum_t O[s + off_t] collapses with rolled +-1-row
    reads on the VPU — ~2.3 row-streams instead of 9 (the rolled
    garbage lands outside lanes [0, d) and is masked by the epilogue).

    ``pool``: (g2,) — ALSO emit the stage-boundary ceil-mode 2x2/2 max
    pool of the streamed activation into a natural-layout g2 buffer: the
    side kernel already streams every stage row, so the standalone pool
    kernel's full re-read of the stage buffer disappears. One extra
    h-row is DMA'd at the window front (pre = wp) so pool pair
    q = j*t - 2 is present; the vertical max is two window rows, the
    horizontal max the u32 sublane-pair trick (post-relu values and
    exact-zero pads make ceil-mode free: max(x, 0) == x)."""
    wp, t = g_in.wp, g_in.t
    k_rows = g_in.block_rows
    pre = wp if pool is not None else 0
    xs_rows = _LEAD_ROWS + (t + 2) * wp + 32 + pre
    jt, last = g_in.jt, g_in.total_tiles - 1
    h_ok, w_ok = g_in.h, g_in.w
    ls = _side_lane_stride(d)
    assert 8 * ls <= 128 and d <= ls, d
    if pool is not None:
        (g2,) = pool
        wp2, halfw = g2.wp, wp // 2
        t2w = (t // 2) * wp2
        gap = g2.hp - jt * (t // 2)  # uncovered hp-pad rows per image
        p_len = min(halfw - 1, wp2 - 2)  # stored pooled cols per row
        assert t % 2 == 0 and p_len >= g2.w, (t, p_len, g2)

    def kernel(*refs):
        # kw3: ONE stacked (3, c_pad, 128) weights ref, no o2 scratch
        if pool is not None and _SIDE_KW3:
            (xf_hbm, ks01_ref, out_ref, pooled_hbm,
             xs0, xs1, o01, sem, pb0, pb1, zbuf, psem, zsem) = refs
            ks2_ref = o2 = None
        elif pool is not None:
            (xf_hbm, ks01_ref, ks2_ref, out_ref, pooled_hbm,
             xs0, xs1, o01, o2, sem, pb0, pb1, zbuf, psem, zsem) = refs
        elif _SIDE_KW3:
            (xf_hbm, ks01_ref, out_ref, xs0, xs1, o01, sem) = refs
            ks2_ref = o2 = None
        else:
            (xf_hbm, ks01_ref, ks2_ref, out_ref,
             xs0, xs1, o01, o2, sem) = refs
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        if pool is not None:
            # pooled-buffer lead/tail zeroing + per-tile DMA: the same
            # machinery as the packed conv+pool epilogue (_fwd_kernel) —
            # chunks overlap on distinct semaphore slots (disjoint
            # destinations, constant-zero source)
            def zero_dmas(base: int, total: int):
                cps = [pltpu.make_async_copy(
                           zbuf.at[pl.ds(0, min(t2w, total - a))],
                           pooled_hbm.at[pl.ds(base + a,
                                               min(t2w, total - a))],
                           zsem.at[i % 4])
                       for i, a in enumerate(range(0, total, t2w))]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

            def pcopy(tile, pb):
                # conv tile (n, j) pools to padded pooled rows
                # [j*(t//2), (j+1)*(t//2)) of image n (pair q = j*t-2+2i
                # -> pooled padded row q/2 + 1 = j*(t//2) + i)
                jj = (tile - 1) % jt
                nn = (tile - 1) // jt
                off = g2.block_rows + (nn * g2.hp + jj * (t // 2)) * wp2
                return pltpu.make_async_copy(
                    pb, pooled_hbm.at[pl.ds(off, t2w)], psem.at[tile % 2])

            @pl.when(tt == 0)
            def _():
                zbuf[...] = jnp.zeros_like(zbuf)
                # DMA must read zbuf AFTER the zero store; anchor on a
                # full-buffer reduction so the dependency covers every
                # stored row (see the packed epilogue's hazard note)
                anchor = jnp.sum(zbuf[...].astype(jnp.float32))

                @pl.when(anchor * jnp.float32(0) != jnp.float32(1))
                def _():
                    zero_dmas(0, g2.block_rows)

            @pl.when(tt == last)
            def _():
                zero_dmas(g2.rows - g2.block_rows, g2.block_rows)
                if "pool" not in _SIDE_ABLATE:  # no copies started if so
                    for tprev in (last - 2, last - 1):
                        if tprev >= 1:
                            pcopy(tprev,
                                  pb0 if tprev % 2 == 0 else pb1).wait()

        def _pool_epilogue(xs, j):
            # window h-row r holds input padded row j*t - 2 + r; pool
            # pair i reads rows (2i, 2i+1); _pair_max_words word k then
            # covers padded cols (2k, 2k+1) = pixel pair (2k-2, 2k-1)
            # -> pooled pixel k-1 -> drop word 0 and store at padded
            # col offset 2 (an f32-native sublane shift; the bf16-odd
            # roll this avoids is the expensive one)
            def pool_into(pb):
                # validity folds into each block's store (the whole-block
                # row test is a traced scalar, the col test static); the
                # margin rows every store skips ([0, 2) and [2 + p_len,
                # wp2) of each block) were zeroed ONCE at this buffer's
                # first tile and are never rewritten — the former
                # full-buffer masking pass was a read+write of pb per tile
                u_s = jax.lax.broadcasted_iota(jnp.int32, (p_len, 1), 0)
                col_ok = (u_s + 2) <= g2.w + 1
                for i in range(t // 2):
                    va = xs[pl.ds(_LEAD_ROWS + 2 * i * wp, wp), :]
                    vb = xs[pl.ds(_LEAD_ROWS + (2 * i + 1) * wp, wp), :]
                    mx = _pair_max_words(jnp.maximum(va, vb))
                    p_i = j * (t // 2) + i
                    ok = col_ok & (p_i >= 2) & (p_i <= g2.h + 1)
                    pb[pl.ds(i * wp2 + 2, p_len), :] = jnp.where(
                        ok, mx[1:1 + p_len],
                        mx.dtype.type(0)).astype(jnp.bfloat16)
                # DMA must read pb AFTER the stores above (full-buffer
                # anchor; same hazard as zbuf)
                anchor = jnp.sum(pb[...].astype(jnp.float32))

                @pl.when(anchor * jnp.float32(0) != jnp.float32(1))
                def _():
                    pcopy(tt, pb).start()

            # slot tt%2 last carried tile tt-2's copy: drain before reuse
            @pl.when((tt >= 3) & (tt % 2 == 0))
            def _():
                pcopy(tt - 2, pb0).wait()

            @pl.when((tt >= 3) & (tt % 2 == 1))
            def _():
                pcopy(tt - 2, pb1).wait()

            @pl.when(tt % 2 == 0)
            def _():
                pool_into(pb0)

            @pl.when(tt % 2 == 1)
            def _():
                pool_into(pb1)

            # rows [jt*(t//2), g2.hp) of each image are hp-rounding pad
            # never produced by any tile: zero them at the image's last
            # tile (zbuf was zeroed at tt == 0 and never rewritten)
            if gap > 0:
                nn = (tt - 1) // jt

                @pl.when(j == jt - 1)
                def _():
                    base = g2.block_rows + (nn * g2.hp
                                            + jt * (t // 2)) * wp2
                    zero_dmas(base, gap * wp2)

        def body(xs, slot=0):
            j = (tt - 1) % jt
            if _SIDE_KW3:
                # kh rides the DOT as three accumulating row-offset
                # reads (the main conv kernels' `phase` form); only the
                # three kw taps (rows +-1, lane blocks ls*kw) are left
                # for the VPU collapse, with the validity mask folded
                # into its store (no separate full-buffer mask pass)
                o3_rows = xs_rows - 2 * wp
                acc3 = jax.lax.dot_general(
                    xs[pl.ds(0, o3_rows), :], ks01_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for kh in (1, 2):
                    acc3 += jax.lax.dot_general(
                        xs[pl.ds(kh * wp, o3_rows), :], ks01_ref[kh],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                o01[pl.ds(0, o3_rows), :] = acc3.astype(jnp.bfloat16)

                n_sh = k_rows // 2
                ch = _round_up(-(-n_sh // 8), 8)
                if "collapse" in _SIDE_ABLATE:  # timing-only: raw dot
                    out_ref[...] = o01[pl.ds(pre, k_rows), :]
                    n_sh = 0
                for a in range(0, n_sh, ch):
                    b = min(a + ch, n_sh)
                    base = 2 * a + pre
                    w = pltpu.bitcast(
                        o01[pl.ds(base, 2 * (b - a) + 18), :], jnp.uint32)
                    acc = None
                    for kw in range(3):
                        if kw == 2:
                            v = (w[8:8 + (b - a)] >> 16
                                 ) | (w[9:9 + (b - a)] << 16)
                        elif kw == 0:
                            v = (w[7:7 + (b - a)] >> 16
                                 ) | (w[8:8 + (b - a)] << 16)
                        else:
                            v = w[8:8 + (b - a)]
                        if kw:
                            v = pltpu.roll(v, (128 - kw * ls) % 128,
                                           axis=1)
                        vf = pltpu.bitcast(v, jnp.bfloat16).astype(
                            jnp.float32)
                        acc = vf if acc is None else acc + vf
                    if "mask" not in _SIDE_ABLATE:
                        it = jax.lax.broadcasted_iota(
                            jnp.int32, (2 * (b - a), 1), 0) + 2 * a
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (2 * (b - a), 128), 1)
                        h_p = j * t + it // wp
                        w_p = it % wp
                        valid = ((h_p >= 2) & (h_p <= h_ok + 1)
                                 & (w_p >= 2) & (w_p <= w_ok + 1)
                                 & (lane < d))
                        acc = jnp.where(valid, acc, 0.0)
                    out_ref[pl.ds(2 * a, 2 * (b - a)), :] = acc.astype(
                        jnp.bfloat16)
                if pool is not None and "pool" not in _SIDE_ABLATE:
                    _pool_epilogue(xs, j)
                return

            o01[...] = jax.lax.dot_general(
                xs[...], ks01_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o2[...] = jax.lax.dot_general(
                xs[...], ks2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

            n_sh = k_rows // 2
            ch = _round_up(-(-n_sh // 8), 8)
            if "collapse" in _SIDE_ABLATE:  # timing-only: raw dot out
                out_ref[...] = o01[pl.ds(pre, k_rows), :]
                n_sh = 0
            for a in range(0, n_sh, ch):
                b = min(a + ch, n_sh)
                acc = None
                for kh in range(3):
                    base = 2 * a + kh * wp + pre
                    # ONE window load per kh: the three kw taps slice the
                    # same u32 window (and tap 8 the o2 one) — loading it
                    # per tap tripled the VMEM read traffic of this loop
                    w = pltpu.bitcast(
                        o01[pl.ds(base, 2 * (b - a) + 18), :], jnp.uint32)
                    w8 = (pltpu.bitcast(
                              o2[pl.ds(base, 2 * (b - a) + 18), :],
                              jnp.uint32) if kh == 2 else None)
                    for kw in range(3):
                        tap = 3 * kh + kw
                        ww = w8 if tap == 8 else w
                        if kw == 2:
                            v = (ww[8:8 + (b - a)] >> 16
                                 ) | (ww[9:9 + (b - a)] << 16)
                        elif kw == 0:
                            v = (ww[7:7 + (b - a)] >> 16
                                 ) | (ww[8:8 + (b - a)] << 16)
                        else:
                            v = ww[8:8 + (b - a)]
                        if tap != 8:
                            v = pltpu.roll(v, (128 - tap * ls) % 128,
                                           axis=1)
                        vf = pltpu.bitcast(v, jnp.bfloat16).astype(
                            jnp.float32)
                        acc = vf if acc is None else acc + vf
                out_ref[pl.ds(2 * a, 2 * (b - a)), :] = acc.astype(
                    jnp.bfloat16)

            # mask: pad rows/cols and the garbage lanes >= d stay zero
            if "mask" not in _SIDE_ABLATE:
                it = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 128), 1)
                h_p = j * t + it // wp
                w_p = it % wp
                valid = ((h_p >= 2) & (h_p <= h_ok + 1)
                         & (w_p >= 2) & (w_p <= w_ok + 1) & (lane < d))
                out_ref[...] = jnp.where(valid, out_ref[...],
                                         jnp.bfloat16(0))
            if pool is not None and "pool" not in _SIDE_ABLATE:
                _pool_epilogue(xs, j)

        _with_prefetched_xs(xf_hbm, xs0, xs1, sem, tt, t, wp, xs_rows, last,
                            body, pre_rows=pre)

    return kernel


def _flat_side_fwd_impl(zf, kernel, g_in: FlatGeom, interpret: bool,
                        pool_out: "FlatGeom" = None):
    """Tap-stacked side forward; returns the (rows, 128) flat buffer of
    the d-channel side output (no bias, no output relu).

    ``pool_out``: also emit the ceil-mode 2x2/2 max pool of ``zf`` into
    this natural-layout geometry (one kernel for the stage boundary's
    both consumers — see _side_fwd_kernel); returns (side, pooled)."""
    c, c_pad = g_in.c, g_in.c_pad
    d = kernel.shape[-1]
    ls = _side_lane_stride(d)
    # ksT[cc, ls*t + dd] = K[kh, kw, cc, dd] (no flip — forward taps);
    # taps sit at lane stride ls so the collapse rolls stay multiples
    # of 8 (see _side_lane_stride)
    k9 = jnp.pad(kernel.astype(jnp.bfloat16).reshape(9, c, d).transpose(
        1, 0, 2), ((0, c_pad - c), (0, 0), (0, ls - d)))
    if _SIDE_KW3:
        # ONE (3, c_pad, 128) stack: ks3[kh][cc, ls*kw + dd]
        ks3 = jnp.pad(
            k9.reshape(c_pad, 3, 3 * ls).transpose(1, 0, 2),
            ((0, 0), (0, 0), (0, 128 - 3 * ls)))
    else:
        ks01 = jnp.pad(k9[:, :8].reshape(c_pad, 8 * ls),
                       ((0, 0), (0, 128 - 8 * ls)))
        ks2 = jnp.pad(k9[:, 8], ((0, 0), (0, 128 - ls)))

    pre = g_in.wp if pool_out is not None else 0
    xs_rows = _LEAD_ROWS + (g_in.t + 2) * g_in.wp + 32 + pre
    g_out = dataclasses.replace(g_in, c=d)
    out_shape = jax.ShapeDtypeStruct((g_out.rows, 128), jnp.bfloat16)
    out_specs = pl.BlockSpec((g_in.block_rows, 128), lambda tt: (tt, 0),
                             memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.VMEM((xs_rows, c_pad), jnp.bfloat16),
        pltpu.VMEM((xs_rows, 128), jnp.bfloat16),
    ] + ([] if _SIDE_KW3 else [pltpu.VMEM((xs_rows, 128), jnp.bfloat16)]
         ) + [
        pltpu.SemaphoreType.DMA((2,)),
    ]
    kernel_pool = None
    if pool_out is not None:
        g2 = pool_out
        assert g2.c == g_in.c and g2.c_pad == c_pad, (g2, g_in)
        kernel_pool = (g2,)
        t2w = (g_in.t // 2) * g2.wp
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((g2.rows, g2.c_pad), jnp.bfloat16))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        scratch += [
            pltpu.VMEM((t2w, g2.c_pad), jnp.bfloat16),   # pb0
            pltpu.VMEM((t2w, g2.c_pad), jnp.bfloat16),   # pb1
            pltpu.VMEM((t2w, g2.c_pad), jnp.bfloat16),   # zbuf
            pltpu.SemaphoreType.DMA((2,)),               # psem
            pltpu.SemaphoreType.DMA((4,)),               # zsem
        ]
    if _SIDE_KW3:
        w_specs = [pl.BlockSpec((3, c_pad, 128), lambda tt: (0, 0, 0),
                                memory_space=pltpu.VMEM)]
        w_ops = (ks3,)
    else:
        w_specs = [pl.BlockSpec((c_pad, 128), lambda tt: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((c_pad, 128), lambda tt: (0, 0),
                                memory_space=pltpu.VMEM)]
        w_ops = (ks01, ks2)
    out = pl.pallas_call(
        _side_fwd_kernel(g_in, d, kernel_pool),
        name=(f"side_fwd_c{g_in.c}_h{g_in.h}w{g_in.w}"
              + ("_pool" if pool_out is not None else "")),
        out_shape=out_shape,
        grid=(g_in.total_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zf, *w_ops)
    return out


# ---------------------------------------------------------------------------
# side_prep conv: flat input -> NHWC 16-channel output, tap-stacked bwd
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flat_side_conv3x3(zf, kernel, g_in: FlatGeom, interpret: bool = False):
    """Side-prep conv: flat POST-relu input -> NHWC (n, h, w, D) bf16
    output, no bias (the caller adds it in XLA so its cancellation-heavy
    gradient reduces in f32).

    Forward: the flat Pallas kernel. Backward: TAP-STACKED — the flat
    kernels price a conv pass at row-streams x taps x lane tiles, so a
    D=16-channel side pays 9 sweeps of a 1/8-utilized 128-lane tile in
    EACH of dgrad and wgrad. With D=16, all nine taps fit in two lane
    tiles of one stacked cotangent ``G[s, D*t + d] = gf[s - off_t, d]``
    (built as one NHWC shift-concat + to_flat), and both gradients
    collapse to plain flat matmuls sharing G:

        dz = G @ KT,        KT[D*t + d, c] = K[kh, kw, c, d]
        dK[kh, kw, c, d] = (zf^T @ G)[c, D*t + d]

    (row-stream units drop ~9x -> ~2x per pass). The stack is built
    INSIDE the kernel (_side_bwd_kernel): the gf buffer is zero beyond
    lane D, so each tap's lane-roll lands in a disjoint window and the
    stack is an OR of rolled values riding the VPU under the dots. (A
    first, pure-XLA formulation of the same identity was measured SLOWER
    than the plain flat kernels — 56.9 vs 53.4 ms/step — because XLA
    materialized the shift-concat and the re-pad as full passes; the
    in-kernel build is what makes the trick pay.)

    The FORWARD is tap-stacked too (_side_fwd_kernel): one 2-tile dot
    projects every tap and the 9-term collapse is rolled VPU reads —
    again ~2.3 row-streams instead of 9."""
    sf = _flat_side_fwd_impl(zf, kernel, g_in, interpret)
    return from_flat(sf, dataclasses.replace(g_in, c=kernel.shape[-1]))


def _fsc_fwd(zf, kernel, g_in, interpret):
    return flat_side_conv3x3(zf, kernel, g_in, interpret), (zf, kernel)


def _fsc_bwd(g_in: FlatGeom, interpret, res, gf):
    zf, kernel = res
    # NHWC cotangent -> HALOED-CORE flat buffer (zero lanes beyond D —
    # load-bearing for the stacked kernel's roll-merge): one pad pass
    # instead of to_flat's two, then the tap-stacked kernel
    gf_flat = to_flat_haloed(gf.astype(jnp.bfloat16),
                             dataclasses.replace(g_in, c=kernel.shape[-1]))
    dz, dk, _ = _flat_side_bwd_impl(zf, gf_flat, kernel, g_in, interpret,
                                    src_haloed=True)
    return dz, dk.astype(kernel.dtype)


flat_side_conv3x3.defvjp(_fsc_fwd, _fsc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def flat_side_conv3x3_fl(zf, kernel, g_in: FlatGeom,
                         interpret: bool = False):
    """``flat_side_conv3x3`` that stays IN THE FLAT LAYOUT end to end:
    returns the (rows, 128) flat side buffer (zeros beyond lane D and at
    pad rows/cols) and takes the cotangent in the SAME standard
    lead/tail flat layout. Used by the collapsed head, which consumes
    the side activation through flat 1x1 dots — the 16-of-128-lane
    ``from_flat`` slice on the forward (0.43 ms/step at s2, perfetto
    r5a) and the full NHWC->flat re-pad of the cotangent on the
    backward (0.43 ms/step) both disappear."""
    return _flat_side_fwd_impl(zf, kernel, g_in, interpret)


def _fscf_fwd(zf, kernel, g_in, interpret):
    return flat_side_conv3x3_fl(zf, kernel, g_in, interpret), (zf, kernel)


def _fscf_bwd(g_in: FlatGeom, interpret, res, gf):
    zf, kernel = res
    # gf is already the standard-layout flat buffer with zero pad rows
    # and zero lanes beyond D (the collapse dot's weights are zero
    # there) — no relayout at all
    dz, dk, _ = _flat_side_bwd_impl(zf, gf.astype(jnp.bfloat16), kernel,
                                    g_in, interpret, src_haloed=False)
    return dz, dk.astype(kernel.dtype)


flat_side_conv3x3_fl.defvjp(_fscf_fwd, _fscf_bwd)


# ---------------------------------------------------------------------------
# XLA twin (tests + CPU fallback)
# ---------------------------------------------------------------------------


def flat_conv3x3_ref(zf, kernel, bias, g_in: FlatGeom,
                     relu_input: bool = True, relu_output: bool = False):
    """Pure-XLA reference with identical flat-buffer semantics."""
    x = from_flat(zf, g_in).astype(jnp.float32)
    if relu_input:
        x = jnp.maximum(x, 0)
    y = lax.conv_general_dilated(
        x, kernel.astype(jnp.bfloat16).astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(jnp.float32)
    if relu_output:
        y = jnp.maximum(y, 0)
    g_out = dataclasses.replace(g_in, c=kernel.shape[-1])
    return to_flat(y, g_out)


# ---------------------------------------------------------------------------
# stem conv: consumes the raw image buffer (no input ReLU, no dz needed)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flat_conv3x3_input(zf, kernel, bias, g_in: FlatGeom,
                       interpret: bool = False,
                       relu_output: bool = False,
                       src_haloed: bool = False):
    """Input-layer conv: like flat_conv3x3 but the input is NOT ReLU'd
    (it is the preprocessed image) and no input cotangent is produced
    (images are never differentiated — skipping the dgrad kernel saves a
    full stage-1-sized pass in the backward). ``src_haloed``: zf is a
    to_flat_haloed buffer (the one-pad input form)."""
    return _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                               False, interpret, relu_output=relu_output,
                               src_haloed=src_haloed)


def _fci_fwd(zf, kernel, bias, g_in, interpret, relu_output, src_haloed):
    out = _flat_conv_fwd_impl(zf, kernel, bias, g_in, kernel.shape[-1],
                              False, interpret, relu_output=relu_output,
                              src_haloed=src_haloed)
    return out, (zf, kernel)


def _fci_bwd(g_in, interpret, relu_output, src_haloed, res, gf):
    zf, kernel = res
    d = kernel.shape[-1]
    gf = gf.astype(jnp.bfloat16)
    dk, db = _flat_conv_wgrad_impl(zf, gf, g_in, d, False, interpret,
                                   src_haloed=src_haloed)
    return jnp.zeros_like(zf), dk.astype(kernel.dtype), db


flat_conv3x3_input.defvjp(_fci_fwd, _fci_bwd)


# ---------------------------------------------------------------------------
# pool: ceil-mode 2x2/2 max directly on the flat buffer
# ---------------------------------------------------------------------------


def pool_out_geom(g: FlatGeom, t_out: int) -> FlatGeom:
    return FlatGeom(n=g.n, h=-(-g.h // 2), w=-(-g.w // 2), c=g.c, t=t_out)


def _pool_view(zf, g: FlatGeom):
    v = zf[g.lead:g.lead + g.n * g.hp * g.wp]
    return v.reshape(g.n, g.hp, g.wp, g.c_pad)


def _pool_masked(zf, g: FlatGeom):
    """Padded view with invalid positions at -inf (ceil-mode windows must
    ignore padding — zero pads would beat negative pre-activation values;
    reference: MaxPool2d(2, 2, ceil_mode=True), networks/vgg_osvos.py)."""
    v = _pool_view(zf, g)
    hh = jax.lax.broadcasted_iota(jnp.int32, (g.hp, g.wp), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (g.hp, g.wp), 1)
    valid = ((hh >= 2) & (hh < g.h + 2) & (ww >= 2) & (ww < g.w + 2))
    return jnp.where(valid[None, :, :, None], v,
                     jnp.asarray(-jnp.inf, v.dtype))


def _pool_max(zf, g: FlatGeom):
    """(n, hp/2, wp/2, c_pad) pairwise maxes; real out pixel (h, w) sits
    at pair index (h+1, w+1) — the even 2-pad makes pairs aligned."""
    m = _pool_masked(zf, g)
    r = m.reshape(g.n, g.hp // 2, 2, g.wp // 2, 2, g.c_pad)
    return jnp.max(jnp.max(r, axis=4), axis=2)


def _embed_pool_out(m, g_out: FlatGeom):
    """Place the pair-grid maxes into the 2-pad flat out buffer."""
    h2, w2 = g_out.h, g_out.w
    core = m[:, 1:h2 + 1, 1:w2 + 1, :g_out.c]
    return to_flat(core, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pool_flat(zf, g_in: FlatGeom, g_out: FlatGeom):
    """Ceil-mode 2x2/2 max pool, flat buffer -> flat buffer.

    Value-agnostic: the production trunk feeds it POST-relu activations
    (exactly what the reference's MaxPool sees, VGG pools after ReLU);
    the backward tie-routing matches the reference chain exactly (see
    ops/pool.py for the row-major-first argument; tested against the
    torch oracle via the model-level flat-vs-fast tests).
    """
    return _embed_pool_out(_pool_max(zf, g_in), g_out)


def _pf_fwd(zf, g_in, g_out):
    m = _pool_max(zf, g_in)
    return _embed_pool_out(m, g_out), (zf, m)


def _pf_bwd(g_in: FlatGeom, g_out: FlatGeom, res, gf_out):
    zf, m = res
    # cotangent back onto the pair grid (pads contribute zero)
    gv = _pool_view(gf_out, g_out)  # (n, hp2, wp2, c_pad)
    gm = jnp.zeros((g_in.n, g_in.hp // 2, g_in.wp // 2, g_in.c_pad),
                   gv.dtype)
    gm = gm.at[:, 1:g_out.h + 1, 1:g_out.w + 1, :].set(
        gv[:, 2:g_out.h + 2, 2:g_out.w + 2, :])
    v = _pool_masked(zf, g_in)
    r = v.reshape(g_in.n, g_in.hp // 2, 2, g_in.wp // 2, 2, g_in.c_pad)
    a, b = r[:, :, 0, :, 0, :], r[:, :, 0, :, 1, :]
    cc, d = r[:, :, 1, :, 0, :], r[:, :, 1, :, 1, :]
    # row-major-first argmax tie routing (matches ops/pool.py _mp_bwd,
    # which is tested against the torch oracle)
    wa = a == m
    wb = (b == m) & ~wa
    wc = (cc == m) & ~wa & ~wb
    wd = (d == m) & ~wa & ~wb & ~wc
    z = jnp.zeros_like(gm)
    row0 = jnp.stack([jnp.where(wa, gm, z), jnp.where(wb, gm, z)], axis=3)
    row1 = jnp.stack([jnp.where(wc, gm, z), jnp.where(wd, gm, z)], axis=3)
    dx = jnp.stack([row0, row1], axis=2).reshape(
        g_in.n * g_in.hp * g_in.wp, g_in.c_pad)
    dx = jnp.pad(dx, ((g_in.lead, g_in.block_rows), (0, 0)))
    return (dx.astype(zf.dtype),)


pool_flat.defvjp(_pf_fwd, _pf_bwd)


# ---------------------------------------------------------------------------
# pixel-pair packing: two adjacent-in-w pixels share one 128-lane flat row
# ---------------------------------------------------------------------------
#
# Stage-1 (and the stem) have c <= 64: in the natural layout their dots run
# with half-empty lanes AND half-empty MXU contraction depth, so the padded
# FLOPs are 4x the real work. Packing pixel pairs [x(2u) | x(2u+1)] into one
# row makes the SAME kernels full-rate: a packed buffer is just a FlatGeom
# with (w -> w/2, c -> 2c), and a conv tap at packed-column offset
# delta in {-1, 0, +1} carries a 2x2 block matrix over pixel halves:
#
#   delta=-1: [[0, 0], [K[kh,0], 0]]             (prev pair's hi -> lo)
#   delta= 0: [[K[kh,1], K[kh,0]], [K[kh,2], K[kh,1]]]
#   delta=+1: [[0, K[kh,2]], [0, 0]]             (next pair's lo -> hi)
#
# which is exactly the (9, c_pad, d_pad) weight layout the flat kernels
# already consume — packing is pure data/weight prep, zero kernel changes.
# Requires even w (DAVIS 854 ok); the model falls back to unpacked
# otherwise.


def packed_geom(g: FlatGeom) -> FlatGeom:
    """Packed twin geometry. c counts BUFFER lanes (2 halves of
    _half_pad(c) each); the logical channel count rides in the weights.
    Packing halves the row width, so the block height doubles within the
    same VMEM budget."""
    assert g.w % 2 == 0, "pixel-pair packing requires even width"
    return FlatGeom(n=g.n, h=g.h, w=g.w // 2, c=2 * _half_pad(g.c),
                    t=stage_t(-(-g.h // 2)))


def _half_pad(c: int) -> int:
    """Lane count of one pixel half inside the packed row."""
    return 4 if c <= 4 else _round_up(c, 64)


def pack_image(x: jnp.ndarray, gp: FlatGeom) -> jnp.ndarray:
    """(n, h, w, c) -> packed flat buffer (pads c to the half width)."""
    n, h, w, c = x.shape
    hp = _half_pad(c)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0),) * 3 + ((0, hp - c),))
    xp = xp.reshape(n, h, w // 2, 2 * hp)
    return to_flat(xp, gp)


def pack_image_haloed(x: jnp.ndarray, gp: FlatGeom) -> jnp.ndarray:
    """pack_image in the haloed-core layout (to_flat_haloed): ONE pad op
    instead of two — consume with src_haloed=True kernels."""
    n, h, w, c = x.shape
    hp = _half_pad(c)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0),) * 3 + ((0, hp - c),))
    xp = xp.reshape(n, h, w // 2, 2 * hp)
    return to_flat_haloed(xp, gp)


def packed_weights(kernel: jnp.ndarray, bias: jnp.ndarray):
    """K (3,3,ci,co), b (co,) -> Kp (3,3,2*hi,2*ho) bf16, bp (2*ho,) f32.

    Both halves sit at _half_pad offsets so producer buffers line up with
    the next packed consumer's block-row layout."""
    ci, co = kernel.shape[2], kernel.shape[3]
    hi, ho = _half_pad(ci), _half_pad(co)
    k = kernel.astype(jnp.bfloat16)
    z = jnp.zeros((ci, co), jnp.bfloat16)

    def blk(ll, lh, hl, hhb):
        m = jnp.stack([jnp.stack([ll, lh]), jnp.stack([hl, hhb])])
        # (in_half, out_half, ci, co) -> pad ci->hi, co->ho
        m = jnp.pad(m, ((0, 0), (0, 0), (0, hi - ci), (0, ho - co)))
        return m.transpose(0, 2, 1, 3).reshape(2 * hi, 2 * ho)

    taps = []
    for kh in range(3):
        a = blk(z, z, k[kh, 0], z)
        b = blk(k[kh, 1], k[kh, 0], k[kh, 2], k[kh, 1])
        cm = blk(z, k[kh, 2], z, z)
        taps.extend([a, b, cm])  # kref order: kw index = delta + 1
    kp = jnp.stack(taps).reshape(3, 3, 2 * hi, 2 * ho)
    bpad = jnp.pad(bias.astype(jnp.float32), (0, ho - co))
    bp = jnp.concatenate([bpad, bpad])
    return kp, bp


def unpack_dk_merged_rows(dk6: jnp.ndarray, ci: int, co: int, a: int,
                          b: int) -> jnp.ndarray:
    """Decode the merged-tap wgrad accumulator of the SEPARATE wgrad
    kernel (z was the merged operand; the merged tap's ROWS split
    [prev-hi | next-lo]) into the logical dK (3,3,ci,co). a/b = in/out
    half lane counts (_half_pad)."""
    rows = []
    for kh in range(3):
        dense, m = dk6[kh], dk6[3 + kh]
        dk0 = m[0:ci, 0:co] + dense[0:ci, b:b + co]
        dk1 = dense[0:ci, 0:co] + dense[a:a + ci, b:b + co]
        dk2 = dense[a:a + ci, 0:co] + m[a:a + ci, b:b + co]
        rows.append(jnp.stack([dk0, dk1, dk2]))
    return jnp.stack(rows)


def unpack_dk_merged_cols(dk6: jnp.ndarray, ci: int, co: int, a: int,
                          b: int) -> jnp.ndarray:
    """Decode the merged-tap wgrad accumulator of the FUSED backward
    kernel (gf was the merged operand; the merged tap's COLS split
    [prev-hi | next-lo]) into the logical dK (3,3,ci,co)."""
    rows = []
    for kh in range(3):
        dense, m = dk6[kh], dk6[3 + kh]
        dk0 = m[a:a + ci, b:b + co] + dense[0:ci, b:b + co]
        dk1 = dense[0:ci, 0:co] + dense[a:a + ci, b:b + co]
        dk2 = dense[a:a + ci, 0:co] + m[0:ci, 0:co]
        rows.append(jnp.stack([dk0, dk1, dk2]))
    return jnp.stack(rows)


def unpack_dk(dkp: jnp.ndarray, ci: int, co: int) -> jnp.ndarray:
    """dKp (3,3,2*hi,2*ho) -> dK (3,3,ci,co): sum each tap's occurrences."""
    hi, ho = dkp.shape[2] // 2, dkp.shape[3] // 2
    lo_r, hi_r = slice(0, ci), slice(hi, hi + ci)
    lo_c, hi_c = slice(0, co), slice(ho, ho + co)
    rows = []
    for kh in range(3):
        a, b, cm = dkp[kh, 0], dkp[kh, 1], dkp[kh, 2]
        dk0 = a[hi_r, lo_c] + b[lo_r, hi_c]
        dk1 = b[lo_r, lo_c] + b[hi_r, hi_c]
        dk2 = b[hi_r, lo_c] + cm[lo_r, hi_c]
        rows.append(jnp.stack([dk0, dk1, dk2]))
    return jnp.stack(rows)


_USE_MERGED_TAPS = True  # 6-dot cross-pair merge for packed convs (A/B)

# Tap-stacked stem wgrad (one dot per tile): measured a small LOSS vs the
# merged 6-dot kernel — the stack build has nothing to overlap with.
_USE_STACKED_STEM_WGRAD = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flat_conv3x3_packed(zfp, kernel, bias, gp: FlatGeom,
                        interpret: bool = False, relu_input: bool = True,
                        relu_output: bool = False):
    """Packed-layout trunk conv; same storage conventions as
    flat_conv3x3. zfp: packed flat buffer of gp; kernel (3,3,ci,co)
    logical params. Output is the packed buffer with c = 2*co."""
    kp, bp = packed_weights(kernel, bias)
    gi = dataclasses.replace(gp, c=kp.shape[2])
    merged = kp.shape[2] // 2 if _USE_MERGED_TAPS else 0
    return _flat_conv_fwd_impl(zfp, kp, bp, gi, kp.shape[3], relu_input,
                               interpret, merged=merged,
                               relu_output=relu_output)


def _fcp_fwd(zfp, kernel, bias, gp, interpret, relu_input, relu_output):
    return flat_conv3x3_packed(zfp, kernel, bias, gp, interpret,
                               relu_input, relu_output), (zfp, kernel)


def _fcp_bwd(gp, interpret, relu_input, relu_output, res, gf):
    zfp, kernel = res
    ci, co = kernel.shape[2], kernel.shape[3]
    kp, _ = packed_weights(kernel, jnp.zeros((co,), jnp.float32))
    gi = dataclasses.replace(gp, c=kp.shape[2])
    gf = gf.astype(jnp.bfloat16)
    hi, ho = _half_pad(ci), _half_pad(co)
    merged = hi if _USE_MERGED_TAPS else 0
    if _USE_FUSED_BWD:
        dz, dkp, dbp = _flat_conv_bwd_fused_impl(zfp, gf, kp, gi,
                                                 kp.shape[3], relu_input,
                                                 interpret, merged=merged)
        dk = (unpack_dk_merged_cols(dkp, ci, co, hi, ho) if merged
              else unpack_dk(dkp, ci, co))
    else:
        dz = _flat_conv_dgrad_impl(gf, kp, zfp, gi, kp.shape[3], interpret)
        dkp, dbp = _flat_conv_wgrad_impl(zfp, gf, gi, kp.shape[3],
                                         relu_input, interpret,
                                         merged=merged)
        dk = (unpack_dk_merged_rows(dkp, ci, co, hi, ho) if merged
              else unpack_dk(dkp, ci, co))
    db = (dbp[:co] + dbp[ho:ho + co]).astype(jnp.float32)
    return dz, dk.astype(kernel.dtype), db


flat_conv3x3_packed.defvjp(_fcp_fwd, _fcp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flat_conv3x3_input_packed(zfp, kernel, bias, gp: FlatGeom,
                              interpret: bool = False,
                              relu_output: bool = False,
                              src_haloed: bool = False):
    """Packed stem: raw (packed) image in, no input ReLU, no dz.
    ``src_haloed``: zfp is a pack_image_haloed buffer (one pad pass
    instead of to_flat's two — the production online step packs the
    drawn images every step, so the second full-buffer pad was ~0.84 ms
    of pure zero-copying)."""
    kp, bp = packed_weights(kernel, bias)
    gi = dataclasses.replace(gp, c=kp.shape[2])
    merged = kp.shape[2] // 2 if _USE_MERGED_TAPS else 0
    return _flat_conv_fwd_impl(zfp, kp, bp, gi, kp.shape[3], False,
                               interpret, merged=merged,
                               relu_output=relu_output,
                               src_haloed=src_haloed)


def _fcip_fwd(zfp, kernel, bias, gp, interpret, relu_output, src_haloed):
    return flat_conv3x3_input_packed(zfp, kernel, bias, gp, interpret,
                                     relu_output, src_haloed), (zfp, kernel)


def _fcip_bwd(gp, interpret, relu_output, src_haloed, res, gf):
    zfp, kernel = res
    ci, co = kernel.shape[2], kernel.shape[3]
    hi, ho = _half_pad(ci), _half_pad(co)
    gi = dataclasses.replace(gp, c=2 * hi)
    gf = gf.astype(jnp.bfloat16)
    width = 2 * hi
    if _USE_STACKED_STEM_WGRAD and 9 * width <= 128 and not src_haloed:
        # the packed image is narrow enough to tap-STACK (one dot per
        # tile, _stem_wgrad_kernel) — but MEASURED a small LOSS (48.8 vs
        # 48.2 ms/step): with a single dot left, the 9-pass stack build
        # has no MXU work to hide under, unlike the side kernels where
        # it rides beneath 2-tile dots. Kept as an A/B knob.
        dks, dbp = _stem_wgrad_stacked_impl(zfp, gf, gi,
                                            _lane_pad(2 * ho), width,
                                            interpret)
        dkp = dks[:9 * width].reshape(3, 3, width, -1)
        dk = unpack_dk(dkp, ci, co)
        dbp = dbp[0]
    else:
        merged = hi if _USE_MERGED_TAPS else 0
        dkp, dbp = _flat_conv_wgrad_impl(zfp, gf, gi, 2 * ho, False,
                                         interpret, merged=merged,
                                         src_haloed=src_haloed)
        dk = (unpack_dk_merged_rows(dkp, ci, co, hi, ho) if merged
              else unpack_dk(dkp, ci, co))
    db = (dbp[:co] + dbp[ho:ho + co]).astype(jnp.float32)
    return jnp.zeros_like(zfp), dk.astype(kernel.dtype), db


flat_conv3x3_input_packed.defvjp(_fcip_fwd, _fcip_bwd)


# ---------------------------------------------------------------------------
# pool from a packed buffer into the next stage's natural buffer
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pool_packed(zfp, gp: FlatGeom, g_out: FlatGeom):
    """2x2/2 max pool consuming a PACKED stage buffer.

    The horizontal pair IS the packed row's lane halves, so pooling is one
    lane-half max plus an aligned row-pair max — no repacking, no window
    arithmetic. Requires even h and (original) even w, which is how the
    packed path is gated. Output is the natural flat buffer of g_out.
    """
    return _embed_pp(_pp_max(zfp, gp, g_out.c), g_out)


def _pp_max(zfp, gp: FlatGeom, co: int):
    half = gp.c // 2
    v = _pool_view(zfp, gp)
    hmax = jnp.maximum(v[..., :co], v[..., half:half + co])
    r = hmax.reshape(gp.n, gp.hp // 2, 2, gp.wp, co)
    return jnp.max(r, axis=2)  # out pixel (h', u) at (h'+1, u+2)


def _embed_pp(m, g_out: FlatGeom):
    core = m[:, 1:g_out.h + 1, 2:g_out.w + 2, :g_out.c]
    return to_flat(core, g_out)


def _pp_fwd(zfp, gp, g_out):
    m = _pp_max(zfp, gp, g_out.c)
    return _embed_pp(m, g_out), (zfp, m)


def _pp_bwd(gp: FlatGeom, g_out: FlatGeom, res, gf_out):
    zfp, m = res
    co = g_out.c
    half = gp.c // 2
    gv = _pool_view(gf_out, g_out)
    gmm = jnp.zeros((gp.n, gp.hp // 2, gp.wp, co), gv.dtype)
    gmm = gmm.at[:, 1:g_out.h + 1, 2:g_out.w + 2, :].set(
        gv[:, 2:g_out.h + 2, 2:g_out.w + 2, :co])
    v = _pool_view(zfp, gp)
    r = v.reshape(gp.n, gp.hp // 2, 2, gp.wp, gp.c_pad)
    top, bot = r[:, :, 0], r[:, :, 1]
    a, b = top[..., :co], top[..., half:half + co]
    cc, d = bot[..., :co], bot[..., half:half + co]
    # row-major-first argmax tie routing: top-lo, top-hi, bot-lo, bot-hi
    wa = a == m
    wb = (b == m) & ~wa
    wc = (cc == m) & ~wa & ~wb
    wd = (d == m) & ~wa & ~wb & ~wc
    z = jnp.zeros_like(gmm)

    def halfpad(x):
        return jnp.pad(x, ((0, 0),) * 3 + ((0, half - co),))

    g_top = jnp.concatenate(
        [halfpad(jnp.where(wa, gmm, z)), halfpad(jnp.where(wb, gmm, z))],
        axis=-1)
    g_bot = jnp.concatenate(
        [halfpad(jnp.where(wc, gmm, z)), halfpad(jnp.where(wd, gmm, z))],
        axis=-1)
    dz = jnp.stack([g_top, g_bot], axis=2).reshape(
        gp.n * gp.hp * gp.wp, 2 * half)
    dz = jnp.pad(dz, ((gp.lead, gp.block_rows), (0, gp.c_pad - 2 * half)))
    return (dz.astype(zfp.dtype),)


pool_packed.defvjp(_pp_fwd, _pp_bwd)


def unpack_image(zfp, gp: FlatGeom, c: int) -> jnp.ndarray:
    """Packed flat buffer -> (n, h, 2*w_packed, c) NHWC (tests/side use)."""
    half = gp.c // 2
    v = _pool_view(zfp, gp)[:, 2:gp.h + 2, 2:gp.w + 2, :]
    lo, hi = v[..., :c], v[..., half:half + c]
    inter = jnp.stack([lo, hi], axis=3)
    return inter.reshape(gp.n, gp.h, 2 * gp.w, c)
