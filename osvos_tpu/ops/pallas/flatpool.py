"""Flat-layout ceil-mode 2x2/2 max pool as Pallas kernels (fwd + bwd).

pool_flat (flatconv.py) implements pooling as an XLA reshape-max over the
flat view plus an equality-select backward — correct, but XLA materializes
the 6-D strided views with transposed layouts and the embed/re-pad steps,
costing ~6-8 ms of the online step across stages 2-5. These kernels do
each direction in one pass over the buffers:

Forward (grid over OUT tiles): the input window for an out tile is DMA'd
at an aligned row-multiple of the input width, shifted up 2 rows in place
(one aligned u32-word roll — the 2-pixel column pad makes the column
shift a pure row shift), reduced vertically by aligned row-pair maxes and
horizontally on the bf16-pair-packed u32 view (lane-half unpack via
``<<16`` / ``&0xffff0000`` f32 bitcasts), assembled 0-column-based, then
placed at the padded output columns with ``pltpu.roll`` and masked so the
output pads stay exactly zero. Ceil-mode windows at odd extents use only
their valid elements (a scalar/lane predicate, not -inf padding).

Backward (grid over IN tiles): the pooled maxes and the output cotangent
stream in via an aligned window DMA; each input row rebuilds its expanded
``out[(w//2)]`` row with ``pltpu.repeat``+``roll`` on values, applies the
reference's row-major-first argmax tie routing (top-left wins; matches
ops/pool.py's torch-oracle-tested ``_mp_bwd``), and writes the routed
cotangent.

Reference semantics: ``MaxPool2d(2, stride=2, ceil_mode=True)``
(networks/vgg_osvos.py:~120). The kernels are value-agnostic; the
production flat trunk stores POST-relu activations (see flatconv.py), so
they pool exactly what the reference's MaxPool sees. Tested against
pool_flat (the XLA twin) in tests/test_flat.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from osvos_tpu.ops.pallas.flatconv import (FlatGeom, _dup_hi, _dup_lo,
                                           _roll2_bf16, _round_up,
                                           _shift_up2_inplace)


def _dma_pipeline(tt, last, make_copies, body) -> None:
    """Double-buffered windowed DMA (the pool twin of flatconv's
    _with_prefetched_xs): tile tt+1's window copies start before tile
    tt's are waited on, so the transfers ride under the VPU reduction —
    the back-to-back start();wait() form serializes every tile's copy
    with its compute. ``make_copies(tile, slot)`` returns the async
    copies for a tile into buffer slot 0/1; ``body(slot)`` consumes (and
    may destroy) that slot while the other holds the in-flight copy."""

    @pl.when(tt == 0)
    def _():
        for cp in make_copies(1, 1):
            cp.start()

    interior = (tt >= 1) & (tt < last)

    @pl.when(interior & (tt + 1 < last) & (tt % 2 == 1))
    def _():
        for cp in make_copies(tt + 1, 0):
            cp.start()

    @pl.when(interior & (tt + 1 < last) & (tt % 2 == 0))
    def _():
        for cp in make_copies(tt + 1, 1):
            cp.start()

    @pl.when(interior & (tt % 2 == 1))
    def _():
        for cp in make_copies(tt, 1):
            cp.wait()
        body(1)

    @pl.when(interior & (tt % 2 == 0))
    def _():
        for cp in make_copies(tt, 0):
            cp.wait()
        body(0)


def _pair_max_row(m):
    """(wp1, C) bf16 -> (wp1/2, C) f32 max of element pairs (2k, 2k+1)."""
    u = pltpu.bitcast(m, jnp.uint32)
    lo = pltpu.bitcast(u << 16, jnp.float32)
    hi = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return jnp.maximum(lo, hi), lo


def _fwd_kernel(g_in: FlatGeom, g_out: FlatGeom):
    wp1, wp2 = g_in.wp, g_out.wp
    tau = g_out.t
    k_rows = g_out.block_rows
    jt2, last = g_out.jt, g_out.total_tiles - 1
    h1, w1, h2, w2 = g_in.h, g_in.w, g_out.h, g_out.w
    c_pad = g_in.c_pad
    # whole image-rows of slack so a clamped window stays row-aligned
    xs_rows = (2 * tau + 2) * wp1
    halfw = wp1 // 2
    w_odd = (w1 % 2) == 1
    in_rows_total = g_in.rows

    def kernel(zin_hbm, out_ref, xs0, xs1, obuf, sem):
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def window(tile):
            # window start: padded in row 2*j*tau - 2 of image n — an
            # aligned multiple of wp1; negative per-image starts land in
            # the zero lead block. The LAST tiles of the last image can
            # over-read past the buffer tail (the out grid covers up to
            # 2*hp_out input rows > hp_in + tail for deep stages), so the
            # window clamps to the buffer end and the reads shift by the
            # whole-row delta.
            j = (tile - 1) % jt2
            n = (tile - 1) // jt2
            off_u = (g_in.t + n * g_in.hp + 2 * j * tau - 2) * wp1
            off = jnp.minimum(off_u, in_rows_total - xs_rows)
            off = pl.multiple_of(off, 16)
            return j, off, (off_u - off) // wp1  # dd: rows slid down

        def copies(tile, slot):
            _, off, _ = window(tile)
            xs = xs0 if slot == 0 else xs1
            return (pltpu.make_async_copy(
                zin_hbm.at[pl.ds(off, xs_rows)], xs, sem.at[slot]),)

        def body(slot):
            xs = xs0 if slot == 0 else xs1
            j, _, dd = window(tt)
            # column shift: padded col w+2 -> w (pure flat -2 shift; each
            # row's 2-entry tail borrows from the next row — junk beyond
            # the valid width, masked at the end)
            _shift_up2_inplace(xs, xs_rows - 2 * wp1)

            row_cap = xs_rows // wp1 - 1
            for r in range(tau):
                # out padded row p = j*tau + r, pixel h' = p - 2; its two
                # input rows sit at window-local rows 2r+dd and 2r+1+dd.
                # Rows sliding past the scratch belong to masked outputs —
                # clamp the read so it stays in bounds (garbage is fine).
                ra = pl.multiple_of(
                    jnp.minimum(2 * r + dd, row_cap) * wp1, 16)
                rb = pl.multiple_of(
                    jnp.minimum(2 * r + 1 + dd, row_cap) * wp1, 16)
                va = xs[pl.ds(ra, wp1), :]
                vb = xs[pl.ds(rb, wp1), :]
                # h-ceil: the second input row may be past the image
                hpix2 = 2 * (j * tau + r - 2) + 1
                v = jnp.where(hpix2 < h1, jnp.maximum(va, vb), va)
                mx, lo = _pair_max_row(v)
                if w_odd:
                    # last out col's second element is the zero pad column
                    kk = jax.lax.broadcasted_iota(jnp.int32, (halfw, 1), 0)
                    mx = jnp.where(kk == w2 - 1, lo, mx)
                obuf[pl.ds(r * wp2, halfw), :] = mx.astype(jnp.bfloat16)

            # place at padded out cols (+2) and zero the pads
            it = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
            p = j * tau + it // wp2
            u = it % wp2
            valid = ((p >= 2) & (p <= h2 + 1) & (u >= 2) & (u <= w2 + 1))
            rolled = _roll2_bf16(obuf[...])
            out_ref[...] = jnp.where(valid, rolled, jnp.bfloat16(0))

        _dma_pipeline(tt, last, copies, body)

    return kernel


@functools.partial(jax.jit, static_argnames=("g_in", "g_out", "interpret"))
def pool_flat_fwd_pallas(zf, g_in: FlatGeom, g_out: FlatGeom,
                         interpret: bool = False):
    assert g_in.w >= 2 and g_in.h >= 2
    assert g_in.wp // 2 <= g_out.wp, (g_in.wp, g_out.wp)
    xs_rows = (2 * g_out.t + 2) * g_in.wp
    return pl.pallas_call(
        _fwd_kernel(g_in, g_out),
        name=f"pool_fwd_c{g_in.c}_h{g_in.h}w{g_in.w}",
        out_shape=jax.ShapeDtypeStruct((g_out.rows, g_out.c_pad),
                                       jnp.bfloat16),
        grid=(g_out.total_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((g_out.block_rows, g_out.c_pad),
                               lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, g_in.c_pad), jnp.bfloat16),
            pltpu.VMEM((xs_rows, g_in.c_pad), jnp.bfloat16),
            pltpu.VMEM((g_out.block_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zf)


def _bwd_kernel(g_in: FlatGeom, g_out: FlatGeom):
    wp1, wp2 = g_in.wp, g_out.wp
    ti = g_in.t
    jt1, last = g_in.jt, g_in.total_tiles - 1
    h1, w1 = g_in.h, g_in.w
    w2_rows = (ti // 2 + 2) * wp2

    def kernel(zout_hbm, gout_hbm, zin_ref, out_ref, zs0, zs1, gs0, gs1,
               sem):
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def offset(tile):
            j = (tile - 1) % jt1
            n = (tile - 1) // jt1
            return j, pl.multiple_of(
                (g_out.t + n * g_out.hp + (j * ti) // 2) * wp2, 16)

        def copies(tile, slot):
            _, off = offset(tile)
            zs = zs0 if slot == 0 else zs1
            gs = gs0 if slot == 0 else gs1
            return (
                pltpu.make_async_copy(zout_hbm.at[pl.ds(off, w2_rows)],
                                      zs, sem.at[0, slot]),
                pltpu.make_async_copy(gout_hbm.at[pl.ds(off, w2_rows)],
                                      gs, sem.at[1, slot]),
            )

        def body(slot):
            zs = zs0 if slot == 0 else zs1
            gs = gs0 if slot == 0 else gs1
            j, _ = offset(tt)
            # 0-based cols in the out windows
            _shift_up2_inplace(zs, (ti // 2 + 2) * wp2 - 2)
            _shift_up2_inplace(gs, (ti // 2 + 2) * wp2 - 2)

            ca = jax.lax.broadcasted_iota(jnp.int32, (wp1, 1), 0)
            col_valid = ((ca >= 2) & (ca <= w1 + 1)).astype(jnp.float32)
            col_odd = (ca % 2 == 1).astype(jnp.float32)

            # expand out cols 2x (true interleave — pltpu.repeat TILES)
            # and re-pad: e[a] = zo[(a-2)//2]
            def expand(row):
                inter = jnp.stack([row, row], axis=1)
                inter = inter.reshape(2 * wp2, row.shape[-1])
                return _roll2_bf16(inter[:wp1, :])

            # in rows pair up (2k, 2k+1) onto one out row (j*ti keeps
            # parity: ti is even), so the expands are shared per pair
            for k in range(ti // 2):
                # padded in row q = j*ti + 2k; out local row
                # (q-2)//2 + 2 - j*ti/2 = k + 1 (also maps the two
                # leading pad/carry rows to local row 1)
                lo_r = k + 1
                zo = zs[pl.ds(lo_r * wp2, wp2), :]
                go = gs[pl.ds(lo_r * wp2, wp2), :]
                e_z = expand(zo)
                e_g = expand(go).astype(jnp.float32)

                m_top_bits_prev = None
                for r in (2 * k, 2 * k + 1):
                    zin_row = zin_ref[pl.ds(r * wp1, wp1), :]
                    m_eq = (zin_row.astype(jnp.float32)
                            == e_z.astype(jnp.float32)).astype(jnp.float32)
                    m_bits = pltpu.bitcast(m_eq.astype(jnp.bfloat16),
                                           jnp.uint32)
                    prev_even = pltpu.bitcast(_dup_lo(m_bits), jnp.bfloat16
                                              ).astype(jnp.float32)
                    if r % 2 == 0:
                        # top row: even col wins outright; odd col only if
                        # the even partner missed
                        route = m_eq * (1.0 - col_odd * prev_even)
                        m_top_bits_prev = m_bits
                    else:
                        # bottom row: any top-row hit blocks both; the odd
                        # col additionally defers to its even partner
                        any_top = pltpu.bitcast(
                            _dup_lo(m_top_bits_prev)
                            | _dup_hi(m_top_bits_prev),
                            jnp.bfloat16).astype(jnp.float32)
                        route = (m_eq * (1.0 - any_top)
                                 * (1.0 - col_odd * prev_even))
                    q = j * ti + r
                    row_ok = ((q >= 2) & (q <= h1 + 1)).astype(jnp.float32)
                    row = e_g * route * col_valid * row_ok
                    out_ref[pl.ds(r * wp1, wp1), :] = row.astype(
                        out_ref.dtype)

        _dma_pipeline(tt, last, copies, body)

    return kernel


@functools.partial(jax.jit, static_argnames=("g_in", "g_out", "interpret"))
def pool_flat_bwd_pallas(zin, zout, gout, g_in: FlatGeom, g_out: FlatGeom,
                         interpret: bool = False):
    w2_rows = (g_in.t // 2 + 2) * g_out.wp
    return pl.pallas_call(
        _bwd_kernel(g_in, g_out),
        name=f"pool_bwd_c{g_in.c}_h{g_in.h}w{g_in.w}",
        out_shape=jax.ShapeDtypeStruct((g_in.rows, g_in.c_pad),
                                       jnp.bfloat16),
        grid=(g_in.total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zout
            pl.BlockSpec(memory_space=pl.ANY),  # gout
            pl.BlockSpec((g_in.block_rows, g_in.c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),  # zin
        ],
        out_specs=pl.BlockSpec((g_in.block_rows, g_in.c_pad),
                               lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zout, gout, zin)


# ---------------------------------------------------------------------------
# packed-buffer pool: PACKED stage-1 buffer -> natural stage-2 buffer
# ---------------------------------------------------------------------------
#
# The XLA pool_packed (flatconv.py) at stage-1 resolution was the single
# biggest glue cost of the online step (perfetto, round 3): ~4.3 ms fwd
# (strided-view slices/maxes/reduces/embed-pads over the 270 MB packed
# buffer) + ~5.7 ms bwd (tie-routing select chains + layout copy + the
# lead/tail re-pad). These kernels do each direction in one pass.
#
# Geometry: the horizontal 2x2 pair IS the packed row's lane halves
# (pixel 2u' in lanes [0, half), 2u'+1 in [half, 2*half)), and the packed
# column u' sits at in padded col u'+2 == out padded col u'+2 — the SAME
# sublane index. So pooling is a lane-half max (one u32-view lane roll —
# lane rolls move whole 32-bit words, so the bf16 sublane pair packing is
# untouched) plus an aligned row-pair max; no horizontal repacking at all.


def _lane_shift(v, s: int):
    """bf16 (rows, 128): cyclic lane shift by ``s`` (result[l] = v[l-s]).
    Lane rotates move whole 32-bit words, so the bf16 sublane-pair packing
    is untouched; the u32 view keeps Mosaic on the 32-bit rotate path."""
    u = pltpu.bitcast(v, jnp.uint32)
    return pltpu.bitcast(pltpu.roll(u, s % v.shape[-1], axis=1),
                         jnp.bfloat16)


def _pp_fwd_kernel(gp: FlatGeom, g_out: FlatGeom, half: int):
    wp1, wp2 = gp.wp, g_out.wp
    t2 = g_out.t
    k_rows = g_out.block_rows
    jt2, last = g_out.jt, g_out.total_tiles - 1
    h1, w1 = gp.h, 2 * gp.w  # w1 = original image width (pairs * 2)
    h2, w2, co = g_out.h, g_out.w, g_out.c
    xs_rows = (2 * t2 + 2) * wp1
    in_rows_total = gp.rows
    w_odd = (w1 % 2) == 1

    def kernel(zin_hbm, out_ref, xs0, xs1, obuf, sem):
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def window(tile):
            j = (tile - 1) % jt2
            n = (tile - 1) // jt2
            off_u = (gp.t + n * gp.hp + 2 * (j * t2) - 2) * wp1
            off = jnp.minimum(off_u, in_rows_total - xs_rows)
            off = pl.multiple_of(off, 16)
            return j, off, (off_u - off) // wp1

        def copies(tile, slot):
            _, off, _ = window(tile)
            xs = xs0 if slot == 0 else xs1
            return (pltpu.make_async_copy(
                zin_hbm.at[pl.ds(off, xs_rows)], xs, sem.at[slot]),)

        def body(slot):
            xs = xs0 if slot == 0 else xs1
            j, _, dd = window(tt)

            row_cap = xs_rows // wp1 - 1
            for r in range(t2):
                ra = pl.multiple_of(
                    jnp.minimum(2 * r + dd, row_cap) * wp1, 16)
                rb = pl.multiple_of(
                    jnp.minimum(2 * r + 1 + dd, row_cap) * wp1, 16)
                va = xs[pl.ds(ra, wp1), :]
                vb = xs[pl.ds(rb, wp1), :]
                hpix2 = 2 * (j * t2 + r - 2) + 1
                v = jnp.where(hpix2 < h1, jnp.maximum(va, vb), va)
                # lane l < half gets its hi partner v[l+half]; what rolls
                # INTO hi lanes is garbage, masked by (lane < co) below
                m = jnp.maximum(v, _lane_shift(v, -half))
                if w_odd:
                    # last pair's hi half is the zero w-pad: ceil-mode
                    # must ignore it (zero would beat negative z)
                    ss = jax.lax.broadcasted_iota(jnp.int32, (wp1, 1), 0)
                    m = jnp.where(ss == w2 + 1, v, m)
                obuf[pl.ds(r * wp2, wp2), :] = m[0:wp2, :]

            it = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 1), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (k_rows, 128), 1)
            p = j * t2 + it // wp2
            u = it % wp2
            valid = ((p >= 2) & (p <= h2 + 1) & (u >= 2) & (u <= w2 + 1)
                     & (lane < co))
            out_ref[...] = jnp.where(valid, obuf[...], jnp.bfloat16(0))

        _dma_pipeline(tt, last, copies, body)

    return kernel


@functools.partial(jax.jit, static_argnames=("gp", "g_out", "interpret"))
def pool_packed_fwd_pallas(zfp, gp: FlatGeom, g_out: FlatGeom,
                           interpret: bool = False):
    half = gp.c // 2
    assert g_out.c <= half and g_out.wp <= gp.wp, (gp, g_out)
    # the in-kernel lane iotas/rolls assume single-lane-tile buffers
    assert gp.c_pad == 128 and g_out.c_pad == 128, (gp, g_out)
    xs_rows = (2 * g_out.t + 2) * gp.wp
    return pl.pallas_call(
        _pp_fwd_kernel(gp, g_out, half),
        name=f"ppool_fwd_h{gp.h}w{gp.w}",
        out_shape=jax.ShapeDtypeStruct((g_out.rows, g_out.c_pad),
                                       jnp.bfloat16),
        grid=(g_out.total_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((g_out.block_rows, g_out.c_pad),
                               lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((xs_rows, gp.c_pad), jnp.bfloat16),
            pltpu.VMEM((xs_rows, gp.c_pad), jnp.bfloat16),
            pltpu.VMEM((g_out.block_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zfp)


def _pp_bwd_kernel(gp: FlatGeom, g_out: FlatGeom, half: int):
    wp1, wp2 = gp.wp, g_out.wp
    t1 = gp.t
    jt1, last = gp.jt, gp.total_tiles - 1
    h1, w1 = gp.h, 2 * gp.w
    co = g_out.c
    w2_rows = (t1 // 2 + 2) * wp2
    w_odd = (w1 % 2) == 1
    # in padded col s holds pair u' = s - 2; valid pairs 0..ceil(w1/2)-1
    last_col = g_out.w + 1

    def kernel(zout_hbm, gout_hbm, zin_ref, out_ref, zs0, zs1, gs0, gs1,
               sem):
        tt = pl.program_id(0)
        edge = (tt == 0) | (tt == last)

        @pl.when(edge)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def offset(tile):
            j = (tile - 1) % jt1
            n = (tile - 1) // jt1
            return j, pl.multiple_of(
                (g_out.t + n * g_out.hp + (j * t1) // 2) * wp2, 16)

        def copies(tile, slot):
            _, off = offset(tile)
            zs = zs0 if slot == 0 else zs1
            gs = gs0 if slot == 0 else gs1
            return (
                pltpu.make_async_copy(zout_hbm.at[pl.ds(off, w2_rows)],
                                      zs, sem.at[0, slot]),
                pltpu.make_async_copy(gout_hbm.at[pl.ds(off, w2_rows)],
                                      gs, sem.at[1, slot]),
            )

        def body(slot):
            zs = zs0 if slot == 0 else zs1
            gs = gs0 if slot == 0 else gs1
            j, _ = offset(tt)

            ss = jax.lax.broadcasted_iota(jnp.int32, (wp2, 1), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (wp2, 128), 1)
            is_hi = (lane >= half) & (lane < 2 * half)
            ch_ok = ((lane % half) < co) if half > co else (lane < 2 * half)
            col_ok = ((ss >= 2) & (ss <= last_col) & ch_ok
                      & (lane < 2 * half))
            if w_odd:
                col_ok = col_ok & ~(is_hi & (ss == last_col))
            is_hif = is_hi.astype(jnp.float32)

            # in rows pair (2k, 2k+1) onto one out row; share the expands
            for k in range(t1 // 2):
                lo_r = k + 1
                zo = zs[pl.ds(lo_r * wp2, wp2), :]
                go = gs[pl.ds(lo_r * wp2, wp2), :]
                # broadcast the out value/cotangent to both lane halves:
                # ADD of the +half lane shift — the out buffer is zero
                # outside lanes [0, co), so lo lanes keep their value
                # (x + 0) and hi lanes receive their lo partner (0 + x);
                # max would corrupt negative z values against the zeros
                e_z = zo + _lane_shift(zo, half)
                e_g = (go + _lane_shift(go, half)).astype(jnp.float32)

                m_top = None
                for r in (2 * k, 2 * k + 1):
                    zin_row = zin_ref[pl.ds(r * wp1, wp2), :]
                    # masked match bits: phantom matches on dead/pad lanes
                    # (0 == 0) must not propagate through the lane rolls
                    m_eq = jnp.where(
                        col_ok & (zin_row.astype(jnp.float32)
                                  == e_z.astype(jnp.float32)),
                        jnp.float32(1), jnp.float32(0))
                    # hi lanes defer to their lo partner's match
                    partner = pltpu.roll(m_eq, half, axis=1)
                    if r % 2 == 0:
                        route = m_eq * (1.0 - is_hif * partner)
                        m_top = m_eq
                    else:
                        # any match in the top row blocks the bottom row
                        any_top = jnp.maximum(
                            m_top,
                            jnp.maximum(
                                pltpu.roll(m_top, half, axis=1),
                                pltpu.roll(m_top, (-half) % 128, axis=1)))
                        route = (m_eq * (1.0 - any_top)
                                 * (1.0 - is_hif * partner))
                    q = j * t1 + r
                    row_ok = ((q >= 2) & (q <= h1 + 1)).astype(jnp.float32)
                    row = e_g * route * row_ok
                    out_ref[pl.ds(r * wp1, wp2), :] = row.astype(
                        out_ref.dtype)
                    if wp1 > wp2:
                        out_ref[pl.ds(r * wp1 + wp2, wp1 - wp2), :] = (
                            jnp.zeros((wp1 - wp2, out_ref.shape[-1]),
                                      out_ref.dtype))

        _dma_pipeline(tt, last, copies, body)

    return kernel


@functools.partial(jax.jit, static_argnames=("gp", "g_out", "interpret"))
def pool_packed_bwd_pallas(zin, zout, gout, gp: FlatGeom, g_out: FlatGeom,
                           interpret: bool = False):
    w2_rows = (gp.t // 2 + 2) * g_out.wp
    return pl.pallas_call(
        _pp_bwd_kernel(gp, g_out, gp.c // 2),
        name=f"ppool_bwd_h{gp.h}w{gp.w}",
        out_shape=jax.ShapeDtypeStruct((gp.rows, gp.c_pad), jnp.bfloat16),
        grid=(gp.total_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # zout
            pl.BlockSpec(memory_space=pl.ANY),  # gout
            pl.BlockSpec((gp.block_rows, gp.c_pad), lambda tt: (tt, 0),
                         memory_space=pltpu.VMEM),  # zin
        ],
        out_specs=pl.BlockSpec((gp.block_rows, gp.c_pad),
                               lambda tt: (tt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.VMEM((w2_rows, g_out.c_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(zout, gout, zin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pool_packed_p(zfp, gp: FlatGeom, g_out: FlatGeom,
                  interpret: bool = False):
    """Pallas ceil-mode 2x2/2 max pool, PACKED buffer -> natural buffer.

    Drop-in for flatconv.pool_packed (the XLA twin it is tested against):
    identical values and the reference's row-major-first argmax tie
    routing (top-lo, top-hi, bot-lo, bot-hi; MaxPool2d ceil_mode=True,
    networks/vgg_osvos.py:~120)."""
    return pool_packed_fwd_pallas(zfp, gp, g_out, interpret)


def _ppp_fwd(zfp, gp, g_out, interpret):
    out = pool_packed_fwd_pallas(zfp, gp, g_out, interpret)
    return out, (zfp, out)


def _ppp_bwd(gp, g_out, interpret, res, gf_out):
    zfp, zout = res
    dz = pool_packed_bwd_pallas(zfp, zout, gf_out.astype(jnp.bfloat16),
                                gp, g_out, interpret)
    return (dz,)


pool_packed_p.defvjp(_ppp_fwd, _ppp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pool_flat_p(zf, g_in: FlatGeom, g_out: FlatGeom,
                interpret: bool = False):
    """Pallas ceil-mode 2x2/2 max pool, flat buffer -> flat buffer.

    Drop-in for flatconv.pool_flat with both directions as single-pass
    kernels; identical values and tie routing (tested against it)."""
    return pool_flat_fwd_pallas(zf, g_in, g_out, interpret)


def _pfp_fwd(zf, g_in, g_out, interpret):
    out = pool_flat_fwd_pallas(zf, g_in, g_out, interpret)
    return out, (zf, out)


def _pfp_bwd(g_in, g_out, interpret, res, gf_out):
    zf, zout = res
    dz = pool_flat_bwd_pallas(zf, zout, gf_out.astype(jnp.bfloat16),
                              g_in, g_out, interpret)
    return (dz,)


pool_flat_p.defvjp(_pfp_fwd, _pfp_bwd)


# Fuse the last packed stage-1 conv with the stage-boundary pool (A/B
# knob, env-overridable for step A/Bs; see packed_conv_pool)
import os as _os

_FUSE_PACKED_CONV_POOL = _os.environ.get("OSVOS_FUSE_CONV_POOL", "1") != "0"

# Fuse the stage-boundary pool BACKWARD into the side kernel's epilogue
# (A/B knob; see _sap_bwd)
_FUSE_POOL_BWD = _os.environ.get("OSVOS_FUSE_POOL_BWD", "1") != "0"

# Fuse the stage-boundary pool FORWARD into the side kernel's epilogue
# (A/B knob; see side_and_pool / flatconv._side_fwd_kernel)
_FUSE_POOL_FWD = _os.environ.get("OSVOS_FUSE_POOL_FWD", "1") != "0"


def fuse_pool_fwd_ok(g_in: FlatGeom, g2: FlatGeom) -> bool:
    """Static gate for the fused side+pool forward: mirrors the geometry
    _side_fwd_kernel's pool epilogue supports (even t, pooled dims the
    ceil of the input's, stored pooled columns covering the valid
    width)."""
    p_len = min(g_in.wp // 2 - 1, g2.wp - 2)
    return (_FUSE_POOL_FWD and g_in.t % 2 == 0
            and g2.c == g_in.c and g2.c_pad == g_in.c_pad
            and g2.h == -(-g_in.h // 2) and g2.w == -(-g_in.w // 2)
            and p_len >= g2.w and g2.hp >= g_in.jt * (g_in.t // 2))


def fuse_conv_pool_ok(gp: FlatGeom, g2: FlatGeom, width: int) -> bool:
    """Static gate for packed_conv_pool: mirrors the geometry the fused
    epilogue supports (single 128-lane out tile, even dims, pooled width
    == packed width, pooled hp covering every produced row)."""
    from osvos_tpu.ops.pallas.flatconv import (_USE_MERGED_TAPS, _half_pad)

    return (_FUSE_PACKED_CONV_POOL and _USE_MERGED_TAPS
            and 2 * _half_pad(width) == 128 and g2.c == width
            and gp.h % 2 == 0 and gp.t % 2 == 0
            and g2.c_pad == 128 and g2.c <= 64
            and g2.w == gp.w and g2.wp == gp.wp and g2.h == gp.h // 2
            and g2.hp >= gp.jt * (gp.t // 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def packed_conv_pool(zfp, kernel, bias, gp: FlatGeom, g_out: FlatGeom,
                     interpret: bool = False):
    """Fused last-packed-conv + 2x2/2 ceil-mode max pool -> pooled buffer.

    The only consumer of stage 1's last activation is the stage-boundary
    pool (stage 1 has no side branch), so the pool rides the conv's
    epilogue (flatconv._fwd_kernel pool_out): the pooled rows are built
    from the conv-out tile while it is still in registers and DMA'd
    straight to the natural g_out buffer — the standalone pool kernel's
    full re-read of the packed stage buffer from HBM disappears. Values
    and argmax tie routing equal flat_conv3x3_packed + pool_packed_p
    exactly (reference MaxPool2d(2, ceil_mode=True) after the stage-1
    convs, networks/vgg_osvos.py:~120); the backward routes the pooled
    cotangent with the UNCHANGED pool_packed_bwd_pallas kernel, then
    runs the conv's usual fused one-pass backward."""
    return _pcp_fwd(zfp, kernel, bias, gp, g_out, interpret)[0][1]


def _pcp_fwd(zfp, kernel, bias, gp, g_out, interpret):
    from osvos_tpu.ops.pallas.flatconv import (_USE_MERGED_TAPS,
                                               _flat_conv_fwd_impl,
                                               packed_weights)
    import dataclasses as dc

    assert _USE_MERGED_TAPS, "fused conv+pool requires the merged-tap path"
    kp, bp = packed_weights(kernel, bias)
    gi = dc.replace(gp, c=kp.shape[2])
    zout, pooled = _flat_conv_fwd_impl(
        zfp, kp, bp, gi, kp.shape[3], False, interpret,
        merged=kp.shape[2] // 2, relu_output=True, pool_out=g_out)
    return (zout, pooled), (zfp, kernel, zout, pooled)


def _pcp_bwd(gp: FlatGeom, g_out: FlatGeom, interpret, res, cts):
    from osvos_tpu.ops.pallas.flatconv import (_flat_conv_bwd_fused_impl,
                                               _half_pad, packed_weights,
                                               unpack_dk_merged_cols)
    import dataclasses as dc

    zfp, kernel, zout, pooled = res
    _, d_pooled = cts
    ci, co = kernel.shape[2], kernel.shape[3]
    hi, ho = _half_pad(ci), _half_pad(co)
    gi_out = dc.replace(gp, c=2 * ho)
    kp, _ = packed_weights(kernel, jnp.zeros((co,), jnp.float32))
    gi = dc.replace(gp, c=kp.shape[2])
    if _FUSE_POOL_BWD:
        # one kernel: the pool backward's argmax routing runs in the conv
        # backward's prologue (the standalone pool-bwd kernel's zout
        # re-read and the full gf write + re-read disappear)
        dz, dkp, dbp = _flat_conv_bwd_fused_impl(
            zfp, None, kp, gi, kp.shape[3], False, interpret, merged=hi,
            pool_in=(zout, pooled, d_pooled.astype(jnp.bfloat16), g_out))
    else:
        gf = pool_packed_bwd_pallas(zout, pooled,
                                    d_pooled.astype(jnp.bfloat16),
                                    gi_out, g_out, interpret)
        dz, dkp, dbp = _flat_conv_bwd_fused_impl(zfp, gf, kp, gi,
                                                 kp.shape[3],
                                                 False, interpret, merged=hi)
    dk = unpack_dk_merged_cols(dkp, ci, co, hi, ho)
    db = (dbp[:co] + dbp[ho:ho + co]).astype(jnp.float32)
    return dz, dk.astype(kernel.dtype), db


def _pcp_fwd_vjp(zfp, kernel, bias, gp, g_out, interpret):
    (zout, pooled), res = _pcp_fwd(zfp, kernel, bias, gp, g_out, interpret)
    return pooled, res


def _pcp_bwd_vjp(gp, g_out, interpret, res, d_pooled):
    return _pcp_bwd(gp, g_out, interpret, res, (None, d_pooled))


packed_conv_pool.defvjp(_pcp_fwd_vjp, _pcp_bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def side_and_pool(zf, side_kernel, g_in: FlatGeom, g_out: FlatGeom,
                  interpret: bool = False):
    """(side_temp NHWC, pooled flat buffer) from one stage output.

    The two consumers of a stage's last activation are the side_prep conv
    and the 2x2 pool; fused here so the BACKWARD's stage-boundary merge
    ``dz = dz_side + dz_pool`` rides the side kernel's epilogue (one
    streamed add) instead of a separate full-buffer XLA add_any
    (~0.7 ms/step across the three fused boundaries at 480p batch 5),
    and the FORWARD pool rides the side kernel too (the side already
    streams every stage row — the standalone pool kernel's full re-read
    of the stage buffer disappears; OSVOS_FUSE_POOL_FWD=0 for A/Bs).
    Used by the flat trunk for stages 2-4 (stage 5 has no pool, stage 1
    no side); equals the unfused pair exactly."""
    import dataclasses as dc

    from osvos_tpu.ops.pallas.flatconv import (_flat_side_fwd_impl,
                                               from_flat)

    if fuse_pool_fwd_ok(g_in, g_out):
        sf, pooled = _flat_side_fwd_impl(zf, side_kernel, g_in, interpret,
                                         pool_out=g_out)
    else:
        pooled = pool_flat_fwd_pallas(zf, g_in, g_out, interpret)
        sf = _flat_side_fwd_impl(zf, side_kernel, g_in, interpret)
    side = from_flat(sf, dc.replace(g_in, c=side_kernel.shape[-1]))
    return side, pooled


def _sap_fwd(zf, side_kernel, g_in, g_out, interpret):
    side, pooled = side_and_pool(zf, side_kernel, g_in, g_out, interpret)
    return (side, pooled), (zf, side_kernel, pooled)


def _sap_bwd(g_in: FlatGeom, g_out: FlatGeom, interpret, res, cts):
    import dataclasses as dc

    from osvos_tpu.ops.pallas.flatconv import (_flat_side_bwd_impl,
                                               to_flat_haloed)

    zf, side_kernel, pooled = res
    d_side, d_pooled = cts
    # haloed-core cotangent: one pad pass instead of to_flat's two
    gf_flat = to_flat_haloed(d_side.astype(jnp.bfloat16),
                             dc.replace(g_in, c=side_kernel.shape[-1]))
    if _FUSE_POOL_BWD:
        # the pool backward routes INSIDE the side kernel's epilogue: the
        # side kernel already streams the stage activation tile (the
        # argmax reference), so the standalone pool-bwd kernel's full
        # re-read of the stage buffer + the dz_pool write+re-read vanish
        dz, dk, _ = _flat_side_bwd_impl(
            zf, gf_flat, side_kernel, g_in, interpret, src_haloed=True,
            pool=(g_out, pooled, d_pooled.astype(jnp.bfloat16)))
    else:
        dz_pool = pool_flat_bwd_pallas(zf, pooled,
                                       d_pooled.astype(jnp.bfloat16),
                                       g_in, g_out, interpret)
        dz, dk, _ = _flat_side_bwd_impl(zf, gf_flat, side_kernel, g_in,
                                        interpret, extra=dz_pool,
                                        src_haloed=True)
    return dz, dk.astype(side_kernel.dtype)


side_and_pool.defvjp(_sap_fwd, _sap_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def side_and_pool_fl(zf, side_kernel, g_in: FlatGeom, g_out: FlatGeom,
                     interpret: bool = False):
    """``side_and_pool`` that returns the side output IN THE FLAT LAYOUT
    ((rows, 128), zeros beyond lane D) and takes its cotangent in the
    same standard flat layout — see flatconv.flat_side_conv3x3_fl for
    why (the from_flat slice and the backward NHWC->flat re-pad both
    disappear under the flat collapsed head)."""
    from osvos_tpu.ops.pallas.flatconv import _flat_side_fwd_impl

    if fuse_pool_fwd_ok(g_in, g_out):
        return _flat_side_fwd_impl(zf, side_kernel, g_in, interpret,
                                   pool_out=g_out)
    pooled = pool_flat_fwd_pallas(zf, g_in, g_out, interpret)
    sf = _flat_side_fwd_impl(zf, side_kernel, g_in, interpret)
    return sf, pooled


def _sapf_fwd(zf, side_kernel, g_in, g_out, interpret):
    sf, pooled = side_and_pool_fl(zf, side_kernel, g_in, g_out, interpret)
    return (sf, pooled), (zf, side_kernel, pooled)


def _sapf_bwd(g_in: FlatGeom, g_out: FlatGeom, interpret, res, cts):
    from osvos_tpu.ops.pallas.flatconv import _flat_side_bwd_impl

    zf, side_kernel, pooled = res
    d_side, d_pooled = cts
    gf_flat = d_side.astype(jnp.bfloat16)  # already standard flat layout
    if _FUSE_POOL_BWD:
        dz, dk, _ = _flat_side_bwd_impl(
            zf, gf_flat, side_kernel, g_in, interpret, src_haloed=False,
            pool=(g_out, pooled, d_pooled.astype(jnp.bfloat16)))
    else:
        dz_pool = pool_flat_bwd_pallas(zf, pooled,
                                       d_pooled.astype(jnp.bfloat16),
                                       g_in, g_out, interpret)
        dz, dk, _ = _flat_side_bwd_impl(zf, gf_flat, side_kernel, g_in,
                                        interpret, extra=dz_pool,
                                        src_haloed=False)
    return dz, dk.astype(side_kernel.dtype)


side_and_pool_fl.defvjp(_sapf_fwd, _sapf_bwd)
