#!/usr/bin/env python
"""Per-kernel speed-of-light table for the flat online step.

Mirrors the kernel inventory OSVOS.__call__ emits in compute_mode='flat'
(vgg_osvos.py flat path) at a given batch/resolution, prices each kernel at
PADDED-dim tile-MACs (dims rounded to 128 lanes; dead hp/wp rows included —
the flat kernels stream padded rows, so this is the real cost model:
time ∝ rows × taps × K-tiles × N-tiles), and joins the measured per-kernel
ms/step from a named perfetto trace (scripts/profile_step.py --what chunk;
kernels are named by ops/pallas `pl.pallas_call(name=...)`).

Usage:
    python scripts/sol_table.py --trace /tmp/osvos_trace_r4b --steps 20
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e MXU peak in (128x128)-tile-MACs/s: 197 bf16 TFLOP/s / 2 / 128^2
PEAK_TILE_MACS = 6.0e9


def kernel_inventory(n: int, h: int, w: int, stages, side_ch: int = 16):
    """[(trace_name, tile_macs, what)] for the flat step fwd+bwd."""
    from osvos_tpu.ops.pallas.flatconv import (FlatGeom, _half_pad,
                                               _lane_pad, packed_geom,
                                               stage_t)

    out = []

    def interior_rows(g):
        return n * g.jt * g.t * g.wp

    def conv(name, g, c_pad, d_pad, taps, n_dots_scale=1.0, what=""):
        kt, nt = c_pad // 128, d_pad // 128
        tm = taps * interior_rows(g) * kt * nt * n_dots_scale
        out.append((name, tm, what))

    # ---- stage 1, packed (kernel names carry PACKED buffer dims) ----
    g = FlatGeom(n=n, h=h, w=w, c=3, t=stage_t(h))
    gp = packed_geom(g)
    w1 = stages[0][0]
    ci0 = 2 * _half_pad(3)
    conv(f"fconv_fwd_c{ci0}d128_h{gp.h}w{gp.w}_mrg", gp, 128, 128, 6,
         what="stem fwd (packed)")
    # stem bwd = wgrad only (image is a leaf): 6 merged taps
    conv(f"fconv_wgrad_c{ci0}d128_h{gp.h}w{gp.w}_mrg", gp, 128, 128, 6,
         what="stem wgrad")
    gp2 = FlatGeom(n=n, h=gp.h, w=gp.w, c=2 * _half_pad(w1), t=gp.t)
    for j, width in enumerate(stages[0][1:], start=1):
        last = j == len(stages[0]) - 1
        sfx = "_mrg_pool" if last else "_mrg"
        bsfx = "_mrg_pool" if last else "_mrg"
        conv(f"fconv_fwd_c128d128_h{gp2.h}w{gp2.w}{sfx}",
             gp2, 128, 128, 6, what=f"s1c{j} fwd" + (" +pool" if last else ""))
        conv(f"fconv_bwd_c128d128_h{gp2.h}w{gp2.w}{bsfx}",
             gp2, 128, 128, 12,
             what=f"s1c{j} fused bwd" + (" +pool-route" if last else ""))
        w1 = width
    # standalone packed pool bwd (only when OSVOS_FUSE_POOL_BWD=0)
    out.append((f"ppool_bwd_h{gp2.h}w{gp2.w}", 0, "s1 pool bwd (VPU only)"))

    # ---- stages 2..5, unpacked ----
    c = stages[0][-1]
    hh, ww = h, w
    n_stages = len(stages)
    for i, widths in enumerate(stages[1:], start=1):
        hh, ww = -(-hh // 2), -(-ww // 2)
        g = FlatGeom(n=n, h=hh, w=ww, c=c, t=stage_t(hh))
        for j, width in enumerate(widths):
            cp, dp = _lane_pad(c), _lane_pad(width)
            gi = FlatGeom(n=n, h=hh, w=ww, c=c, t=stage_t(hh))
            conv(f"fconv_fwd_c{c}d{width}_h{hh}w{ww}", gi, cp, dp, 9,
                 what=f"s{i + 1}c{j} fwd")
            # suffix mirrors flatconv's gate logic: _xp at c_pad >= 512
            # (_WGRAD_XPOSE_MIN), else _sp when the per-lane-tile split
            # wgrad applies (_WGRAD_SPLIT default, c_pad > 128)
            from osvos_tpu.ops.pallas import flatconv as _fc
            if _fc._WGRAD_XPOSE and cp >= _fc._WGRAD_XPOSE_MIN:
                xp = "_xp"
            elif _fc._WGRAD_SPLIT and cp > 128:
                xp = "_sp"
            else:
                xp = ""
            conv(f"fconv_bwd_c{c}d{width}_h{hh}w{ww}{xp}", gi, cp, dp, 18,
                 what=f"s{i + 1}c{j} fused bwd")
            c = width
        # side kernels: tap-stacked, D=16 -> 2 operand stacks
        gs = FlatGeom(n=n, h=hh, w=ww, c=c, t=stage_t(hh))
        cp = _lane_pad(c)
        kt = cp // 128
        rows = n * gs.jt * gs.t * gs.wp
        if i < n_stages - 1:
            sname = f"side_bwd_c{c}_h{hh}w{ww}_pool"
            # fused pool fwd (the default) names the kernel ..._pool; the
            # join below falls back to the un-suffixed name when the trace
            # was captured with OSVOS_FUSE_POOL_FWD=0
            fname = f"side_fwd_c{c}_h{hh}w{ww}_pool"
        else:
            sname = f"side_bwd_c{c}_h{hh}w{ww}"
            fname = f"side_fwd_c{c}_h{hh}w{ww}"
        from osvos_tpu.ops.pallas.flatconv import _SIDE_KW3
        sf_n, sb_n = (3, 6) if _SIDE_KW3 else (2, 4)
        out.append((fname, sf_n * rows * kt, f"s{i + 1} side fwd"))
        # bwd: dgrad dots (stack x K) + wgrad rows-contractions
        out.append((sname, sb_n * rows * kt, f"s{i + 1} side bwd"))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    args = ap.parse_args()

    from osvos_tpu.configs import ModelConfig

    inv = kernel_inventory(args.batch, args.height, args.width,
                           ModelConfig().stages)

    measured = {}
    if args.trace:
        path = sorted(glob.glob(os.path.join(
            args.trace, "plugins/profile/*/perfetto_trace.json.gz")))[-1]
        data = json.loads(gzip.open(path).read())
        events = data if isinstance(data, list) else data["traceEvents"]
        tpu_pids = {e.get("pid") for e in events
                    if e.get("ph") == "M" and e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))}
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in tpu_pids:
                nm = re.sub(r"\.\d+$", "", e["name"])
                measured[nm] = measured.get(nm, 0) + e.get("dur", 0)

    # several inventory rows share a kernel name (identical geometry =>
    # identical cost): split the trace aggregate evenly across them.
    # Fusion-gate env vars toggle a _pool suffix on some kernels; resolve
    # each inventory name to whichever variant the trace actually holds.
    def resolve(name):
        cands = {name}
        for nm in list(cands):  # toggle the _sp (split-wgrad) suffix
            cands.add(nm[:-3] if nm.endswith("_sp") else nm + "_sp")
        for nm in list(cands):  # toggle the _pool (fused-pool) suffix
            cands.add(nm[:-5] if nm.endswith("_pool") else nm + "_pool")
        if name in measured:
            return name
        for nm in sorted(cands - {name}):
            if nm in measured:
                return nm
        return name

    inv = [(resolve(name), tm, what) for name, tm, what in inv]
    ncopies = collections.Counter(name for name, _, _ in inv)
    tot_sol = tot_ms = 0.0
    print(f"{'kernel':46s} {'SOL ms':>7s} {'meas':>7s} {'eff':>5s}  what")
    for name, tm, what in inv:
        sol = tm / PEAK_TILE_MACS * 1e3
        ms = (measured.get(name, 0) / ncopies[name] / args.steps / 1e3
              if measured else 0.0)
        eff = f"{sol / ms * 100:4.0f}%" if ms > 0 and sol > 0 else "    -"
        tot_sol += sol
        tot_ms += ms
        print(f"{name:46s} {sol:7.3f} {ms:7.3f} {eff:>5s}  {what}")
    for name in ncopies:
        measured.pop(name, None)
    print(f"{'TOTAL pallas-conv/side':46s} {tot_sol:7.3f} {tot_ms:7.3f} "
          f"{tot_sol / tot_ms * 100 if tot_ms else 0:4.0f}%")
    if measured:
        rest = {k: v for k, v in measured.items()
                if v / args.steps / 1e3 >= 0.02
                and not k.startswith(("jit_", "while", "0"))}
        print("\nunmatched trace ops >= 0.02 ms/step:")
        for k, v in sorted(rest.items(), key=lambda kv: -kv[1]):
            print(f"  {v / args.steps / 1e3:7.3f}  {k}")


if __name__ == "__main__":
    main()
