"""The OSVOS network, TPU-first.

Functionally equivalent to the reference model (networks/vgg_osvos.py:~15
``OSVOS``/``make_layers_osvos``): a VGG-16 convolutional trunk in five
stages with ceil-mode 2x2 max pooling between them, and for each of stages
2-5 a 3x3 "side_prep" conv to 16 channels, a 1x1 "score_dsn" conv to one
logit channel, fixed bilinear upsampling of both back to input resolution
(transposed-conv semantics, see ops/upsample.py), a center crop to the input
size, and a final 1x1 "fuse" conv over the concatenated 64-channel side
features. ``__call__`` returns ``[side1..side4, fuse]`` logit maps exactly
like the reference's ``forward`` (vgg_osvos.py:~60).

TPU-native choices (not a translation):
- NHWC layout throughout; channels map onto the 128-wide lane dimension.
- Params live in float32; ``compute_mode='fast'`` casts activations and
  weights to bfloat16 so convs hit the MXU at full rate, while the four
  score_dsn / fuse logit convs accumulate in float32.
- The frozen bilinear upsamplers are constants folded into the program, not
  parameters (the reference trains them at lr=0 forever, so there is no
  observable difference; surgery.load_torch_state_dict asserts any imported
  checkpoint agrees with the bilinear kernel).
- No Python-level dynamism: every shape is static under jit; pooling pads
  are computed from static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from osvos_tpu.configs import ModelConfig
from osvos_tpu.ops.crop import center_crop
from osvos_tpu.ops.pool import max_pool_ceil
from osvos_tpu.ops.upsample import bilinear_upsample

# Fold side_prep + [fuse|score] head into one 2-channel 3x3 conv in the
# flat 'stacked' path (A/B knob; see the fold comment in __call__).
# DEFAULT OFF — chip A/B (round 5) measured the fold SLOWER: 43.96
# ms/step vs 42.2 unfolded, even with stride-8 tap lanes. The side
# kernels' cost is d-independent (row-streams x taps x lane tiles), so
# the fold saves nothing there, and it trades the XLA head dot — whose
# VJP is one MXU dot producing the flat cotangent — for from_flat(c=2)
# whose VJP is a 2->128-lane pad over the full flat buffer, the exact
# pad class the round-2 ledger already measured expensive. Kept as a
# tested capability (test_folded_side_head_matches_unfolded).
import os as _os

_FOLD_SIDE = _os.environ.get("OSVOS_FOLD_SIDE", "0") == "1"


class _Int8Conv(nn.Module):
    """3x3 conv computed on the int8 MXU path: float32 params with
    nn.Conv-compatible names/shapes (checkpoints interchange freely),
    per-output-channel symmetric weight quantization at trace time, and
    per-tensor activation quantization — static (``act_scale`` from
    calibration, models/quantize.py) or dynamic (per-batch max|x|; exact
    but pays one full activation reduction per conv). Accumulates in int32
    and dequantizes into ``out_dtype``. Inference-only — no gradient flows
    through the rounding.
    """

    features: int
    kernel_size: int = 3
    out_dtype: jnp.dtype = jnp.bfloat16
    act_scale: Optional[float] = None  # static max|x|-scale; None -> dynamic

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 act_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``act_scale``: optional TRACED max|x| scalar overriding the
        static ``self.act_scale`` — lets batched multi-sequence inference
        feed per-sequence calibration through one compiled program
        (scales as operands, not baked constants)."""
        k = self.kernel_size
        in_feats = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, in_feats, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # weights: symmetric per-output-channel
        w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2), keepdims=True) \
            / 127.0 + 1e-30
        w_q = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
        if act_scale is not None:
            x_scale = jnp.asarray(act_scale, jnp.float32) / 127.0
        elif self.act_scale is not None:
            x_scale = jnp.float32(self.act_scale / 127.0)
        else:
            x_scale = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-30
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                       -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            x_q, w_q, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (x_scale * w_scale[0, 0, 0]) + bias
        return out.astype(self.out_dtype)


class _FastConv(nn.Module):
    """3x3 SAME conv via ops.fastconv.conv3x3_same — relayout-free weight
    gradients (see that module). nn.Conv-compatible param tree."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from osvos_tpu.ops.fastconv import conv3x3_same

        in_feats = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_feats, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return conv3x3_same(x, kernel) + bias.astype(x.dtype)


class _ConvParams3x3(nn.Module):
    """Bare (kernel, bias) for a 3x3 conv with nn.Conv-compatible tree
    layout — the flat-layout trunk (ops/pallas/flatconv.py) consumes the
    raw params, so checkpoints interchange with every other mode."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _Conv1x1Params(nn.Module):
    """Bare (kernel, bias) for a 1x1 conv, with nn.Conv-compatible tree
    layout — lets the fused inference head slice the fuse kernel per side
    branch while checkpoints stay interchangeable with the train path."""

    in_features: int
    features: int = 1

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class OSVOS(nn.Module):
    """VGG-16 FCN with deeply-supervised side outputs and a fusion head."""

    config: ModelConfig = dataclasses.field(default_factory=ModelConfig)

    def _precision(self):
        return (lax.Precision.HIGHEST if self.config.compute_mode == "parity"
                else lax.Precision.DEFAULT)

    def _compute_dtype(self):
        return (jnp.float32 if self.config.compute_mode == "parity"
                else jnp.bfloat16)

    def _use_int8(self, in_feats: int) -> bool:
        # int8 trunk: quantize only the lane-saturating convs; the 3-channel
        # stem conv stays bf16 (negligible FLOPs, large relative error).
        return self.config.compute_mode == "int8" and in_feats >= 8

    def _flat_convs(self, zf, g, widths, sname: str, j0: int,
                    interpret: bool):
        """Chain flat 3x3 convs over a stage; returns (zf, g) after.

        Buffers hold POST-relu activations: each conv fuses max(., 0)
        into its epilogue (free) so no consumer pays a ReLU pass."""
        from osvos_tpu.ops.pallas.flatconv import flat_conv3x3

        for j, width in enumerate(widths, start=j0):
            kernel, bias = _ConvParams3x3(in_features=g.c, features=width,
                                          name=f"{sname}_conv{j}")()
            zf = flat_conv3x3(zf, kernel, bias, g, False, interpret, True)
            g = dataclasses.replace(g, c=width)
        return zf, g

    @nn.compact
    def __call__(self, x: jnp.ndarray, mode: str = "train",
                 act_scales: Optional[jnp.ndarray] = None
                 ) -> List[jnp.ndarray]:
        """x: (N, H, W, 3) preprocessed frames (BGR minus caffe mean).

        act_scales: optional (n_trunk_convs,) float32 array of TRACED
        per-conv max|input| calibration scales for the int8 trunk,
        overriding the static ``config.int8_scales`` — the batched
        val-protocol path feeds per-sequence calibration through one
        compiled program this way (see parallel/batched_online.py).

        mode='train': five (N, H, W, 1) float32 logit maps — four side
        outputs and the fused output, the reference ``forward`` order
        (vgg_osvos.py:~60).

        mode='infer': ``[fused]`` only, via the algebraically-identical
        fused head: the frozen bilinear upsample is channel-diagonal and
        ``fuse`` is 1x1, so they commute —
        ``fuse(cat_i(crop(up(f_i)))) = sum_i crop(up(f_i @ W_i)) + b``.
        Each side branch collapses to one channel *before* upsampling,
        cutting full-resolution HBM traffic ~16x and skipping the unused
        score_dsn branches (the reference computes them at test time but
        only consumes outputs[-1], train_online.py:~135).

        mode='infer_parts': returns the *pre-upsample* pieces for the Pallas
        fused tail (ops/pallas/fused_head.py): ``[c_1..c_4, bias]`` where
        ``c_i`` is the (N, h_i, w_i, 1) low-res fused contribution of side
        branch i and ``bias`` the fuse bias — everything after this point
        (upsample, crop, sum, sigmoid, uint8) happens inside one kernel.
        """
        cfg = self.config
        assert mode in ("train", "infer", "infer_parts"), mode
        # int8 rounding has zero gradient a.e. — a fine-tune against an int8
        # trunk would silently train nothing; fail loudly instead.
        assert not (cfg.compute_mode == "int8" and mode == "train"), (
            "compute_mode='int8' is inference-only (round/clip have zero "
            "gradients); use 'fast' or 'parity' for training")
        dtype = self._compute_dtype()
        prec = self._precision()
        f32_prec = (lax.Precision.HIGHEST if cfg.compute_mode == "parity"
                    else prec)
        up_method = "conv" if cfg.compute_mode == "parity" else "matmul"
        crop_h, crop_w = x.shape[1], x.shape[2]
        x = x.astype(dtype)

        conv = lambda feats, k, name: nn.Conv(  # noqa: E731
            feats, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=dtype, param_dtype=jnp.float32, precision=prec, name=name)

        trunk_idx = [0]  # position in stage_conv_names order

        def trunk_conv(v, feats, name):
            idx = trunk_idx[0]
            trunk_idx[0] += 1
            if self._use_int8(v.shape[-1]):
                scale = (cfg.int8_scales[idx]
                         if cfg.int8_scales is not None else None)
                traced = act_scales[idx] if act_scales is not None else None
                return _Int8Conv(features=feats, kernel_size=3,
                                 out_dtype=dtype, act_scale=scale,
                                 name=name)(v, act_scale=traced)
            if cfg.compute_mode == "fast" and cfg.fast_conv_vjp:
                return _FastConv(features=feats, name=name)(v)
            return conv(feats, 3, name)(v)

        n_sides = len(cfg.stages) - 1
        fuse_kernel, fuse_bias = _Conv1x1Params(
            in_features=n_sides * cfg.side_channels, name="fuse")()

        # 'flat' trunk: everything from the image to the side taps stays
        # in the flat layout — stem, stage convs, pooling and side_prep
        # all run on flat POST-relu buffers (each conv fuses max(., 0)
        # into its epilogue, so consumers skip the ReLU pass; this also
        # pools post-relu values exactly like the 'fast' path). The
        # only NHWC materializations are the tiny 16-channel side_temps.
        flat = cfg.compute_mode == "flat"
        flat_pooled = None  # (buffer, geom) carried from a fused conv/side+pool
        if flat:
            from osvos_tpu.ops.pallas.flatconv import (
                FlatGeom, _half_pad, flat_conv3x3, flat_conv3x3_input,
                flat_conv3x3_input_packed, flat_conv3x3_packed, from_flat,
                pack_image_haloed, packed_geom, pool_flat, pool_out_geom,
                stage_t, to_flat_haloed)
            from osvos_tpu.ops.pallas import flatpool as _fp

            interp = jax.default_backend() != "tpu"
            n, hh, ww = x.shape[0], x.shape[1], x.shape[2]
            g = FlatGeom(n=n, h=hh, w=ww, c=x.shape[3], t=stage_t(hh))
            # pixel-pair packing for the stem + stage 1 (c <= 64 runs with
            # half-empty lanes otherwise); needs even frame dims
            packed = (hh % 2 == 0) and (ww % 2 == 0)
            k0, b0 = _ConvParams3x3(in_features=g.c,
                                    features=cfg.stages[0][0],
                                    name="stage1_conv0")()
            if packed:
                gp = packed_geom(g)
                # haloed-core image buffer: ONE full-buffer pad pass
                # instead of to_flat's two (~0.84 ms/step at 480p batch 5
                # of pure zero-copy on the 278 MB packed image buffer)
                zf = pack_image_haloed(x, gp)
                zf = flat_conv3x3_input_packed(zf, k0, b0, gp, interp,
                                               True, True)
                gp = dataclasses.replace(
                    gp, c=2 * _half_pad(cfg.stages[0][0]))
                g = dataclasses.replace(g, c=cfg.stages[0][0])
                s1 = cfg.stages[0]
                for j, width in enumerate(s1[1:], start=1):
                    kj, bj = _ConvParams3x3(in_features=g.c, features=width,
                                            name=f"stage1_conv{j}")()
                    g_next = dataclasses.replace(g, c=width)
                    fuse_pool = False
                    if j == len(s1) - 1:
                        # only the stage's LAST conv can host the
                        # stage-boundary pool in its epilogue
                        g2 = pool_out_geom(g_next, stage_t(-(-g.h // 2)))
                        fuse_pool = _fp.fuse_conv_pool_ok(gp, g2, width)
                    if fuse_pool:
                        # the stage-boundary pool rides this conv's
                        # epilogue (stage 1 has no side branch, so the
                        # pool is the activation's only consumer)
                        zf = _fp.packed_conv_pool(zf, kj, bj, gp, g2,
                                                  interp)
                        flat_pooled = (zf, g2)
                    else:
                        zf = flat_conv3x3_packed(zf, kj, bj, gp, interp,
                                                 False, True)
                    gp = dataclasses.replace(gp, c=2 * _half_pad(width))
                    g = g_next
            else:
                zf = to_flat_haloed(x, g)
                zf = flat_conv3x3_input(zf, k0, b0, g, interp, True, True)
                g = dataclasses.replace(g, c=cfg.stages[0][0])
                zf, g = self._flat_convs(zf, g, cfg.stages[0][1:],
                                         "stage1", 1, interp)
        else:
            for j, width in enumerate(cfg.stages[0]):
                x = nn.relu(trunk_conv(x, width, f"stage1_conv{j}"))

        side_feats: List[jnp.ndarray] = []
        side_logits: List[jnp.ndarray] = []
        fused_contribs: List[jnp.ndarray] = []
        for i, widths in enumerate(cfg.stages[1:], start=1):
            if flat:
                from osvos_tpu.ops.pallas.flatpool import (pool_flat_p,
                                                           pool_packed_p,
                                                           side_and_pool)

                if flat_pooled is not None:
                    zf, g = flat_pooled
                    flat_pooled = None
                else:
                    g2 = pool_out_geom(g, stage_t(-(-g.h // 2)))
                    if i == 1 and packed:
                        zf = pool_packed_p(zf, gp, g2, interp)
                    else:
                        zf = pool_flat_p(zf, g, g2, interp)
                    g = g2
                zf, g = self._flat_convs(zf, g, widths, f"stage{i + 1}", 0,
                                         interp)
                ks, bs = _ConvParams3x3(in_features=g.c,
                                        features=cfg.side_channels,
                                        name=f"side_prep{i}")()
                side_flat = None
                if cfg.flat_side == "stacked":
                    # Pallas forward + Pallas tap-stacked backward: the
                    # nine taps stack into two 128-lane operands built
                    # in-kernel, so the side's dgrad+wgrad run 2+2
                    # row-streams instead of 9+9 (51.4 -> 49.5 ms/step;
                    # see flat_side_conv3x3 / ModelConfig.flat_side).
                    # The side activation STAYS IN THE FLAT LAYOUT: the
                    # collapsed head below consumes it through one flat
                    # 1x1 dot, so neither the 16-of-128-lane from_flat
                    # slice nor the backward's NHWC->flat re-pad is paid
                    # (0.43 + 0.43 ms/step at s2 alone, perfetto r5a).
                    from osvos_tpu.ops.pallas.flatconv import (
                        flat_side_conv3x3_fl)
                    from osvos_tpu.ops.pallas.flatpool import (
                        side_and_pool_fl)

                    # head weights, hoisted: the whole side branch is
                    # LINEAR (reference has no nonlinearity between
                    # side_prep and score_dsn/fuse, vgg_osvos.py:~60),
                    # so with _FOLD_SIDE the 3x3 c->16 side_prep and the
                    # 1x1 16->2 [fuse-contrib | score] head fold into
                    # ONE 2-channel 3x3 conv K2 = Ks @ Wcat run by the
                    # same tap-stacked kernels at d=2 — the kernels' dot
                    # streams halve and the XLA head dots (fwd 135 MB
                    # read + bwd cotangent write at s2) disappear.
                    # Autodiff through the einsum hands dK2 back to
                    # side_prep AND score/fuse weights exactly.
                    sl = slice((i - 1) * cfg.side_channels,
                               i * cfg.side_channels)
                    ksc, bsc = _Conv1x1Params(in_features=cfg.side_channels,
                                              name=f"score_dsn{i}")()
                    w_f = fuse_kernel[0, 0, sl, 0].astype(jnp.float32)
                    w_s = ksc[0, 0, :, 0]
                    wcat = jnp.stack([w_f, w_s], axis=1)  # (16, 2) f32
                    b2 = jnp.stack([bs @ w_f, bs @ w_s + bsc[0]])
                    if _FOLD_SIDE:
                        k_side = jnp.einsum("hwcd,do->hwco", ks, wcat)
                    else:
                        k_side = ks

                    if i < len(cfg.stages) - 1:
                        # fuse this stage's side with the NEXT stage's
                        # pool: the backward's dz_side + dz_pool merge
                        # rides the side kernel's epilogue instead of a
                        # full-buffer add (see flatpool.side_and_pool)
                        g2 = pool_out_geom(g, stage_t(-(-g.h // 2)))
                        side_flat, zp = side_and_pool_fl(zf, k_side, g,
                                                         g2, interp)
                        flat_pooled = (zp, g2)
                    else:
                        side_flat = flat_side_conv3x3_fl(zf, k_side, g,
                                                         interp)
                elif cfg.flat_side == "xla":
                    # The flat kernels price a conv at row-streams x taps x
                    # lane TILES — a 16-channel side output pays a full
                    # 128-lane tile (x9 taps, x3 passes) for 12.5% utility,
                    # ~7.5 ms/step across the four sides. XLA does the real
                    # FLOPs — but MEASURED SLOWER (59.9 vs 57.9 ms/step):
                    # its conv backward reintroduces relayout churn. Kept
                    # as an A/B knob; see ModelConfig.flat_side.
                    # (zf holds post-relu activations already.)
                    side_temp = lax.conv_general_dilated(
                        from_flat(zf, g), ks.astype(jnp.bfloat16), (1, 1),
                        ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                else:
                    sf = flat_conv3x3(zf, ks, jnp.zeros_like(bs), g, False,
                                      interp, False)
                    side_temp = from_flat(
                        sf, dataclasses.replace(g, c=cfg.side_channels))
                # bias is added in XLA (not a kernel epilogue): its
                # gradient is cancellation-heavy and this keeps the same
                # excess-precision reduce the 'fast' path gets. (The
                # flat-layout side folds it into the collapse constants
                # below instead: (side + b) @ w == side @ w + b @ w.)
                if side_flat is None:
                    side_temp = side_temp + bs.astype(side_temp.dtype)
            else:
                x = max_pool_ceil(x)
                for j, width in enumerate(widths):
                    x = nn.relu(trunk_conv(x, width, f"stage{i + 1}_conv{j}"))
            factor = 2 ** i
            if not flat:
                side_temp = conv(cfg.side_channels, 3, f"side_prep{i}")(x)

            # the fused head collapses each side branch to ONE channel
            # BEFORE upsampling (the frozen bilinear up is channel-diagonal
            # and fuse is 1x1, so they commute — tested equal to the
            # concat form). Train mode uses it too except under 'parity',
            # which keeps the reference-shaped concat graph for the
            # f64-oracle tests: the collapse cuts full-res HBM traffic
            # ~16x and drops the 64-ch f32 concat from the parent step
            # (116.5 -> measured anew in bench extra_metrics).
            collapse_fuse = (mode in ("infer", "infer_parts")
                             or cfg.compute_mode != "parity")
            if flat and side_flat is not None:
                # flat-space collapsed head: with _FOLD_SIDE the side
                # kernel already emitted [fuse-contribution | score] in
                # lanes 0..1 (K2-folded conv) — only the bias constants
                # remain; otherwise ONE (rows, 128) x (128, 2) f32 dot
                # collapses the 16-lane side buffer (flat always
                # collapses — compute_mode != 'parity').
                if _FOLD_SIDE:
                    flat2 = side_flat
                else:
                    wpad = jnp.pad(wcat,
                                   ((0, 128 - cfg.side_channels), (0, 0)))
                    flat2 = side_flat.astype(jnp.float32) @ wpad
                both = from_flat(flat2,
                                 dataclasses.replace(g, c=2)
                                 ).astype(jnp.float32) + b2
                contrib = both[..., :1]
                if mode == "infer_parts":
                    fused_contribs.append(contrib)
                else:
                    fused_contribs.append(center_crop(
                        bilinear_upsample(contrib, factor,
                                          precision=f32_prec,
                                          method=up_method),
                        crop_h, crop_w))
                if mode in ("infer", "infer_parts"):
                    continue
                score = both[..., 1:]
                side_logits.append(center_crop(
                    bilinear_upsample(score, factor,
                                      precision=lax.Precision.HIGHEST,
                                      method=up_method), crop_h, crop_w))
                continue
            if collapse_fuse:
                sl = slice((i - 1) * cfg.side_channels, i * cfg.side_channels)
                w_i = fuse_kernel[0, 0, sl, :].astype(jnp.float32)
                contrib = side_temp.astype(jnp.float32) @ w_i
                if mode == "infer_parts":
                    fused_contribs.append(contrib)
                else:
                    fused_contribs.append(center_crop(
                        bilinear_upsample(contrib, factor, precision=f32_prec,
                                          method=up_method), crop_h, crop_w))
                if mode in ("infer", "infer_parts"):
                    continue
            else:
                # 16-ch full-res feature for fusion (parity train graph)
                feat = center_crop(
                    bilinear_upsample(side_temp, factor, precision=prec,
                                      method=up_method), crop_h, crop_w)
                side_feats.append(feat)
            # 1-ch logit side output (score_dsn accumulates in f32)
            score = nn.Conv(1, (1, 1), dtype=jnp.float32,
                            param_dtype=jnp.float32, precision=f32_prec,
                            name=f"score_dsn{i}")(side_temp.astype(jnp.float32))
            side_logits.append(center_crop(
                bilinear_upsample(score, factor,
                                  precision=lax.Precision.HIGHEST,
                                  method=up_method), crop_h, crop_w))

        if mode == "infer_parts":
            return fused_contribs + [fuse_bias]

        if mode == "infer":
            out = sum(fused_contribs) + fuse_bias
            return [out.astype(jnp.float32)]

        if side_feats:
            # parity: the reference-shaped concat + 1x1 fuse graph
            fused_in = jnp.concatenate(side_feats,
                                       axis=-1).astype(jnp.float32)
            out = lax.conv_general_dilated(
                fused_in, fuse_kernel, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=f32_prec) + fuse_bias
        else:
            out = sum(fused_contribs) + fuse_bias
        return [o.astype(jnp.float32) for o in side_logits] + [out]


def stage_conv_names(stages: Sequence[Sequence[int]] = ModelConfig().stages
                     ) -> List[Tuple[str, int, int]]:
    """(param_name, in_ch, out_ch) for the trunk convs in forward order —
    the index-matched walk used when porting torchvision VGG-16 features
    (vgg_osvos.py:~95)."""
    names = []
    in_ch = 3
    for i, widths in enumerate(stages):
        for j, width in enumerate(widths):
            names.append((f"stage{i + 1}_conv{j}", in_ch, width))
            in_ch = width
    return names
