"""Flat-layout conv trunk kernels vs their XLA twin (interpret mode).

Covers the three Pallas passes (fwd / dgrad / wgrad+db) of
osvos_tpu/ops/pallas/flatconv.py on geometry variants that exercise the
alignment edge cases: odd widths, widths where w+2 is already a multiple
of 16, heights not divisible by the block size, and multi-tile channel
blocks. The twin (flat_conv3x3_ref) is plain lax.conv_general_dilated on
the un-flattened view — the same math the reference's Conv2d+ReLU chains
compute (networks/vgg_osvos.py:~120).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osvos_tpu.ops.pallas.flatconv import (FlatGeom, flat_conv3x3,
                                           flat_conv3x3_ref, from_flat,
                                           to_flat)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


GEOMS = [
    # (n, h, w, c, d, t)
    (2, 6, 10, 8, 16, 4),     # generic small
    (1, 5, 14, 8, 8, 4),      # w+2 == 16 exactly; h % t != 0
    (2, 9, 27, 16, 8, 8),     # wider-than-one-tile wp, odd w
    (1, 4, 6, 130, 8, 4),     # c > 128: multi-lane-tile contraction
    (1, 4, 6, 512, 8, 4),     # c_pad == 512: the _WGRAD_XPOSE fused-bwd gate
]


def _mk(rng, geom_tuple):
    n, h, w, c, d, t = geom_tuple
    g = FlatGeom(n=n, h=h, w=w, c=c, t=t)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    zf = to_flat(x, g)
    k = jnp.asarray(0.1 * rng.randn(3, 3, c, d).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    return g, zf, k, b


@pytest.mark.parametrize("geom_tuple", GEOMS)
def test_flat_conv_forward_matches_twin(rng, geom_tuple):
    g, zf, k, b = _mk(rng, geom_tuple)
    out = flat_conv3x3(zf, k, b, g, True, True)
    ref = flat_conv3x3_ref(zf, k, b, g)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-2)
    # pads must be exactly zero (load-bearing for the next layer)
    g_out = FlatGeom(n=g.n, h=g.h, w=g.w, c=k.shape[-1], t=g.t)
    ones = jnp.ones((g.n, g.h, g.w, k.shape[-1]), jnp.float32)
    flat_valid = np.asarray(to_flat(ones, g_out), np.float32)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32) * (flat_valid == 0), 0.0)


@pytest.mark.parametrize("geom_tuple", GEOMS)
def test_flat_conv_grads_match_twin(rng, geom_tuple):
    g, zf, k, b = _mk(rng, geom_tuple)
    d = k.shape[-1]
    g_out = FlatGeom(n=g.n, h=g.h, w=g.w, c=d, t=g.t)
    r = jnp.asarray(rng.randn(g.n, g.h, g.w, d).astype(np.float32))

    def loss_pallas(zf, k, b):
        out = flat_conv3x3(zf, k, b, g, True, True)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    def loss_ref(zf, k, b):
        out = flat_conv3x3_ref(zf, k, b, g)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(zf, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zf, k, b)
    scale_z = np.abs(np.asarray(gr[0], np.float32)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[0], np.float32),
                               np.asarray(gr[0], np.float32),
                               atol=3e-2 * scale_z)
    scale_k = np.abs(np.asarray(gr[1])).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=3e-2 * scale_k)
    scale_b = np.abs(np.asarray(gr[2])).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gr[2]),
                               atol=3e-2 * scale_b)


def test_fused_bwd_xpose_matches_rows_contraction(rng, monkeypatch):
    """The once-per-tile transposed-operand wgrad formulation
    (_WGRAD_XPOSE, used at c_pad >= 512) must equal the rows-contraction
    dots — same contraction, same order, only the MXU orientation moves."""
    import dataclasses

    from osvos_tpu.ops.pallas import flatconv as fc

    g, zf, k, b = _mk(rng, (1, 4, 6, 512, 8, 4))
    d = k.shape[-1]
    gf = to_flat(jnp.asarray(rng.randn(g.n, g.h, g.w, d), jnp.float32),
                 dataclasses.replace(g, c=d)).astype(jnp.bfloat16)

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(fc, "_WGRAD_XPOSE", flag)
        outs[flag] = fc._flat_conv_bwd_fused_impl(zf, gf, k, g, d, True,
                                                  True)
    for a, b_ in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("xpose", [False, True])
@pytest.mark.parametrize("geom_tuple", [GEOMS[0], GEOMS[3], GEOMS[4]])
def test_fused_bwd_wide_matches_per_dot(rng, geom_tuple, xpose,
                                        monkeypatch):
    """The lane-stacked wide wgrad (_WGRAD_WIDE: [xs|ym+1|ym-1] blocks,
    one 3x-wide rows-contraction per kh) must equal the per-dot fused
    backward bit-for-bit in every gradient, with and without the
    transposed-operand orientation."""
    import dataclasses

    from osvos_tpu.ops.pallas import flatconv as fc

    g, zf, k, b = _mk(rng, geom_tuple)
    d = k.shape[-1]
    gf = to_flat(jnp.asarray(rng.randn(g.n, g.h, g.w, d), jnp.float32),
                 dataclasses.replace(g, c=d)).astype(jnp.bfloat16)

    monkeypatch.setattr(fc, "_WGRAD_XPOSE", xpose)
    monkeypatch.setattr(fc, "_WGRAD_XPOSE_MIN", 0)
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(fc, "_WGRAD_WIDE", flag)
        outs[flag] = fc._flat_conv_bwd_fused_impl(zf, gf, k, g, d, True,
                                                  True)
    for a, b_ in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("geom_tuple", [GEOMS[0], GEOMS[3], GEOMS[4]])
def test_fused_bwd_split_matches_single_dot(rng, geom_tuple, monkeypatch):
    """The per-128-lane-tile wgrad dots (_WGRAD_SPLIT) must equal the
    single wide rows-contraction bit-for-bit: splitting the OUTPUT c dim
    into lane tiles leaves the contraction and its order unchanged for
    every dk element."""
    import dataclasses

    from osvos_tpu.ops.pallas import flatconv as fc

    g, zf, k, b = _mk(rng, geom_tuple)
    d = k.shape[-1]
    gf = to_flat(jnp.asarray(rng.randn(g.n, g.h, g.w, d), jnp.float32),
                 dataclasses.replace(g, c=d)).astype(jnp.bfloat16)

    monkeypatch.setattr(fc, "_WGRAD_XPOSE", False)
    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(fc, "_WGRAD_SPLIT", flag)
        outs[flag] = fc._flat_conv_bwd_fused_impl(zf, gf, k, g, d, True,
                                                  True)
    for a, b_ in zip(outs[False], outs[True]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=0, atol=0)


def test_flat_side_fl_matches_nhwc_variant(rng):
    """flat_side_conv3x3_fl (flat in/out, flat cotangent) must give the
    same forward values and the same (dz, dK) as the NHWC-returning
    flat_side_conv3x3 under the flat collapsed head's consumption
    pattern (a 1x1 dot with zero weights beyond lane D)."""
    import dataclasses

    from osvos_tpu.ops.pallas.flatconv import (flat_side_conv3x3,
                                               flat_side_conv3x3_fl)

    n, h, w, c, d, t = 2, 6, 10, 8, 8, 4
    g = FlatGeom(n=n, h=h, w=w, c=c, t=t)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    zf = to_flat(jnp.maximum(x, 0), g)  # post-relu convention
    k = jnp.asarray(0.1 * rng.randn(3, 3, c, d).astype(np.float32))
    wcol = jnp.asarray(rng.randn(d, 2).astype(np.float32))
    wpad = jnp.pad(wcol, ((0, 128 - d), (0, 0)))
    g_out = dataclasses.replace(g, c=d)

    g2 = dataclasses.replace(g, c=2)
    r2 = jnp.asarray(rng.randn(n, h, w, 2).astype(np.float32))

    def loss_fl(zf, k):
        # production consumption: the collapse dot, then from_flat
        # slices the valid region (pad-row cotangents are exactly zero)
        sf = flat_side_conv3x3_fl(zf, k, g, True)
        return jnp.sum(from_flat(sf.astype(jnp.float32) @ wpad, g2) * r2)

    def loss_nhwc(zf, k):
        side = flat_side_conv3x3(zf, k, g, True)
        return jnp.sum((side.astype(jnp.float32) @ wcol) * r2)

    (lf, gf_), (ln, gn) = (jax.value_and_grad(f, argnums=(0, 1))(zf, k)
                           for f in (loss_fl, loss_nhwc))
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-5)
    for a, b_ in zip(gf_, gn):
        scale = np.abs(np.asarray(b_, np.float32)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=1e-5 * scale)
    # forward values agree with from_flat of the flat buffer
    sf = flat_side_conv3x3_fl(zf, k, g, True)
    np.testing.assert_array_equal(
        np.asarray(from_flat(sf, g_out)),
        np.asarray(flat_side_conv3x3(zf, k, g, True)))


@pytest.mark.parametrize("geom_tuple", GEOMS[:3])
def test_haloed_core_layout_matches_standard(rng, geom_tuple):
    """The one-pad haloed-core input layout (to_flat_haloed +
    src_haloed=True) must give the exact same conv results — forward and
    weight gradients — as the lead/tail layout, on the stem op (the only
    production consumer class: manually-DMA'd, never differentiated
    w.r.t. the buffer)."""
    from osvos_tpu.ops.pallas.flatconv import (flat_conv3x3_input,
                                               to_flat_haloed)

    g, zf, k, b = _mk(rng, geom_tuple)
    x = from_flat(zf, g)  # the same bf16 image both layouts pack
    zf_h = to_flat_haloed(x, g)

    out_std = flat_conv3x3_input(zf, k, b, g, True, True)
    out_hal = flat_conv3x3_input(zf_h, k, b, g, True, True, True)
    np.testing.assert_array_equal(np.asarray(out_std, np.float32),
                                  np.asarray(out_hal, np.float32))

    # weight gradients through the wgrad kernel's haloed DMA path
    r = jnp.asarray(rng.randn(*out_std.shape).astype(np.float32))
    dk_std, db_std = jax.grad(
        lambda kk, bb: jnp.sum(flat_conv3x3_input(zf, kk, bb, g, True,
                                                  True).astype(jnp.float32)
                               * r), argnums=(0, 1))(k, b)
    dk_hal, db_hal = jax.grad(
        lambda kk, bb: jnp.sum(flat_conv3x3_input(zf_h, kk, bb, g, True,
                                                  True,
                                                  True).astype(jnp.float32)
                               * r), argnums=(0, 1))(k, b)
    np.testing.assert_array_equal(np.asarray(dk_std), np.asarray(dk_hal))
    np.testing.assert_array_equal(np.asarray(db_std), np.asarray(db_hal))


def test_flat_roundtrip(rng):
    g = FlatGeom(n=2, h=7, w=13, c=5, t=4)
    x = jnp.asarray(rng.randn(2, 7, 13, 5).astype(np.float32))
    back = from_flat(to_flat(x, g), g)
    np.testing.assert_allclose(np.asarray(back, np.float32),
                               np.asarray(x.astype(jnp.bfloat16), np.float32))


# ---------------------------------------------------------------------------
# model-level: compute_mode='flat' vs 'fast' (tiny config, CPU interpret)
# ---------------------------------------------------------------------------


TINY = dict(stages=((8, 8), (12, 12), (16, 16), (16, 16), (16, 16)),
            side_channels=8)


def _tiny_model(mode):
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.models.vgg_osvos import OSVOS
    return OSVOS(ModelConfig(compute_mode=mode, **TINY))


@pytest.mark.slow
def test_flat_model_param_tree_matches_fast(rng):
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    pf = init_osvos_params(jax.random.PRNGKey(0),
                           ModelConfig(compute_mode="flat", **TINY),
                           input_hw=(16, 24))
    pr = init_osvos_params(jax.random.PRNGKey(0),
                           ModelConfig(compute_mode="fast", **TINY),
                           input_hw=(16, 24))
    sf = jax.tree.structure(pf)
    sr = jax.tree.structure(pr)
    assert sf == sr
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pr)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("mode", ["train", "infer"])
@pytest.mark.slow
def test_flat_model_forward_matches_fast(rng, mode):
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    h, w = 17, 29  # odd sizes exercise ceil-mode pooling through all stages
    params = init_osvos_params(jax.random.PRNGKey(0),
                               ModelConfig(compute_mode="fast", **TINY),
                               input_hw=(h, w))
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32) * 10)
    out_flat = _tiny_model("flat").apply({"params": params}, x, mode=mode)
    out_fast = _tiny_model("fast").apply({"params": params}, x, mode=mode)
    assert len(out_flat) == len(out_fast)
    for a, b in zip(out_flat, out_fast):
        scale = np.abs(np.asarray(b, np.float32)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=4e-2 * scale)


@pytest.mark.slow
def test_flat_model_grads_match_fast(rng):
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
    h, w = 17, 29
    params = init_osvos_params(jax.random.PRNGKey(0),
                               ModelConfig(compute_mode="fast", **TINY),
                               input_hw=(h, w))
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 10)
    m = jnp.asarray((rng.rand(1, h, w, 1) > 0.5).astype(np.float32))

    def loss(p, mode):
        out = _tiny_model(mode).apply({"params": p}, x, mode="infer")[-1]
        return class_balanced_cross_entropy_loss(out, m, size_average=False)

    gf = jax.grad(lambda p: loss(p, "flat"))(params)
    gr = jax.grad(lambda p: loss(p, "fast"))(params)
    # The side_prep bias grads are cancellation-dominated (sum to ~1e-4
    # of their per-pixel cotangent magnitudes here). The flat collapsed
    # head routes them in f32 via the hoisted bias constants (b2), while
    # the fast path's route bf16-rounds each pixel's cotangent at the
    # side_temp astype — measured: flat matches the f32-HIGHEST parity
    # grad to ~5 digits while fast is up to 4.7x off it. Compare those
    # leaves against the parity oracle, everything else against fast.
    gp = jax.grad(lambda p: loss(p, "parity"))(params)
    flat_leaves = jax.tree.leaves_with_path(gf)
    ref_leaves = dict(jax.tree.leaves_with_path(gr))
    par_leaves = dict(jax.tree.leaves_with_path(gp))
    checked = 0
    for path, leaf in flat_leaves:
        key = "".join(str(p) for p in path)
        if "side_prep" in key and "bias" in key:
            ref, tol = par_leaves[path], 1e-2
        else:
            ref, tol = ref_leaves[path], 6e-2
        scale = np.abs(np.asarray(ref)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   atol=tol * scale, err_msg=str(path))
        checked += 1
    assert checked == len(flat_leaves)


@pytest.mark.slow
def test_folded_side_head_matches_unfolded(rng, monkeypatch):
    """_FOLD_SIDE runs side_prep + [fuse-contrib|score] as ONE folded
    d=2 conv (K2 = Ks @ Wcat — the branch is linear); it must match the
    unfolded d=16 side kernel + XLA head dot up to bf16 rounding
    placement, in train outputs AND all parameter gradients."""
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.models import vgg_osvos as vo
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
    h, w = 17, 29
    params = init_osvos_params(jax.random.PRNGKey(0),
                               ModelConfig(compute_mode="fast", **TINY),
                               input_hw=(h, w))
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 10)
    m = jnp.asarray((rng.rand(1, h, w, 1) > 0.5).astype(np.float32))

    def loss(p):
        outs = _tiny_model("flat").apply({"params": p}, x, mode="train")
        return (0.5 * sum(class_balanced_cross_entropy_loss(
                    o, m, size_average=False) for o in outs[:-1])
                + class_balanced_cross_entropy_loss(outs[-1], m,
                                                    size_average=False))

    results = {}
    for fold in (True, False):
        monkeypatch.setattr(vo, "_FOLD_SIDE", fold)
        outs = _tiny_model("flat").apply({"params": params}, x,
                                         mode="train")
        results[fold] = (outs, jax.grad(loss)(params))
    for a, b in zip(results[True][0], results[False][0]):
        scale = np.abs(np.asarray(b, np.float32)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2 * scale)
    ref = dict(jax.tree.leaves_with_path(results[False][1]))
    for path, leaf in jax.tree.leaves_with_path(results[True][1]):
        scale = np.abs(np.asarray(ref[path])).max() + 1e-6
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref[path]),
                                   atol=3e-2 * scale, err_msg=str(path))


def test_init_osvos_params_all_compute_modes():
    """init must work for every compute mode (r2 regression: the int8
    train-assert broke bench.py's default path via init's train trace)."""
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    ref = None
    for mode in ["fast", "parity", "int8", "flat"]:
        p = init_osvos_params(jax.random.PRNGKey(0),
                              ModelConfig(compute_mode=mode, **TINY),
                              input_hw=(16, 24))
        s = jax.tree.structure(p)
        ref = ref or s
        assert s == ref, mode


# ---------------------------------------------------------------------------
# pixel-pair packed path (stem + stage 1 + pool_packed)
# ---------------------------------------------------------------------------


def test_packed_conv_matches_ref(rng):
    from osvos_tpu.ops.pallas.flatconv import (
        FlatGeom, flat_conv3x3_packed, pack_image, packed_geom,
        unpack_image, _half_pad)
    import dataclasses as dc
    n, h, w, c, d, t = 2, 6, 12, 8, 8, 4
    g = FlatGeom(n=n, h=h, w=w, c=c, t=t)
    gp = packed_geom(g)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    zfp = pack_image(x, gp)
    k = jnp.asarray(0.1 * rng.randn(3, 3, c, d).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    out = flat_conv3x3_packed(zfp, k, b, gp, True)
    got = np.asarray(unpack_image(
        out, dc.replace(gp, c=2 * _half_pad(d)), d), np.float32)
    # reference: conv(relu(x)) + b
    xr = jnp.maximum(x.astype(jnp.bfloat16).astype(jnp.float32), 0)
    want = jax.lax.conv_general_dilated(
        xr, k.astype(jnp.bfloat16).astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.asarray(want + b, np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2 * np.abs(want).max())


@pytest.mark.slow
def test_packed_model_matches_fast(rng):
    """Even frame dims gate the packed stem/stage-1/pool path; it must
    agree with 'fast' like the unpacked flat path does."""
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
    h, w = 16, 28
    params = init_osvos_params(jax.random.PRNGKey(0),
                               ModelConfig(compute_mode="fast", **TINY),
                               input_hw=(h, w))
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 10)
    m = jnp.asarray((rng.rand(1, h, w, 1) > 0.5).astype(np.float32))
    out_flat = _tiny_model("flat").apply({"params": params}, x, mode="infer")
    out_fast = _tiny_model("fast").apply({"params": params}, x, mode="infer")
    scale = np.abs(np.asarray(out_fast[-1], np.float32)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(out_flat[-1], np.float32),
                               np.asarray(out_fast[-1], np.float32),
                               atol=4e-2 * scale)

    def loss(p, mode):
        out = _tiny_model(mode).apply({"params": p}, x, mode="infer")[-1]
        return class_balanced_cross_entropy_loss(out, m, size_average=False)

    gf = jax.grad(lambda p: loss(p, "flat"))(params)
    gr = jax.grad(lambda p: loss(p, "fast"))(params)
    for path, leaf in jax.tree.leaves_with_path(gf):
        ref = dict(jax.tree.leaves_with_path(gr))[path]
        scale = np.abs(np.asarray(ref)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   atol=6e-2 * scale, err_msg=str(path))


@pytest.mark.slow
def test_flat_model_train_mode_grads_match_fast(rng):
    """Deep-supervision (train-mode) gradients through the flat trunk —
    gates exposing compute_mode='flat' in the parent trainer."""
    import jax
    from osvos_tpu.models import init_osvos_params
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
    h, w = 16, 28
    params = init_osvos_params(jax.random.PRNGKey(0),
                               ModelConfig(compute_mode="fast", **TINY),
                               input_hw=(h, w))
    x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 10)
    m = jnp.asarray((rng.rand(1, h, w, 1) > 0.5).astype(np.float32))

    def loss(p, mode):
        outs = _tiny_model(mode).apply({"params": p}, x, mode="train")
        # annealed deep supervision shape (train/parent.py)
        return (0.5 * sum(class_balanced_cross_entropy_loss(o, m,
                                                            size_average=False)
                          for o in outs[:-1])
                + class_balanced_cross_entropy_loss(outs[-1], m,
                                                    size_average=False))

    gf = jax.grad(lambda p: loss(p, "flat"))(params)
    gr = jax.grad(lambda p: loss(p, "fast"))(params)
    for path, leaf in jax.tree.leaves_with_path(gf):
        ref = dict(jax.tree.leaves_with_path(gr))[path]
        scale = np.abs(np.asarray(ref)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   atol=8e-2 * scale, err_msg=str(path))


# ---------------------------------------------------------------------------
# pallas flat pool vs the XLA pool_flat twin
# ---------------------------------------------------------------------------


POOL_GEOMS = [
    # (n, h1, w1, c, t_in, t_out)
    (2, 8, 12, 8, 4, 4),
    (1, 9, 27, 8, 4, 4),     # odd h and w (ceil windows)
    (1, 12, 14, 130, 4, 4),  # multi-lane-tile channels
    (2, 16, 28, 8, 16, 16),  # model-sized tiling
    (1, 10, 12, 8, 4, 8),    # 2*hp_out > hp_in + tail: window clamps
]


@pytest.mark.parametrize("gt", POOL_GEOMS)
def test_pool_flat_pallas_matches_xla(rng, gt):
    import dataclasses as dc
    from osvos_tpu.ops.pallas.flatconv import pool_flat
    from osvos_tpu.ops.pallas.flatpool import pool_flat_p
    n, h1, w1, c, ti, to = gt
    g_in = FlatGeom(n=n, h=h1, w=w1, c=c, t=ti)
    g_out = FlatGeom(n=n, h=-(-h1 // 2), w=-(-w1 // 2), c=c, t=to)
    x = jnp.asarray(rng.randn(n, h1, w1, c).astype(np.float32))
    zf = to_flat(x, g_in)
    want = np.asarray(pool_flat(zf, g_in, g_out), np.float32)
    got = np.asarray(pool_flat_p(zf, g_in, g_out, True), np.float32)
    np.testing.assert_array_equal(got, want)

    # backward: same routed cotangent, including tie cases (duplicate
    # values are common after bf16 rounding)
    r = jnp.asarray(rng.randn(n, g_out.h, g_out.w, c).astype(np.float32))

    def loss(fn, zf):
        out = fn(zf)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    gw = jax.grad(lambda z: loss(lambda zz: pool_flat(zz, g_in, g_out),
                                 z))(zf)
    gp = jax.grad(lambda z: loss(
        lambda zz: pool_flat_p(zz, g_in, g_out, True), z))(zf)
    np.testing.assert_array_equal(np.asarray(gp, np.float32),
                                  np.asarray(gw, np.float32))


# ---------------------------------------------------------------------------
# pallas packed pool (stage-1 boundary) vs the XLA pool_packed twin
# ---------------------------------------------------------------------------


PP_GEOMS = [
    # (n, h, w, c, t_out); even h/w — the packed-path gate
    (1, 8, 12, 8, 4),
    (2, 16, 28, 8, 16),   # model-sized tiling, multi-image
    (1, 12, 24, 4, 4),    # half = 4 (tiny lane halves)
    (1, 10, 20, 8, 8),    # out grid past the in tail: window clamps
    (1, 20, 16, 64, 4),   # co == half == 64: the model's stage-1 shape
]


@pytest.mark.parametrize("gt", PP_GEOMS)
def test_pool_packed_pallas_matches_xla(rng, gt):
    from osvos_tpu.ops.pallas.flatconv import (pack_image, packed_geom,
                                               pool_packed, stage_t)
    from osvos_tpu.ops.pallas.flatpool import pool_packed_p
    n, h1, w1, c, to = gt
    g = FlatGeom(n=n, h=h1, w=w1, c=c, t=stage_t(-(-h1 // 2)))
    gp = packed_geom(g)
    g_out = FlatGeom(n=n, h=h1 // 2, w=w1 // 2, c=c, t=to)
    x = jnp.asarray(rng.randn(n, h1, w1, c).astype(np.float32))
    zfp = pack_image(x, gp)
    want = np.asarray(pool_packed(zfp, gp, g_out), np.float32)
    got = np.asarray(pool_packed_p(zfp, gp, g_out, True), np.float32)
    np.testing.assert_array_equal(got, want)

    # backward: identical routed cotangent, including bf16-rounding ties
    r = jnp.asarray(rng.randn(n, g_out.h, g_out.w, c).astype(np.float32))

    def loss(fn, z):
        out = fn(z)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    gw = jax.grad(lambda z: loss(
        lambda zz: pool_packed(zz, gp, g_out), z))(zfp)
    gpp = jax.grad(lambda z: loss(
        lambda zz: pool_packed_p(zz, gp, g_out, True), z))(zfp)
    np.testing.assert_array_equal(np.asarray(gpp, np.float32),
                                  np.asarray(gw, np.float32))


PCP_GEOMS = [
    # (n, h, w, ci, co); even h/w — the packed-path gate
    (1, 8, 12, 8, 8),
    (2, 10, 6, 3, 8),     # stem-width input, multi-image
    (1, 16, 32, 8, 16),   # deeper tiling, hp gap rows
]


@pytest.mark.parametrize("fuse_bwd", [True, False])
@pytest.mark.parametrize("gt", PCP_GEOMS)
def test_packed_conv_pool_equals_unfused(rng, gt, fuse_bwd, monkeypatch):
    """The fused last-conv + stage-boundary pool (pool rides the conv
    epilogue, packed_conv_pool) must equal flat_conv3x3_packed followed
    by pool_packed_p exactly — values and all three gradients, including
    argmax tie routing on bf16-rounded duplicates. Both backward routes
    are covered: fuse_bwd=True runs the pool routing inside the conv
    backward's prologue (pool_in), False the standalone pool-bwd kernel."""
    import dataclasses as dc

    from osvos_tpu.ops.pallas import flatpool as fp

    monkeypatch.setattr(fp, "_FUSE_POOL_BWD", fuse_bwd)
    from osvos_tpu.ops.pallas.flatconv import (_half_pad, flat_conv3x3_packed,
                                               pack_image, packed_geom,
                                               pool_out_geom, stage_t)

    n, h, w, ci, co = gt
    g = FlatGeom(n=n, h=h, w=w, c=ci, t=stage_t(h))
    gp = packed_geom(g)
    x = jnp.abs(jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32)))
    zfp = pack_image(x, gp)
    gp_in = dc.replace(gp, c=2 * _half_pad(ci))
    k = jnp.asarray(0.3 * rng.randn(3, 3, ci, co).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(co).astype(np.float32))
    g2 = pool_out_geom(dc.replace(g, c=co), stage_t(-(-g.h // 2)))
    assert fp.fuse_conv_pool_ok(gp_in, g2, co)

    def ref(zfp, k, b):
        zo = flat_conv3x3_packed(zfp, k, b, gp_in, True, False, True)
        return fp.pool_packed_p(zo, dc.replace(gp_in, c=2 * _half_pad(co)),
                                g2, True)

    def fused(zfp, k, b):
        return fp.packed_conv_pool(zfp, k, b, gp_in, g2, True)

    want = np.asarray(ref(zfp, k, b), np.float32)
    got = np.asarray(fused(zfp, k, b), np.float32)
    np.testing.assert_array_equal(got, want)

    ct = jnp.asarray(rng.randn(*want.shape).astype(np.float32))

    def loss(f):
        return lambda *a: jnp.sum(f(*a).astype(jnp.float32) * ct)

    gr = jax.grad(loss(ref), argnums=(0, 1, 2))(zfp, k, b)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2))(zfp, k, b)
    for name, a, bb in zip(("dz", "dk", "db"), gr, gf):
        np.testing.assert_array_equal(np.asarray(bb, np.float32),
                                      np.asarray(a, np.float32), err_msg=name)


def test_fused_bwd_and_merged_taps_match_separate(rng):
    """The one-pass fused backward (dz+dK+db) and the merged cross-pair
    taps (9 -> 6 dots on packed buffers) must equal the separate
    dgrad/wgrad kernels bit-for-bit on dz/db (dK to f32-accumulation
    order) across every flag combination."""
    import dataclasses as dc

    from osvos_tpu.ops.pallas import flatconv as fc

    x = rng.randn(2, 12, 20, 3).astype(np.float32)
    g0 = FlatGeom(n=2, h=12, w=20, c=3, t=8)
    gp = fc.packed_geom(g0)
    zfp = fc.pack_image(jnp.asarray(x), gp)
    gp2 = dc.replace(gp, c=2 * fc._half_pad(16))
    k0 = jnp.asarray(0.1 * rng.randn(3, 3, 3, 16).astype(np.float32))
    b0 = jnp.asarray(0.1 * rng.randn(16).astype(np.float32))
    k1 = jnp.asarray(0.1 * rng.randn(3, 3, 16, 16).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.randn(16).astype(np.float32))

    def f(k0, b0, k1, b1):
        z1 = fc.flat_conv3x3_input_packed(zfp, k0, b0, gp, True)
        z2 = fc.flat_conv3x3_packed(z1, k1, b1, gp2, True)
        return jnp.sum(z2.astype(jnp.float32) ** 2)

    saved = fc._USE_MERGED_TAPS, fc._USE_FUSED_BWD
    try:
        grads = {}
        for mt in (True, False):
            for fu in (True, False):
                fc._USE_MERGED_TAPS, fc._USE_FUSED_BWD = mt, fu
                grads[(mt, fu)] = jax.grad(f, argnums=(0, 1, 2, 3))(
                    k0, b0, k1, b1)
    finally:
        fc._USE_MERGED_TAPS, fc._USE_FUSED_BWD = saved
    ref = grads[(False, False)]
    for key, gset in grads.items():
        for a, b in zip(gset, ref):
            scale = np.abs(np.asarray(b)).max() + 1e-6
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5 * scale, err_msg=str(key))


@pytest.mark.parametrize("geom_tuple", GEOMS)
def test_flat_conv_postrelu_mode_matches_twin(rng, geom_tuple):
    """Post-relu storage mode (relu_input=False, relu_output=True): the
    production trunk convention. Values AND grads vs the XLA twin."""
    g, zf, k, b = _mk(rng, geom_tuple)
    # post-relu input buffer (what an upstream relu_output conv emits)
    zf = jnp.maximum(zf, 0)
    d = k.shape[-1]
    g_out = FlatGeom(n=g.n, h=g.h, w=g.w, c=d, t=g.t)
    r = jnp.asarray(rng.randn(g.n, g.h, g.w, d).astype(np.float32))

    out = flat_conv3x3(zf, k, b, g, False, True, True)
    ref = flat_conv3x3_ref(zf, k, b, g, relu_input=False, relu_output=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-2)

    # chain two post-relu convs so the consumer-side (input>0) mask is
    # exercised as the producer's relu backward
    k2 = jnp.asarray(0.1 * rng.randn(3, 3, d, d).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))

    def loss_pallas(zf, k, b, k2, b2):
        a = flat_conv3x3(zf, k, b, g, False, True, True)
        out = flat_conv3x3(a, k2, b2, g_out, False, True, False)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    def loss_ref(zf, k, b, k2, b2):
        a = flat_conv3x3_ref(zf, k, b, g, relu_input=False,
                             relu_output=True)
        out = flat_conv3x3_ref(a, k2, b2, g_out, relu_input=False)
        return jnp.sum(from_flat(out, g_out).astype(jnp.float32) * r)

    gp = jax.grad(loss_pallas, argnums=(1, 2, 3, 4))(zf, k, b, k2, b2)
    gr = jax.grad(loss_ref, argnums=(1, 2, 3, 4))(zf, k, b, k2, b2)
    for a, bb in zip(gp, gr):
        scale = np.abs(np.asarray(bb)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=3e-2 * scale)


@pytest.mark.parametrize("kw3", [True, False])
@pytest.mark.parametrize("geom_tuple", [
    (2, 6, 10, 8, 8, 4),      # generic small
    (1, 9, 27, 16, 8, 8),     # odd w, wider-than-one-tile wp
    (1, 4, 6, 130, 4, 4),     # c > 128: multi-lane-tile contraction
    (2, 6, 10, 8, 2, 4),      # d=2: the folded side+head conv width
])
def test_side_conv_tap_stacked_matches_twin(rng, geom_tuple, kw3,
                                            monkeypatch):
    """flat_side_conv3x3 (tap-stacked fwd + bwd kernels) vs the XLA twin:
    values and all gradients, including the consumer-side relu mask on
    dz (the input buffer is post-relu). Parametrized over the kw3 mode
    (kh in the dot as row-offset reads, only the kw taps on the VPU)."""
    from osvos_tpu.ops.pallas import flatconv as fc
    from osvos_tpu.ops.pallas.flatconv import flat_side_conv3x3

    monkeypatch.setattr(fc, "_SIDE_KW3", kw3)

    n, h, w, c, d, t = geom_tuple
    g = FlatGeom(n=n, h=h, w=w, c=c, t=t)
    x = jnp.maximum(jnp.asarray(rng.randn(n, h, w, c).astype(np.float32)),
                    0)
    zf = to_flat(x, g)
    k = jnp.asarray(0.1 * rng.randn(3, 3, c, d).astype(np.float32))
    r = jnp.asarray(rng.randn(n, h, w, d).astype(np.float32))

    def loss_pallas(zf, k):
        return jnp.sum(flat_side_conv3x3(zf, k, g, True).astype(
            jnp.float32) * r)

    def loss_ref(zf, k):
        out = flat_conv3x3_ref(zf, k, jnp.zeros((d,), jnp.float32), g,
                               relu_input=False)
        return jnp.sum(from_flat(
            out, FlatGeom(n=n, h=h, w=w, c=d, t=t)).astype(jnp.float32)
            * r)

    # values: the stacked fwd rounds each tap's projection to bf16 before
    # the 9-term collapse, so compare elementwise at a bf16-scale atol
    out_p = np.asarray(flat_side_conv3x3(zf, k, g, True), np.float32)
    out_r = np.asarray(from_flat(
        flat_conv3x3_ref(zf, k, jnp.zeros((d,), jnp.float32), g,
                         relu_input=False),
        FlatGeom(n=n, h=h, w=w, c=d, t=t)), np.float32)
    scale = np.abs(out_r).max() + 1e-6
    np.testing.assert_allclose(out_p, out_r, atol=3e-2 * scale)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(zf, k)
    gr = jax.grad(loss_ref, argnums=(0, 1))(zf, k)
    # the twin's dz has no relu mask; apply it (zf holds post-relu acts)
    gz_ref = jnp.where(zf > 0, gr[0], 0).astype(jnp.float32)
    scale_z = np.abs(np.asarray(gz_ref)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[0], np.float32),
                               np.asarray(gz_ref), atol=3e-2 * scale_z)
    scale_k = np.abs(np.asarray(gr[1])).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=3e-2 * scale_k)


@pytest.mark.parametrize("kw3", [True, False])
@pytest.mark.parametrize("fuse_fwd", [True, False])
@pytest.mark.parametrize("geom_tuple", [
    (2, 10, 14, 8, 8, 4, 4),   # generic small
    (2, 10, 13, 8, 8, 4, 4),   # odd w (w-ceil pair reads the zero pad col)
    (1, 10, 24, 8, 8, 4, 4),   # wp2 == wp/2: stored-cols clip active
    (1, 12, 14, 8, 8, 4, 8),   # pooled t > t/2 coverage: gap rows zeroed
    (2, 10, 14, 8, 2, 4, 4),   # d=2: the folded side+head conv width
])
def test_side_and_pool_equals_unfused(rng, geom_tuple, fuse_fwd, kw3,
                                      monkeypatch):
    """The fused (side_temp, pooled) composite must equal the separate
    flat_side_conv3x3 + pool_flat_p pair, values AND gradients (the
    backward fuses the stage-boundary dz merge; with fuse_fwd the pool
    forward rides the side kernel's epilogue too)."""
    from osvos_tpu.ops.pallas import flatconv as fc
    from osvos_tpu.ops.pallas.flatconv import flat_side_conv3x3
    from osvos_tpu.ops.pallas import flatpool as fp
    from osvos_tpu.ops.pallas.flatpool import pool_flat_p, side_and_pool

    monkeypatch.setattr(fp, "_FUSE_POOL_FWD", fuse_fwd)
    monkeypatch.setattr(fc, "_SIDE_KW3", kw3)
    n, h, w, c, d, t, t2 = geom_tuple
    g = FlatGeom(n=n, h=h, w=w, c=c, t=t)
    g2 = FlatGeom(n=n, h=-(-h // 2), w=-(-w // 2), c=c, t=t2)
    if fuse_fwd:
        assert fp.fuse_pool_fwd_ok(g, g2), (g, g2)
    x = jnp.maximum(jnp.asarray(rng.randn(n, h, w, c).astype(np.float32)),
                    0)
    zf = to_flat(x, g)
    k = jnp.asarray(0.1 * rng.randn(3, 3, c, d).astype(np.float32))
    r1 = jnp.asarray(rng.randn(n, h, w, d).astype(np.float32))
    r2 = jnp.asarray(rng.randn(g2.rows, g2.c_pad).astype(np.float32))

    def loss_fused(zf, k):
        side, pooled = side_and_pool(zf, k, g, g2, True)
        return (jnp.sum(side.astype(jnp.float32) * r1)
                + jnp.sum(pooled.astype(jnp.float32) * r2))

    def loss_sep(zf, k):
        side = flat_side_conv3x3(zf, k, g, True)
        pooled = pool_flat_p(zf, g, g2, True)
        return (jnp.sum(side.astype(jnp.float32) * r1)
                + jnp.sum(pooled.astype(jnp.float32) * r2))

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(zf, k)
    ls, gs = jax.value_and_grad(loss_sep, argnums=(0, 1))(zf, k)
    # forward values are identical; dz differs only by rounding order
    # (the fused kernel adds dz_pool in f32 BEFORE the single bf16 round,
    # the unfused pair rounds each term then adds in bf16)
    assert abs(float(lf) - float(ls)) <= 1e-5 * (abs(float(ls)) + 1)
    for a, b in zip(gf, gs):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-2 * scale)


def test_stacked_stem_wgrad_matches_merged(rng):
    """The tap-stacked stem wgrad (A/B knob; measured slightly slower on
    chip but kept) must equal the merged kernel exactly."""
    import dataclasses as dc

    from osvos_tpu.ops.pallas import flatconv as fc

    x = rng.randn(2, 12, 20, 3).astype(np.float32)
    g0 = FlatGeom(n=2, h=12, w=20, c=3, t=8)
    gp = fc.packed_geom(g0)
    zfp = fc.pack_image(jnp.asarray(x), gp)
    k0 = jnp.asarray(0.1 * rng.randn(3, 3, 3, 16).astype(np.float32))
    b0 = jnp.asarray(0.1 * rng.randn(16).astype(np.float32))
    del dc

    def f(k0, b0):
        z1 = fc.flat_conv3x3_input_packed(zfp, k0, b0, gp, True, True)
        return jnp.sum(z1.astype(jnp.float32) ** 2)

    saved = fc._USE_STACKED_STEM_WGRAD
    try:
        fc._USE_STACKED_STEM_WGRAD = True
        ga = jax.grad(f, argnums=(0, 1))(k0, b0)
        fc._USE_STACKED_STEM_WGRAD = False
        gb = jax.grad(f, argnums=(0, 1))(k0, b0)
    finally:
        fc._USE_STACKED_STEM_WGRAD = saved
    for a, b in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
