"""Unit tests for the ops layer against torch-CPU oracles (SURVEY.md §4a)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from osvos_tpu.ops import (
    bilinear_filter,
    bilinear_upsample,
    center_crop,
    class_balanced_cross_entropy_loss,
    class_balanced_cross_entropy_loss_theoretical,
    max_pool_ceil,
)
from osvos_tpu.ops.warp import rotation_scale_matrix, scale_n_rotate, warp_affine

from tests.torch_oracle import (
    bilinear_filter_oracle,
    cb_bce_oracle,
    center_crop_oracle,
    upsample_oracle,
)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


# DAVIS 480p spatial chain through the 5 stages: 854 is odd-producing.
POOL_SIZES = [(480, 854), (240, 427), (120, 214), (60, 107), (30, 54), (7, 11)]


@pytest.mark.parametrize("hw", POOL_SIZES)
def test_max_pool_ceil_matches_torch(rng, hw):
    h, w = hw
    x = rng.randn(2, h, w, 3).astype(np.float32)
    got = np.asarray(max_pool_ceil(jnp.asarray(x)))
    want = F.max_pool2d(torch.from_numpy(nchw(x)), 2, 2, ceil_mode=True).numpy()
    np.testing.assert_array_equal(got, nhwc(want))


@pytest.mark.parametrize("size,target", [((11, 14), (8, 9)), ((481, 855), (480, 854)),
                                         ((486, 860), (480, 854)), ((10, 10), (10, 10))])
def test_center_crop_matches_reference_convention(rng, size, target):
    x = rng.randn(1, size[0], size[1], 4).astype(np.float32)
    got = np.asarray(center_crop(jnp.asarray(x), *target))
    want = center_crop_oracle(nchw(x), *target)
    np.testing.assert_array_equal(got, nhwc(want))


def test_bilinear_filter_matches_reference():
    for k in (4, 8, 16, 32, 5, 7):
        np.testing.assert_allclose(bilinear_filter(k), bilinear_filter_oracle(k),
                                   atol=0, rtol=0)


@pytest.mark.parametrize("factor,ch", [(2, 16), (4, 16), (8, 1), (16, 1)])
def test_bilinear_upsample_matches_frozen_convtranspose(rng, factor, ch):
    x = rng.randn(1, 13, 17, ch).astype(np.float32)
    got = np.asarray(bilinear_upsample(jnp.asarray(x), factor))
    want = upsample_oracle(nchw(x), factor)
    np.testing.assert_allclose(got, nhwc(want), atol=2e-5)


def test_upsample_then_crop_restores_input_size(rng):
    # The side-output path: upsample by 2^i then crop back to input size.
    for i, (h, w) in zip(range(1, 5), POOL_SIZES[1:5]):
        x = rng.randn(1, h, w, 16).astype(np.float32)
        up = bilinear_upsample(jnp.asarray(x), 2 ** i)
        out = center_crop(up, 480, 854)
        assert out.shape == (1, 480, 854, 16)


@pytest.mark.parametrize("size_average,batch_average",
                         [(False, True), (False, False), (True, False)])
def test_cb_bce_matches_torch_oracle(rng, size_average, batch_average):
    logits = (rng.randn(2, 24, 33, 1) * 8).astype(np.float32)
    labels = (rng.rand(2, 24, 33, 1) > 0.7).astype(np.float32)
    got = float(class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        size_average=size_average, batch_average=batch_average))
    want = cb_bce_oracle(logits, labels, size_average, batch_average)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cb_bce_stable_vs_theoretical_agree_on_moderate_logits(rng):
    logits = (rng.randn(1, 16, 16, 1) * 3).astype(np.float32)
    labels = (rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32)
    a = float(class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(labels), batch_average=False))
    b = float(class_balanced_cross_entropy_loss_theoretical(
        jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_cb_bce_stable_at_extreme_logits(rng):
    logits = np.full((1, 8, 8, 1), 500.0, np.float32)
    labels = np.ones((1, 8, 8, 1), np.float32)
    labels[0, :4] = 0.0
    val = float(class_balanced_cross_entropy_loss(jnp.asarray(logits),
                                                  jnp.asarray(labels)))
    assert np.isfinite(val)
    want = cb_bce_oracle(logits, labels)
    np.testing.assert_allclose(val, want, rtol=1e-5)


def test_cb_bce_all_background_is_finite():
    # Unannotated frames have all-zero gt (davis_2016.py:~55); n_pos == 0
    # must not produce NaN.
    logits = np.zeros((1, 8, 8, 1), np.float32)
    labels = np.zeros((1, 8, 8, 1), np.float32)
    val = float(class_balanced_cross_entropy_loss(jnp.asarray(logits),
                                                  jnp.asarray(labels)))
    assert np.isfinite(val)


# ---------------- warp / augmentation ----------------

def test_rotation_matrix_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    m_cv = cv2.getRotationMatrix2D((50.0, 30.0), 17.0, 1.1)
    m_j = np.asarray(rotation_scale_matrix(jnp.float32(17.0), jnp.float32(1.1),
                                           (50.0, 30.0)))
    np.testing.assert_allclose(m_j, m_cv, atol=1e-5)


@pytest.mark.parametrize("interp,cv_flag_name", [("nearest", "INTER_NEAREST"),
                                                 ("linear", "INTER_LINEAR"),
                                                 ("cubic", "INTER_CUBIC")])
def test_warp_affine_close_to_cv2(rng, interp, cv_flag_name):
    cv2 = pytest.importorskip("cv2")
    h, w = 40, 56
    # smooth image so interpolation-kernel differences stay small
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(yy / 7) + np.cos(xx / 5), yy / h, xx / w], -1).astype(np.float32)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), 20.0, 0.9)
    want = cv2.warpAffine(img, m, (w, h), flags=getattr(cv2, cv_flag_name))
    got = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(m, dtype=jnp.float32),
                                 interp=interp))
    # interior agreement (borders differ by one pixel of padding policy)
    sl = (slice(4, -4), slice(4, -4))
    atol = 1e-3 if interp != "nearest" else 1e-6
    np.testing.assert_allclose(got[sl], want[sl], atol=atol)


def test_warp_affine_border_semantics_vs_cv2(rng):
    """Full-frame (border included) agreement with cv2 — VERDICT r1 weak #8.

    cv2.warpAffine computes source coordinates in 1/32-pixel fixed point,
    so isolated one-pixel disagreements can appear where a coordinate sits
    exactly on a rounding boundary; the test bounds the disagreement RATE
    instead of excluding the border entirely.
    """
    cv2 = pytest.importorskip("cv2")
    h, w = 40, 56
    mask = (rng.rand(h, w, 1) > 0.5).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(yy / 7) + np.cos(xx / 5), yy / h, xx / w],
                   -1).astype(np.float32)
    for ang, sc in [(20.0, 0.9), (-29.0, 1.24), (7.5, 0.76), (0.0, 1.0)]:
        m = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
        mj = jnp.asarray(m, dtype=jnp.float32)
        # nearest on a binary mask: identical up to fixed-point boundary
        # pixels (must be <1% of the frame, borders included)
        want_n = cv2.warpAffine(mask, m, (w, h), flags=cv2.INTER_NEAREST)
        got_n = np.asarray(warp_affine(jnp.asarray(mask), mj,
                                       interp="nearest"))[..., 0]
        frac = np.mean(want_n != got_n)
        assert frac < 0.01, (ang, sc, frac)
        # cubic on a smooth image: borders zero-fill identically; allow
        # the fixed-point weight quantization everywhere else
        want_c = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_CUBIC)
        got_c = np.asarray(warp_affine(jnp.asarray(img), mj, interp="cubic"))
        np.testing.assert_allclose(got_c, want_c, atol=5e-3)
        # pixels cv2 maps fully outside are exactly zero in both
        outside = (want_n == 0) & (np.abs(want_c).max(-1) == 0)
        assert np.all(got_c[outside] == want_c[outside])


def test_scale_n_rotate_preserves_binary_mask(rng):
    key = jax.random.PRNGKey(0)
    img = rng.rand(33, 47, 3).astype(np.float32)
    mask = (rng.rand(33, 47, 1) > 0.5).astype(np.float32)
    img2, mask2 = scale_n_rotate(key, jnp.asarray(img), jnp.asarray(mask))
    vals = np.unique(np.asarray(mask2))
    assert set(vals.tolist()) <= {0.0, 1.0}
    assert img2.shape == img.shape and mask2.shape == mask.shape


@pytest.mark.parametrize("factor", [2, 4, 8, 16])
@pytest.mark.parametrize("ch", [1, 16])
def test_bilinear_upsample_matmul_equals_conv(rng, factor, ch):
    from osvos_tpu.ops.upsample import bilinear_upsample

    x = rng.randn(1, 9, 13, ch).astype(np.float32)
    a = np.asarray(bilinear_upsample(jnp.asarray(x), factor, method="conv"))
    b = np.asarray(bilinear_upsample(jnp.asarray(x), factor, method="matmul"))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.parametrize("hw", [(65, 97), (64, 96), (33, 49)])
def test_max_pool_ceil_grad_matches_torch(rng, hw):
    """Custom-VJP elementwise pool backward == torch MaxPool2d backward,
    including row-major-first tie routing (exercised via quantized inputs
    that create exact ties)."""
    import torch

    from osvos_tpu.ops.pool import max_pool_ceil

    h, w = hw
    # quantize so windows contain exact ties
    x = np.round(rng.randn(1, h, w, 3) * 2).astype(np.float32) / 2
    g = rng.randn(1, (h + 1) // 2, (w + 1) // 2, 3).astype(np.float32)

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    yt = torch.nn.functional.max_pool2d(xt, 2, 2, ceil_mode=True)
    yt.backward(torch.from_numpy(np.transpose(g, (0, 3, 1, 2))))
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    got = jax.grad(
        lambda v: jnp.sum(max_pool_ceil(v) * jnp.asarray(g)))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_per_sample_cb_bce_equals_sliced(rng):
    from osvos_tpu.ops.loss import (class_balanced_cross_entropy_loss,
                                    class_balanced_cross_entropy_loss_per_sample)

    logits = jnp.asarray(rng.randn(4, 17, 23, 1).astype(np.float32) * 5)
    labels = jnp.asarray((rng.rand(4, 17, 23, 1) > 0.7).astype(np.float32))
    per = np.asarray(class_balanced_cross_entropy_loss_per_sample(logits,
                                                                  labels))
    for b in range(4):
        want = float(class_balanced_cross_entropy_loss(
            logits[b:b + 1], labels[b:b + 1], size_average=False))
        np.testing.assert_allclose(per[b], want, rtol=1e-6)


def test_fastconv_matches_xla_conv_forward_and_grads(rng):
    """conv3x3_same fwd/bwd == the plain XLA conv path (f32 inputs here;
    production uses bf16 with the same f32-accumulated contractions)."""
    from jax import lax

    from osvos_tpu.ops.fastconv import conv3x3_same

    x = jnp.asarray(rng.randn(2, 9, 13, 6).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.randn(2, 9, 13, 4).astype(np.float32))

    def ref(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    np.testing.assert_allclose(np.asarray(conv3x3_same(x, k)),
                               np.asarray(ref(x, k)), atol=1e-5)

    def loss_fast(x, k):
        return jnp.sum(conv3x3_same(x, k) * g)

    def loss_ref(x, k):
        return jnp.sum(ref(x, k) * g)

    dx_f, dk_f = jax.grad(loss_fast, argnums=(0, 1))(x, k)
    dx_r, dk_r = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk_f), np.asarray(dk_r), atol=1e-4)
