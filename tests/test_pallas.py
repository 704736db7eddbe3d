"""Pallas kernels vs their XLA twins (interpret mode on CPU; the same
kernels compile for TPU — bench.py exercises that path on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss
from osvos_tpu.ops.pallas.cbbce import class_balanced_cross_entropy_loss_pallas


@pytest.mark.parametrize("shape", [(1, 65, 97, 1), (2, 33, 49, 1), (1, 700,)])
@pytest.mark.parametrize("size_average,batch_average",
                         [(False, True), (False, False), (True, False)])
def test_cbbce_pallas_matches_xla_forward(rng, shape, size_average,
                                          batch_average):
    logits = jnp.asarray(rng.randn(*shape).astype(np.float32) * 5)
    labels = jnp.asarray((rng.rand(*shape) > 0.7).astype(np.float32))
    want = class_balanced_cross_entropy_loss(
        logits, labels, size_average=size_average,
        batch_average=batch_average)
    got = class_balanced_cross_entropy_loss_pallas(
        logits, labels, size_average, batch_average, True)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)


def test_cbbce_pallas_matches_xla_grad(rng):
    logits = jnp.asarray(rng.randn(1, 65, 97, 1).astype(np.float32) * 5)
    labels = jnp.asarray((rng.rand(1, 65, 97, 1) > 0.7).astype(np.float32))

    g_xla = jax.grad(lambda x: class_balanced_cross_entropy_loss(
        x, labels, size_average=False))(logits)
    g_pl = jax.grad(lambda x: class_balanced_cross_entropy_loss_pallas(
        x, labels, False, True, True))(logits)
    # Different-but-equivalent derivative formulations (sigmoid(x)-1 vs the
    # log_sigmoid VJP): agreement to f32 round-off, not bit-equality.
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               atol=1e-4)


@pytest.mark.parametrize("shape", [(3, 65, 97, 1), (2, 33, 49, 1)])
def test_cbbce_per_sample_pallas_matches_xla(rng, shape):
    """Per-sample fused kernel == the XLA per-sample loss, value and grad
    (the variant the parent step and microbatch online step consume)."""
    from osvos_tpu.ops.loss import class_balanced_cross_entropy_loss_per_sample

    logits = jnp.asarray(rng.randn(*shape).astype(np.float32) * 5)
    labels = jnp.asarray((rng.rand(*shape) > 0.7).astype(np.float32))

    want = class_balanced_cross_entropy_loss_per_sample(logits, labels)
    got = class_balanced_cross_entropy_loss_per_sample(logits, labels,
                                                       impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6)

    # grad through a weighted mean so per-sample cotangents differ
    w = jnp.asarray(rng.rand(shape[0]).astype(np.float32) + 0.5)
    g_xla = jax.grad(lambda x: (class_balanced_cross_entropy_loss_per_sample(
        x, labels) * w).sum())(logits)
    g_pl = jax.grad(lambda x: (class_balanced_cross_entropy_loss_per_sample(
        x, labels, impl="pallas") * w).sum())(logits)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla), atol=1e-4)


def test_cbbce_pallas_extreme_logits_finite(rng):
    logits = jnp.asarray(np.array([[-200.0, 200.0, 0.0, -5.0]], np.float32))
    labels = jnp.asarray(np.array([[0.0, 1.0, 1.0, 0.0]], np.float32))
    want = class_balanced_cross_entropy_loss(logits, labels,
                                             size_average=False)
    got = class_balanced_cross_entropy_loss_pallas(logits, labels,
                                                   False, True, True)
    assert np.isfinite(float(got))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)


@pytest.mark.parametrize("hw", [(65, 97), (64, 96)])
def test_fused_tail_kernel_matches_xla_infer(rng, hw):
    """Pallas upsample+fuse+sigmoid+uint8 tail == the XLA infer path
    (interpret mode on CPU; make_infer_fn auto-enables it on TPU)."""
    from osvos_tpu.configs import ModelConfig
    from osvos_tpu.evaluation.infer import make_infer_fn
    from osvos_tpu.models import init_osvos_params

    TINY = ModelConfig(stages=((4, 4), (6, 6), (8, 8, 8), (8, 8, 8),
                               (8, 8, 8)), side_channels=4)
    params = init_osvos_params(jax.random.PRNGKey(2), TINY, input_hw=(32, 48))
    h, w = hw
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32) * 40)

    xla = make_infer_fn(TINY, pallas_tail=False)(params, x)
    pal = make_infer_fn(TINY, pallas_tail=True)(params, x)
    assert pal.shape == xla.shape == (2, h, w) and pal.dtype == jnp.uint8
    # identical math, different op order: allow 1 quantization level
    diff = np.abs(np.asarray(pal).astype(int) - np.asarray(xla).astype(int))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("shape", [(2, 9, 13, 8, 4), (1, 33, 49, 64, 64)])
def test_wgrad3x3_kernel_matches_xla(rng, shape):
    """Single-pass wgrad kernel == the autodiff weight gradient (interpret
    mode; production use is gated off — see the module docstring)."""
    from jax import lax

    from osvos_tpu.ops.pallas.wgrad import wgrad3x3

    n, h, w, c, d = shape
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    g = jnp.asarray(rng.randn(n, h, w, d).astype(np.float32))

    def ref_loss(k):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y.astype(jnp.float32) * g)

    dk_ref = jax.grad(ref_loss)(jnp.zeros((3, 3, c, d), jnp.float32))
    dk = wgrad3x3(x, g, interpret=True)
    rel = float(jnp.abs(dk - dk_ref).max()) / \
        (float(jnp.abs(dk_ref).max()) + 1e-9)
    assert rel < 2e-2, rel
