"""Post-training int8 calibration for the OSVOS trunk.

Runs the bf16 trunk over calibration frames and records the max absolute
input activation per trunk conv (stage_conv_names order). Feed the result
into ``ModelConfig(compute_mode="int8", int8_scales=scales)`` — static
scales skip the per-conv dynamic max reduction, worth ~40% inference
throughput at 480p (476 -> 664 f/s measured, batch 32, v5e).

A ``margin`` > 1 leaves headroom for frames hotter than the calibration
set; int8 quantization saturates (clips) beyond the scale, so occasional
outlier pixels degrade gracefully.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from osvos_tpu.configs import ModelConfig
from osvos_tpu.ops.pool import max_pool_ceil


def _make_calibration_run(config: ModelConfig):
    """``run(params, x) -> (n_trunk_convs,) f32`` max|input| per conv."""

    def run(params, x):
        maxes = []
        v = x.astype(jnp.bfloat16)

        def conv(v, name):
            kern = jnp.asarray(params[name]["kernel"], jnp.bfloat16)
            b = jnp.asarray(params[name]["bias"], jnp.bfloat16)
            pad = kern.shape[0] // 2
            out = lax.conv_general_dilated(
                v, kern, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(out + b, 0)

        for i, widths in enumerate(config.stages):
            if i > 0:
                v = max_pool_ceil(v)
            for j in range(len(widths)):
                maxes.append(jnp.max(jnp.abs(v)).astype(jnp.float32))
                v = conv(v, f"stage{i + 1}_conv{j}")
        return jnp.stack(maxes)

    return run


def calibrate_int8_scales(
    params,
    images: jnp.ndarray,          # (N, H, W, 3) preprocessed frames
    config: ModelConfig = ModelConfig(),
    margin: float = 1.05,
) -> Tuple[float, ...]:
    """Per-trunk-conv max|input| * margin, in stage_conv_names order."""
    run = jax.jit(_make_calibration_run(config))
    maxes = jax.device_get(run(params, jnp.asarray(images)))
    return tuple(float(m) * margin for m in maxes)


def calibrate_int8_scales_batched(
    stacked_params,               # (S, ...) pytree of per-sequence params
    images: jnp.ndarray,          # (S, H, W, 3) or (S, N, H, W, 3) frames
    config: ModelConfig = ModelConfig(),
    margin: float = 1.05,
) -> jnp.ndarray:
    """(S, n_trunk_convs) float32 per-SEQUENCE calibration in one compile.

    The batched val protocol calibrates each sequence on its own first
    frame against its own adapted trunk, then feeds the result through
    ``batched_infer(act_scales=...)`` as a traced operand — static-scale
    int8 throughput (~40% over dynamic) without one recompile per
    sequence."""
    if images.ndim == 4:
        images = images[:, None]
    run = _make_calibration_run(config)
    maxes = jax.jit(jax.vmap(run))(stacked_params, jnp.asarray(images))
    return maxes * jnp.float32(margin)
