"""3x3 SAME conv with a relayout-free backward (training hot path).

XLA's default weight-gradient for an NHWC conv is itself lowered as a
convolution whose operands need transposed layouts — on TPU that
materializes full copies of the saved activations and cotangents
(profiled at ~45 ms of the 112 ms online fine-tune step at 480p batch 5).
This wrapper keeps the forward as the regular XLA conv but computes the
backward explicitly:

- d(input): conv of the cotangent with the spatially-flipped,
  channel-transposed kernel (the standard identity; still an XLA conv,
  same layout as the forward so no relayout),
- d(kernel): nine shift-einsums ``dk[kh,kw] = einsum('nhwc,nhwd->cd',
  shift(x, kh, kw), g)`` — plain [NHW, C]^T @ [NHW, D] matmuls on
  already-minor channel axes, no transposes.

Numerics: bf16 operands with float32 accumulation (preferred_element_type)
in both directions — same contraction precision as the XLA path (tested
against nn.Conv gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, kernel, padding):
    return lax.conv_general_dilated(
        x, kernel, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x: (N, H, W, Cin) bf16; kernel: (3, 3, Cin, Cout) (cast to x.dtype)."""
    return _conv(x, kernel.astype(x.dtype), ((1, 1), (1, 1)))


def _fwd(x, kernel):
    return conv3x3_same(x, kernel), (x, kernel)


def _bwd(res, g):
    x, kernel = res
    kdtype = kernel.dtype
    kb = kernel.astype(x.dtype)
    # d(input): SAME conv with rot180(kernel), in/out channels swapped.
    k_flip = kb[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _conv(g.astype(x.dtype), k_flip, ((1, 1), (1, 1)))
    dk = _wgrad(x, g).astype(kdtype)
    return dx, dk


import os as _os

# ops/pallas/wgrad.py: single-pass tile-aligned kernel. Correct on-chip
# and fast standalone, but measured IN the full online step it loses to
# the shift-einsum path (106.5 vs 98.0 ms/step, scripts/bench_step.py,
# v5e batch 5 @480p): XLA's convs pick non-row-major activation layouts
# and the kernel's row-major operands force relayout copies around it.
# Default OFF — the flat-layout trunk (ops/pallas/flatconv.py) makes the
# whole hot path layout-free instead; env-overridable for A/B benchmarks.
_USE_PALLAS_WGRAD = _os.environ.get("OSVOS_PALLAS_WGRAD", "0") != "0"


def _wgrad_einsum(x, g):
    """Nine shift-einsums over the padded input (pure-XLA fallback)."""
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = []
    for kh in range(3):
        cols = []
        for kw in range(3):
            xs = lax.slice(xp, (0, kh, kw, 0), (n, kh + h, kw + w,
                                                xp.shape[3]))
            cols.append(jnp.einsum("nhwc,nhwd->cd", xs, g.astype(x.dtype),
                                   preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _wgrad(x, g):
    if _USE_PALLAS_WGRAD and jax.default_backend() == "tpu" \
            and x.shape[-1] >= 8 and g.shape[-1] >= 8:
        # single-pass Pallas kernel: reads activations once (vs nine
        # shifted materializations in the einsum form)
        from osvos_tpu.ops.pallas.wgrad import wgrad3x3

        return wgrad3x3(x, g)
    return _wgrad_einsum(x, g)


conv3x3_same.defvjp(_fwd, _bwd)
