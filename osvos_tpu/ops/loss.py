"""Class-balanced binary cross-entropy over logits.

Semantics follow the reference loss (layers/osvos_layers.py:~10
``class_balanced_cross_entropy_loss``): with z = 1{label >= 0.5},
n_pos = sum(z), n_neg = sum(1-z), n = n_pos + n_neg and per-pixel
log-likelihoods, the loss is

    L = (n_neg / n) * sum_over_pos(-log sigmoid(x))
      + (n_pos / n) * sum_over_neg(-log sigmoid(-x))

i.e. each class's summed cross-entropy is weighted by the *other* class's
pixel fraction. ``size_average`` divides by the element count,
``batch_average`` by the batch size (the drivers call it with
``size_average=False`` -> batch-average, train_parent.py:~120).

We use ``jax.nn.log_sigmoid`` (softplus form) — algebraically identical to
the reference's manually expanded stable form
``x*(z - 1{x>=0}) - log(1 + exp(x - 2x 1{x>=0}))`` — and compute the whole
thing in float32 regardless of input dtype so bf16 activations don't poison
the million-pixel reductions.

``..._theoretical`` mirrors the reference's textbook variant
(layers/osvos_layers.py:~40), which clamps probabilities with eps inside the
log; kept for API parity and as an independent numerical oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _balanced_terms(logits: jnp.ndarray, label: jnp.ndarray):
    logits = logits.astype(jnp.float32)
    labels = (label.astype(jnp.float32) >= 0.5).astype(jnp.float32)
    num_pos = jnp.sum(labels)
    num_neg = jnp.sum(1.0 - labels)
    num_total = num_pos + num_neg
    return logits, labels, num_pos, num_neg, num_total


def class_balanced_cross_entropy_loss(
    output: jnp.ndarray,
    label: jnp.ndarray,
    size_average: bool = False,
    batch_average: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """Reference-parity class-balanced BCE on logits (any shape, NHWC here).

    Matches layers/osvos_layers.py:~10 to float32 round-off (tests compare
    against the torch expression directly).

    impl='pallas' dispatches to the fused single-pass TPU kernel
    (ops/pallas/cbbce.py — same semantics, one HBM pass, fused backward).
    """
    if impl == "pallas":
        from osvos_tpu.ops.pallas.cbbce import (
            class_balanced_cross_entropy_loss_pallas)

        return class_balanced_cross_entropy_loss_pallas(
            output, label, size_average, batch_average,
            jax.default_backend() != "tpu")
    logits, labels, num_pos, num_neg, num_total = _balanced_terms(output, label)
    # -log sigmoid(x) and -log sigmoid(-x), both stable softplus forms.
    ce_pos = -jax.nn.log_sigmoid(logits)
    ce_neg = -jax.nn.log_sigmoid(-logits)
    loss_pos = jnp.sum(labels * ce_pos)
    loss_neg = jnp.sum((1.0 - labels) * ce_neg)
    final_loss = num_neg / num_total * loss_pos + num_pos / num_total * loss_neg
    if size_average:
        final_loss = final_loss / label.size
    elif batch_average:
        final_loss = final_loss / label.shape[0]
    return final_loss


def class_balanced_cross_entropy_loss_per_sample(
    output: jnp.ndarray,
    label: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """(B,) per-sample class-balanced BCE (sum normalization per sample).

    Equals ``class_balanced_cross_entropy_loss(o[b:b+1], l[b:b+1],
    size_average=False)`` for each b, computed with batch-preserving axis
    reductions so it shards cleanly over a data-parallel mesh (no
    cross-shard slicing). ``mean()`` of this over a batch of n equals the
    reference's accumulate-``loss/nAveGrad``-over-n regime exactly.

    impl='pallas' dispatches to the fused single-pass kernel
    (ops/pallas/cbbce.py) — one HBM pass per direction instead of the XLA
    path's several full-resolution temporaries.
    """
    if impl == "pallas":
        from osvos_tpu.ops.pallas.cbbce import (
            class_balanced_cross_entropy_loss_per_sample_pallas)

        return class_balanced_cross_entropy_loss_per_sample_pallas(
            output, label, jax.default_backend() != "tpu")
    logits = output.astype(jnp.float32)
    labels = (label.astype(jnp.float32) >= 0.5).astype(jnp.float32)
    axes = tuple(range(1, logits.ndim))
    num_pos = jnp.sum(labels, axis=axes)
    num_neg = jnp.sum(1.0 - labels, axis=axes)
    num_total = num_pos + num_neg
    loss_pos = jnp.sum(labels * -jax.nn.log_sigmoid(logits), axis=axes)
    loss_neg = jnp.sum((1.0 - labels) * -jax.nn.log_sigmoid(-logits),
                       axis=axes)
    return num_neg / num_total * loss_pos + num_pos / num_total * loss_neg


def class_balanced_cross_entropy_loss_theoretical(
    output: jnp.ndarray,
    label: jnp.ndarray,
    eps: float = 1e-20,
) -> jnp.ndarray:
    """Unstable 'textbook' variant (layers/osvos_layers.py:~40): sigmoid then
    eps-clamped logs, summed with the same class-balance weights. Useful as a
    cross-check oracle where logits are moderate."""
    logits, labels, num_pos, num_neg, num_total = _balanced_terms(output, label)
    probs = jax.nn.sigmoid(logits)
    loss_pos = jnp.sum(-labels * jnp.log(probs + eps))
    loss_neg = jnp.sum(-(1.0 - labels) * jnp.log(1.0 - probs + eps))
    return num_neg / num_total * loss_pos + num_pos / num_total * loss_neg
