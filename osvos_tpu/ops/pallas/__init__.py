"""Pallas TPU kernels (each with an XLA-path twin it is validated against).

- cbbce: single-pass fused class-balanced BCE statistics + elementwise
  backward (twin: osvos_tpu.ops.loss.class_balanced_cross_entropy_loss).
"""

from osvos_tpu.ops.pallas.cbbce import (  # noqa: F401
    class_balanced_cross_entropy_loss_pallas,
)
