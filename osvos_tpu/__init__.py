"""osvos_tpu — a TPU-native one-shot video object segmentation framework.

Re-implements the full capability surface of the OSVOS reference
(kmaninis/OSVOS-PyTorch: VGG-16 FCN backbone, deeply-supervised side outputs,
fixed bilinear upsampling, fusion head, class-balanced BCE, parent training,
one-shot online fine-tuning, per-frame inference emitting PNG masks) as an
idiomatic JAX/Flax/Pallas stack:

- NHWC layouts, bf16 inference, jit-compiled training steps,
- the whole 2000-step online fine-tune runs inside one ``lax.scan``,
- online adaptation vmapped over sequences and sharded over a TPU mesh so an
  entire DAVIS-2016 val split adapts concurrently,
- Pallas kernels for the memory-bound fused head (upsample+fuse+sigmoid) and
  the class-balanced-BCE reduction, each with a pure-XLA fallback.

Reference provenance: /root/reference was an empty mount in every session so
far; structure and semantics follow SURVEY.md's reconstruction of the public
OSVOS-PyTorch repo. Reference citations in docstrings use the approximate
``file:~line`` form from SURVEY.md.
"""

__version__ = "0.1.0"

from osvos_tpu.configs import (  # noqa: F401
    DataConfig,
    ModelConfig,
    OnlineConfig,
    ParentConfig,
    PathConfig,
)
