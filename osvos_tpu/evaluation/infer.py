"""Per-frame inference + PNG mask emission.

Reference behavior (train_online.py:~135-180): iterate the sequence's
frames, forward, take the fused output, sigmoid (done on host in numpy
there), scale to 255 and save one grayscale PNG per frame — the *continuous*
probability map, not a thresholded mask (DAVIS binarizes when evaluating).

TPU-native: frames are processed in fixed-size batches (static shapes, one
compile), sigmoid fused on device, uint8 conversion on device, and only the
(N, H, W) uint8 masks cross back to the host. bf16 trunk when the model is
in 'fast' mode.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig
from osvos_tpu.models.vgg_osvos import OSVOS


def make_infer_fn(model_config: ModelConfig, fused_head: bool = True,
                  pallas_tail: Optional[bool] = None) -> Callable:
    """jit'd ``(params, images(N,H,W,3)) -> probs_u8 (N,H,W) uint8``.

    fused_head=True uses the algebraically-identical collapsed fusion path
    (models/vgg_osvos.py mode='infer'): ~16x less full-resolution HBM
    traffic and no dead score_dsn branches. fused_head=False runs the
    reference-ordered graph for bit-parity experiments.

    pallas_tail: run upsample+fuse+sigmoid+uint8 as one Pallas kernel
    (ops/pallas/fused_head.py) — only the final uint8 map touches HBM.
    Default: on for TPU backends, off elsewhere (the kernel runs in
    interpret mode off-TPU, which is correct but slow).
    """
    model = OSVOS(model_config)
    if pallas_tail is None:
        pallas_tail = jax.default_backend() == "tpu"

    if fused_head and pallas_tail:
        from osvos_tpu.ops.pallas.fused_head import fused_upsample_sigmoid_u8

        factors = [2 ** i for i in range(1, len(model_config.stages))]
        interpret = jax.default_backend() != "tpu"

        @jax.jit
        def infer(params, images):
            parts = model.apply({"params": params}, images,
                                mode="infer_parts")
            contribs, bias = parts[:-1], parts[-1]
            return fused_upsample_sigmoid_u8(
                [c[..., 0] for c in contribs], bias[0],
                out_hw=(images.shape[1], images.shape[2]),
                factors=factors, interpret=interpret)

        return infer

    mode = "infer" if fused_head else "train"

    @jax.jit
    def infer(params, images):
        logits = model.apply({"params": params}, images, mode=mode)[-1]
        probs = jax.nn.sigmoid(logits[..., 0])
        return jnp.round(255.0 * probs).astype(jnp.uint8)

    return infer


def make_sharded_infer_fn(model_config: ModelConfig, mesh,
                          axis_name: str = "data") -> Callable:
    """Frame-parallel inference: the batch axis sharded across ``mesh``
    (SURVEY.md §2 parallelism table — frames of a sequence are independent,
    so this is collective-free shard_map over the same per-device program).
    Batch size must be a multiple of the mesh size; ``infer_sequence``'s
    padding guarantees that when ``batch_size`` is.
    """
    import jax.numpy as _jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    per_device = make_infer_fn(model_config)
    spec = P(axis_name)
    mapped = jax.shard_map(lambda p, x: per_device(p, x), mesh=mesh,
                           in_specs=(P(), spec), out_specs=spec)
    shard = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(mapped)

    def infer(params, images):
        params = jax.device_put(params, repl)
        images = jax.device_put(_jnp.asarray(images), shard)
        return jitted(params, images)

    return infer


def infer_sequence(
    params,
    frames: Sequence[np.ndarray],
    model_config: ModelConfig = ModelConfig(),
    batch_size: int = 4,
    infer_fn: Optional[Callable] = None,
    mesh=None,
) -> List[np.ndarray]:
    """Run the model over preprocessed frames; returns uint8 (H, W) maps.

    Pads the trailing batch to ``batch_size`` so a single compiled program
    serves any sequence length. With ``mesh``, frames are sharded across
    the devices (batch_size must be a multiple of the mesh size).
    """
    if infer_fn is not None:
        infer = infer_fn
    elif mesh is not None:
        assert batch_size % mesh.devices.size == 0, (batch_size, mesh)
        infer = make_sharded_infer_fn(model_config, mesh)
    else:
        infer = make_infer_fn(model_config)
    out: List[np.ndarray] = []
    n = len(frames)
    for start in range(0, n, batch_size):
        chunk = list(frames[start:start + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk += [chunk[-1]] * pad
        masks = np.asarray(infer(params, jnp.asarray(np.stack(chunk))))
        out.extend(masks[: batch_size - pad])
    return out


def save_mask_png(mask_u8: np.ndarray, path: str) -> None:
    """Write the continuous probability map as grayscale PNG (reference
    saves sigmoid*255, train_online.py:~175)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ok = cv2.imwrite(path, np.asarray(mask_u8, np.uint8))
    assert ok, path


def save_sequence_results(masks: Sequence[np.ndarray], fnames: Sequence[str],
                          results_dir: str, seq_name: str) -> None:
    """Reference layout: <save_root>/Results/<seq>/<frame>.png."""
    for mask, fname in zip(masks, fnames):
        stem = os.path.splitext(os.path.basename(fname))[0]
        save_mask_png(mask, os.path.join(results_dir, seq_name,
                                         f"{stem}.png"))
