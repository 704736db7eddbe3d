"""Parameter initialization and torch-checkpoint porting ("surgery").

Mirrors the reference's ``OSVOS._initialize_weights`` (vgg_osvos.py:~85):
new convs (side_prep / score_dsn / fuse) get N(0, 0.001) weights and zero
bias; the trunk is either freshly initialized or copied from an
ImageNet-pretrained torchvision VGG-16 ``features`` module by an
index-matched walk (vgg_osvos.py:~95); the transposed-conv upsamplers get
the fixed bilinear kernel (here they are constants — see ops/upsample.py).

Porting operates on plain ``{name: np.ndarray}`` dicts so the core never
imports torch; ``osvos_tpu.utils.torch_port`` converts ``.pth`` files into
that form.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from osvos_tpu.configs import ModelConfig
from osvos_tpu.models.vgg_osvos import OSVOS, stage_conv_names
from osvos_tpu.ops.upsample import (bilinear_filter,
                                    interp_surgery_weights)


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def init_osvos_params(
    key: jax.Array,
    config: ModelConfig = ModelConfig(),
    trunk_weights: Optional[Mapping[str, np.ndarray]] = None,
    input_hw=(64, 64),
):
    """Build the OSVOS param pytree.

    trunk_weights: optional flat dict of torchvision-VGG16 ``features``
    weights, keys ``features.<idx>.weight`` / ``.bias`` in OIHW — applied to
    the trunk convs in forward order (the reference's index-matched walk).
    New-layer init matches the reference: side_prep/score_dsn/fuse kernels
    ~ N(0, 0.001), biases zero.
    """
    # Init with the train-safe 'fast' twin when the requested mode can't
    # (int8 asserts out of training) or shouldn't (flat would compile its
    # Pallas kernels for a throwaway dummy geometry) trace a train pass —
    # the param tree is identical across compute modes (tested:
    # tests/test_flat.py::test_flat_model_param_tree_matches_fast).
    init_config = config
    if config.compute_mode in ("int8", "flat"):
        import dataclasses

        init_config = dataclasses.replace(config, compute_mode="fast")
    model = OSVOS(init_config)
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    params = model.init(key, dummy)["params"]
    params = jax.tree.map(np.asarray, params)

    # Reference-distribution init for the new layers.
    knew = jax.random.fold_in(key, 1)
    for i in range(1, 5):
        for name in (f"side_prep{i}", f"score_dsn{i}"):
            knew, sub = jax.random.split(knew)
            shape = params[name]["kernel"].shape
            params[name]["kernel"] = np.asarray(
                0.001 * jax.random.normal(sub, shape, jnp.float32))
            params[name]["bias"] = np.zeros_like(params[name]["bias"])
    knew, sub = jax.random.split(knew)
    params["fuse"]["kernel"] = np.asarray(
        0.001 * jax.random.normal(sub, params["fuse"]["kernel"].shape, jnp.float32))
    params["fuse"]["bias"] = np.zeros_like(params["fuse"]["bias"])

    if trunk_weights is not None:
        params = _apply_vgg_features(params, trunk_weights, config)
    return jax.tree.map(jnp.asarray, params)


def _apply_vgg_features(params, feats: Mapping[str, np.ndarray], config):
    """Copy torchvision ``vgg16().features`` convs onto the trunk in order."""
    conv_indices = sorted(
        {int(k.split(".")[1]) for k in feats if k.endswith(".weight")
         and k.startswith("features.")})
    names = stage_conv_names(config.stages)
    assert len(conv_indices) >= len(names), (
        f"VGG features has {len(conv_indices)} convs, need {len(names)}")
    for (pname, in_ch, out_ch), idx in zip(names, conv_indices):
        w = np.asarray(feats[f"features.{idx}.weight"], np.float32)
        b = np.asarray(feats[f"features.{idx}.bias"], np.float32)
        assert w.shape == (out_ch, in_ch, 3, 3), (pname, w.shape)
        params[pname]["kernel"] = _oihw_to_hwio(w)
        params[pname]["bias"] = b
    return params


def load_torch_state_dict(
    state: Mapping[str, np.ndarray],
    config: ModelConfig = ModelConfig(),
    check_upsample: bool = True,
):
    """Convert a reference OSVOS ``state_dict`` (as numpy) into our pytree.

    Handles the reference module naming: ``stages.<s>.<idx>.weight`` (idx
    skips ReLU/pool slots), ``side_prep.<i>.*``, ``score_dsn.<i>.*``,
    ``upscale.<i>.weight`` / ``upscale_.<i>.weight`` (frozen bilinear —
    verified against our baked-in kernel and dropped), ``fuse.*``.
    """
    params: Dict[str, Dict[str, np.ndarray]] = {}

    # Trunk: group keys by stage, order by the integer layer index.
    stage_keys: Dict[int, List[int]] = {}
    for k in state:
        if k.startswith("stages.") and k.endswith(".weight"):
            parts = k.split(".")
            stage_keys.setdefault(int(parts[1]), []).append(int(parts[2]))
    for s, widths in enumerate(config.stages):
        idxs = sorted(stage_keys.get(s, []))
        assert len(idxs) == len(widths), (
            f"stage {s}: found {len(idxs)} convs, expected {len(widths)}")
        for j, idx in enumerate(idxs):
            params[f"stage{s + 1}_conv{j}"] = {
                "kernel": _oihw_to_hwio(np.asarray(
                    state[f"stages.{s}.{idx}.weight"], np.float32)),
                "bias": np.asarray(state[f"stages.{s}.{idx}.bias"], np.float32),
            }

    for i in range(4):
        for src, dst in ((f"side_prep.{i}", f"side_prep{i + 1}"),
                         (f"score_dsn.{i}", f"score_dsn{i + 1}")):
            params[dst] = {
                "kernel": _oihw_to_hwio(np.asarray(state[f"{src}.weight"],
                                                   np.float32)),
                "bias": np.asarray(state[f"{src}.bias"], np.float32),
            }
        if check_upsample:
            for src in (f"upscale.{i}.weight", f"upscale_.{i}.weight"):
                if src not in state:
                    continue
                w = np.asarray(state[src], np.float32)
                want = interp_surgery_weights(w.shape[0], w.shape[-1])
                if not np.allclose(w, want, atol=1e-5):
                    raise ValueError(
                        f"{src} deviates from the frozen bilinear kernel; "
                        "this checkpoint trained its upsamplers, which the "
                        "TPU model folds as constants. Re-export with "
                        "trainable_upsample support.")

    params["fuse"] = {
        "kernel": _oihw_to_hwio(np.asarray(state["fuse.weight"], np.float32)),
        "bias": np.asarray(state["fuse.bias"], np.float32),
    }
    return jax.tree.map(jnp.asarray, params)
