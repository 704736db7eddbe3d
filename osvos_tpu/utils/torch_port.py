"""One-way ``.pth`` -> numpy/orbax conversion for published checkpoints.

The reference ships/loads two kinds of torch checkpoints: the torchvision
ImageNet VGG-16 (vgg_osvos.py:~95) and the trained parent network
``parent_epoch-239.pth`` (train_online.py:~50). This module converts either
into the plain ``{name: np.ndarray}`` dicts consumed by
``osvos_tpu.models.surgery`` and can persist them as ``.npz`` so later runs
do not need torch at all.

torch is imported lazily and only here — the framework itself never
depends on it.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_pth_as_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth``/``.pt`` state_dict (or ``.npz``) as numpy."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # local import; CPU-only wheel is fine

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def save_numpy_state(state: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **state)


def convert_parent_checkpoint(pth_path: str, out_npz: str) -> None:
    """CLI helper: ``python -m osvos_tpu.utils.torch_port in.pth out.npz``."""
    save_numpy_state(load_pth_as_numpy(pth_path), out_npz)


if __name__ == "__main__":
    import sys

    convert_parent_checkpoint(sys.argv[1], sys.argv[2])
