"""Device-mesh helpers.

The reference is single-GPU (device picked by ``gpu_id``,
train_parent.py:~35) with no distributed backend. Here every parallel path
is expressed over a ``jax.sharding.Mesh``:

- parent training: 1-D 'data' mesh, batch sharded, params replicated, grad
  psum inserted by XLA from sharding annotations;
- online adaptation: 1-D 'seq' mesh, the *stacked per-sequence model states*
  sharded across devices (collective-free — each sequence's fine-tune is
  independent);
- inference: frames sharded on 'data'.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_name: str = "data",
              devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        assert len(devs) >= n_devices, (len(devs), n_devices)
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
