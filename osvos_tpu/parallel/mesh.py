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


def initialize_multihost() -> bool:
    """Multi-host entry (SURVEY.md §5 distributed-comm row).

    A single v5e-8 slice is one host, so nothing here runs by default; on a
    multi-host slice (or multi-slice DCN job) set ``OSVOS_MULTIHOST=1`` in
    every process and launch one process per host — ``jax.distributed
    .initialize()`` picks coordinator/process_id/local devices from the TPU
    runtime environment, after which ``jax.devices()`` is global and every
    mesh in this module spans the full job. Returns True when the
    distributed runtime was initialized.
    """
    import os

    if os.environ.get("OSVOS_MULTIHOST", "0") != "1":
        return False
    jax.distributed.initialize()
    return True


def make_mesh(axis_name: str = "data",
              devices: Optional[Sequence] = None,
              n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) local devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        assert len(devs) >= n_devices, (len(devs), n_devices)
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
