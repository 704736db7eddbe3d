"""Checkpointing (params, opt_state, step) with orbax.

Improves on the reference's snapshot story (train_parent.py:~140 saves only
``net.state_dict()`` every 40 epochs — SGD momentum is lost on resume,
SURVEY.md §5): we checkpoint the full (params, opt_state, epoch) tuple, so
resume is exact. A flax-serialization msgpack fallback covers environments
without orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0) -> str:
    """Write a msgpack checkpoint (atomic rename)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict: optax states (MultiStepsState etc.) are custom pytree
    # nodes msgpack can't pack; flatten them to plain nested dicts first.
    payload = {
        "params": serialization.to_state_dict(jax.device_get(params)),
        "opt_state": (serialization.to_state_dict(jax.device_get(opt_state))
                      if opt_state is not None else {}),
        "step": step,
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, like_params: Any = None,
                    like_opt_state: Any = None):
    """Read a checkpoint; if templates are given, restore exact pytree
    structure (msgpack stores dicts/lists only)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = payload["params"]
    opt_state = payload.get("opt_state") or None
    if like_params is not None:
        params = serialization.from_state_dict(like_params, params)
    if like_opt_state is not None and opt_state is not None:
        opt_state = serialization.from_state_dict(like_opt_state, opt_state)
    return params, opt_state, int(payload.get("step", 0))


class OrbaxCheckpointer:
    """Async orbax checkpointing for long parent runs (crash-safe resume)."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(self.directory)

    def save(self, step: int, params: Any, opt_state: Any) -> None:
        self.mngr.save(step, args=self._ocp.args.StandardSave(
            {"params": params, "opt_state": opt_state}))

    def restore(self, step: Optional[int] = None, like: Any = None):
        step = step if step is not None else self.mngr.latest_step()
        restored = self.mngr.restore(
            step, args=self._ocp.args.StandardRestore(like))
        return restored, step

    def close(self):
        self.mngr.wait_until_finished()
        self.mngr.close()
