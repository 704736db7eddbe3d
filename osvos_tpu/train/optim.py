"""SGD with the reference's per-module parameter groups, in optax.

The reference builds ``optim.SGD`` with ~10 parameter groups
(train_parent.py:~60-90): trunk conv weights at base lr with weight decay,
all biases at 2x lr without decay, score_dsn at lr/10 (bias 2*lr/10), fuse
at lr/100 (bias 2*lr/100), and the transposed-conv upsamplers frozen at
lr=0 (here: not parameters at all, see ops/upsample.py). We reproduce that
with ``optax.multi_transform`` over labels derived from the param path, each
leaf transform being torch-semantics SGD: grad += wd * param (decay before
momentum), buf = mu * buf + grad, param -= lr * buf.

Gradient accumulation (nAveGrad, train_parent.py:~125) uses
``optax.MultiSteps``: the reference divides each microbatch loss by nAveGrad
and sums gradients, which equals MultiSteps' mean-of-gradients; momentum
advances once per effective step in both.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class GroupSpec(NamedTuple):
    lr_mult: float
    weight_decay: float


# Reference group table (train_parent.py:~60-90; SURVEY.md §3.1).
REFERENCE_GROUPS: Mapping[str, GroupSpec] = {
    "stage_w": GroupSpec(1.0, 1.0),   # weight_decay multiplier 1 -> wd
    "stage_b": GroupSpec(2.0, 0.0),
    "side_w": GroupSpec(1.0, 1.0),
    "side_b": GroupSpec(2.0, 0.0),
    "dsn_w": GroupSpec(0.1, 1.0),
    "dsn_b": GroupSpec(0.2, 0.0),
    "fuse_w": GroupSpec(0.01, 1.0),
    "fuse_b": GroupSpec(0.02, 0.0),
}


def param_group_label(path) -> str:
    """Map a param pytree path (module_name, leaf_name) to its group."""
    module = path[0] if isinstance(path[0], str) else path[0].key
    leaf = path[-1] if isinstance(path[-1], str) else path[-1].key
    is_bias = leaf == "bias"
    if module.startswith("stage"):
        return "stage_b" if is_bias else "stage_w"
    if module.startswith("side_prep"):
        return "side_b" if is_bias else "side_w"
    if module.startswith("score_dsn"):
        return "dsn_b" if is_bias else "dsn_w"
    if module == "fuse":
        return "fuse_b" if is_bias else "fuse_w"
    raise ValueError(f"unlabelled parameter {path}")


def make_osvos_optimizer(
    params,
    base_lr: float,
    momentum: float = 0.9,
    weight_decay: float = 0.0002,
    n_ave_grad: int = 1,
    groups: Optional[Mapping[str, GroupSpec]] = None,
) -> optax.GradientTransformation:
    """Build the reference-faithful grouped SGD for an OSVOS param pytree.

    Implemented as ONE tree traversal with static per-leaf (lr, wd)
    multipliers rather than ``optax.multi_transform`` over 8 masked
    sub-transforms — multi_transform walks the full tree once per group
    (8x the HBM traffic on a 55M-param model; it alone cost ~100 ms/step
    in the jit'd online loop). Per-leaf semantics are torch SGD exactly:
    ``g += wd*p; buf = mu*buf + g; p -= lr*buf``.
    """
    groups = groups or REFERENCE_GROUPS

    lr_tree = jax.tree_util.tree_map_with_path(
        lambda path, _: base_lr * groups[param_group_label(path)].lr_mult,
        params)
    wd_tree = jax.tree_util.tree_map_with_path(
        lambda path, _: (weight_decay
                         * groups[param_group_label(path)].weight_decay),
        params)

    def init_fn(params):
        return optax.TraceState(
            trace=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        assert params is not None, "grouped SGD needs params (weight decay)"

        def leaf(g, buf, p, lr, wd):
            g = g + wd * p if wd else g
            buf = momentum * buf + g
            return -lr * buf, buf

        out = jax.tree.map(leaf, updates, state.trace, params, lr_tree,
                           wd_tree)
        new_updates = jax.tree.map(lambda o: o[0], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
        new_trace = jax.tree.map(lambda o: o[1], out,
                                 is_leaf=lambda x: isinstance(x, tuple))
        return new_updates, optax.TraceState(trace=new_trace)

    tx = optax.GradientTransformation(init_fn, update_fn)
    if n_ave_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=n_ave_grad)
    return tx
