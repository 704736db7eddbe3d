"""Model/graph visualization (reference: util/visualize.py ``make_dot``).

The reference dumps the autograd graph to graphviz behind the drivers'
``vis_net`` flag (train_parent.py:~55). The JAX equivalents here:

- ``model_summary``: parameter-shape/count table via ``nn.tabulate`` — the
  human-readable "what is this network" view.
- ``make_dot``: a graphviz DOT string of the jitted computation's jaxpr
  (one node per primitive equation, edges along data dependencies). Works
  on any jittable ``fn`` — no torch/autograd needed — and needs only the
  stdlib: the DOT text renders with any graphviz install.
- ``save_dot``: write the DOT (and render to PDF/PNG iff the ``dot`` binary
  exists; otherwise the .dot file alone, silently).
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Callable, Optional

import jax


def model_summary(model, *example_args, **tabulate_kw) -> str:
    """Parameter table for a Flax module (``nn.tabulate`` wrapper)."""
    import flax.linen as nn

    return nn.tabulate(
        model, jax.random.PRNGKey(0),
        console_kwargs={"width": 120, "force_terminal": False},
        **tabulate_kw)(*example_args)


def make_dot(fn: Callable, *example_args, max_nodes: int = 2000) -> str:
    """DOT graph of ``jax.make_jaxpr(fn)``'s equations.

    Mirrors the role of the reference's ``visualize.make_dot(y, params)``:
    a quick structural picture of the traced computation. Nodes are
    primitives (label: name + output shape); edges follow variables.
    """
    jaxpr = jax.make_jaxpr(fn)(*example_args).jaxpr
    lines = ["digraph jaxpr {", '  rankdir="TB";',
             '  node [shape=box, fontsize=9, style=filled,'
             ' fillcolor="#e8f0fe"];']
    producer = {}
    for i, invar in enumerate(jaxpr.invars):
        name = f"in{i}"
        lines.append(f'  {name} [label="input {i}\\n{invar.aval.str_short()}",'
                     ' fillcolor="#d2f8d2"];')
        producer[invar] = name
    for i, eqn in enumerate(jaxpr.eqns[:max_nodes]):
        name = f"n{i}"
        out = eqn.outvars[0]
        shape = getattr(out, "aval", None)
        label = eqn.primitive.name
        if shape is not None:
            label += f"\\n{shape.str_short()}"
        lines.append(f'  {name} [label="{label}"];')
        for v in eqn.invars:
            src = producer.get(v)
            if src is not None:
                lines.append(f"  {src} -> {name};")
        for v in eqn.outvars:
            producer[v] = name
    for i, outvar in enumerate(jaxpr.outvars):
        name = f"out{i}"
        lines.append(f'  {name} [label="output {i}", fillcolor="#ffd9d9"];')
        src = producer.get(outvar)
        if src is not None:
            lines.append(f"  {src} -> {name};")
    lines.append("}")
    return "\n".join(lines)


def save_dot(dot: str, path: str, render: Optional[str] = "pdf") -> str:
    """Write ``path``(.dot) and render via the ``dot`` binary if present."""
    dot_path = path if path.endswith(".dot") else path + ".dot"
    with open(dot_path, "w") as f:
        f.write(dot)
    if render and shutil.which("dot"):
        subprocess.run(["dot", f"-T{render}", dot_path, "-o",
                        dot_path[:-4] + f".{render}"], check=False)
    return dot_path
