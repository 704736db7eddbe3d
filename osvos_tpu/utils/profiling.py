"""Tracing / profiling (SURVEY.md §5 — absent in the reference beyond a
wall-clock print of the online fine-tune time, train_online.py:~130).

Thin wrappers over ``jax.profiler``: perfetto-compatible device traces and
named annotation scopes around the hot phases (fine-tune chunk, inference
batch), plus a tiny phase-timer registry that feeds the benchmark numbers
(sec/sequence, frames/sec/chip) without any profiler overhead when off.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (view in Perfetto / XProf) when
    ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible on the trace timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating wall-clock phase timer (blocks on device completion)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4),
                    "mean_s": round(v / max(self.counts[k], 1), 4),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}
