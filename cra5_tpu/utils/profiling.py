"""Tracing / profiling utilities.

The reference only has wall-clock time.time() spans
(/root/reference/cra5/api/cra5_api.py:88-125, vaeformer.py:254-269);
this module adds the same timing-span surface plus jax.profiler
integration (SURVEY.md §5 "TPU build: jax.profiler traces + per-phase
timing in the API returns").
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


class Timings:
    """Accumulates named wall-clock spans; the API facades return these
    dicts with the same keys as the reference (reading/encoding/saving)."""

    def __init__(self):
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.spans[name] = self.spans.get(name, 0.0) + time.time() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.spans)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """XLA/TPU profiler trace around a region; view with TensorBoard or
    xprof. No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-trace (shows up in the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
