"""Wall-clock tag profiler + device-aware timing helpers.

Mirrors the reference's ``Benchmarker`` API (tools.py:60-82: named tags,
tick_start/tick_end, CSV-ish mean-time report) so the monitor can log the
same three phase tags (base.py:410-412) — and extends it with a
``device_tick`` context manager that brackets jitted calls with
``block_until_ready`` so device kernels are timed honestly, plus an optional
``jax.profiler`` trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np


class Benchmarker:
    """Named-tag wall-clock timer (reference tools.py:60-82 API)."""

    def __init__(self) -> None:
        self.starts: Dict[str, float] = {}
        self.ticks: Dict[str, List[float]] = {}

    def add_tag(self, tag: str) -> None:
        self.ticks[tag] = []

    def has_tag(self, tag: str) -> bool:
        return tag in self.ticks

    def tick_start(self, tag: str) -> None:
        self.starts[tag] = time.time()

    def tick_end(self, tag: str) -> None:
        self.ticks[tag].append(time.time() - self.starts[tag])

    def get_report(self) -> str:
        rows = [
            "{0}, {1}, {2}".format(tag, np.mean(vals) if vals else np.nan,
                                   len(vals))
            for tag, vals in self.ticks.items()
        ]
        return "Tag, Average Time (seconds), Iterations\r\n" + \
            "\r\n".join(rows)

    @contextlib.contextmanager
    def device_tick(self, tag: str, result_holder=None):
        """Bracket a device computation; blocks on the result so the timing
        covers actual execution, not dispatch."""
        if tag not in self.ticks:
            self.add_tag(tag)
        self.tick_start(tag)
        try:
            yield
        finally:
            if result_holder is not None:
                import jax

                jax.block_until_ready(result_holder)
            self.tick_end(tag)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Optional jax.profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
