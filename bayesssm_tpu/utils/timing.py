"""Per-phase timing / observability.

The reference's observability is message() progress prints
(/root/reference/R/pmmh.R:347-352). Here every pipeline phase is timed and
the numbers are returned on the output object (and printed under
``verbose``), plus a hook for `jax.profiler` traces in the benchmark
harness (SURVEY.md §5 "tracing/profiling").
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["PhaseTimer"]


class PhaseTimer:
    """Collects wall-clock seconds per named phase."""

    def __init__(self, verbose: bool = False):
        self.timings: dict[str, float] = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + elapsed
            if self.verbose:
                print(f"[timing] {name}: {elapsed:.2f}s")
