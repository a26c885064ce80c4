"""Logging + lightweight wall-clock instrumentation.

Reference analog: src/ahsd/utils/logging.py (setup_logging, TimingLogger,
memory/system logging). The rebuild adds orbax/absl noise suppression —
checkpoint saves otherwise flood INFO — and jax.profiler hooks
(SURVEY.md §5 tracing note).
"""

from __future__ import annotations

import contextlib
import logging
import resource
import time
from typing import Optional


def quiet_dependency_logs():
    """Silence orbax/absl/jax INFO chatter (checkpoint saves otherwise
    flood stdout) without touching the root logger config."""
    for name in ("absl", "orbax", "jax._src", "jax.experimental", "etils"):
        logging.getLogger(name).setLevel(logging.WARNING)
    try:
        import absl.logging as absl_logging
        absl_logging.set_verbosity(absl_logging.WARNING)
    except ImportError:
        pass


def setup_logging(level: int = logging.INFO,
                  quiet_deps: bool = True) -> logging.Logger:
    # force=True: the axon platform plugin configures the root logger at
    # interpreter start, which would make a plain basicConfig a silent
    # no-op (root stays at WARNING and every INFO line is dropped)
    logging.basicConfig(
        level=level, force=True,
        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    if quiet_deps:
        quiet_dependency_logs()
    return logging.getLogger("posteriflow")


class TimingLogger:
    """Context-manager stage timer collecting into a dict (the shape the
    result diagnostics carry: reference pipeline.py:79-86)."""

    def __init__(self, log: Optional[logging.Logger] = None):
        self.timings: dict[str, float] = {}
        self.log = log

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            if self.log:
                self.log.info("%s: %.3fs", name, dt)


def peak_rss_mb() -> float:
    """Peak resident set size [MB] (the reference reports RSS in result
    diagnostics: pipeline.py:190-196)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@contextlib.contextmanager
def jax_trace(logdir: Optional[str]):
    """Optional jax.profiler trace around a region (no-op when logdir is
    None) — the profiler integration the reference lacks."""
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield
