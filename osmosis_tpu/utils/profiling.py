"""Tracing / profiling hooks (SURVEY.md section 5).

The reference's telemetry is tqdm postfix text and wall-clock deltas
(gaussian_diffusion.py:210,276-296; osmosis_sampling.py:131,358) plus an
unused timing context in its vendored logger (osmosis_utils/logger.py:
293-317). Here:

  * ``phase(name)`` — wall-clock phase timer, accumulated + logged
  * ``device_trace(dir)`` — jax.profiler trace context (TensorBoard format)
  * ``enable_nan_debugging()`` — jax debug_nans, the moral equivalent of a
    sanitizer for this workload
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["phase timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name:24s} {self.totals[name]:8.2f}s / {self.counts[name]} calls"
            )
        return "\n".join(lines)


TIMERS = PhaseTimers()
phase = TIMERS.phase


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    import jax

    jax.config.update("jax_debug_nans", True)
