"""Per-stage timing statistics + JAX profiler hooks.

Counterpart of the reference's ad-hoc timing (SURVEY.md §5): median-latency
vectors per stage dumped on `/command "time"` (`preprocessing_nodelet_ntu.cpp:
761-789`, `radar_graph_slam_nodelet.cpp:1352-1383`), `ugpm::StopWatch`, and
`TicToc`. `StageTimer` records wall times per named stage and prints the same
median/mean report; `trace()` wraps `jax.profiler` for device-level traces.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def tic(self, name: str):
        self._tics = getattr(self, "_tics", {})
        self._tics[name] = time.perf_counter()

    def toc(self, name: str):
        self.samples[name].append(time.perf_counter() - self._tics.pop(name))

    def report(self) -> str:
        """Median/mean/max per stage; parity with the `/command "time"` dump."""
        lines = [f"{'stage':<28}{'n':>6}{'median ms':>12}{'mean ms':>12}{'max ms':>12}"]
        for name, xs in sorted(self.samples.items()):
            ms = [1000 * x for x in xs]
            lines.append(
                f"{name:<28}{len(ms):>6}{statistics.median(ms):>12.2f}"
                f"{statistics.mean(ms):>12.2f}{max(ms):>12.2f}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gorio_trace"):
    """Device-level profiling via the JAX profiler (view with XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
