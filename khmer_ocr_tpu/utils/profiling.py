"""Tracing / profiling hooks — the reference has none (SURVEY.md §5: only tqdm
progress bars). Here: jax.profiler trace capture + per-stage wall timers that
force device synchronization, used by bench.py and the evaluator.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class StageTimes:
    totals: dict = dataclasses.field(default_factory=dict)
    counts: dict = dataclasses.field(default_factory=dict)

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1000:.2f}ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer(times: StageTimes, name: str, sync=None):
    """Times a stage; pass sync=a-jax-array (or pytree) to block on device work —
    on the axon remote client only a device->host fetch truly synchronizes, so
    callers should fetch results inside the block."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        times.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/khmer_ocr_trace", enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
