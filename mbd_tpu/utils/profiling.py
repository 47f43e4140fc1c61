"""Tracing / profiling hooks (SURVEY §5: the reference has none — only
whole-run wall clocks; we make per-phase timing and device traces
first-class).

  with trace("results/trace"):            # XLA/TPU profiler trace
      mbd.plan(env, cfg, rng)

  t = Timer()
  with t.phase("rollout"):
      ...
  print(t.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock phase timer (device-synchronizing)."""

    def __init__(self, sync: bool = True):
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)
        self._sync = sync

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync:
                import jax

                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> str:
        total = sum(self._acc.values()) or 1.0
        lines = []
        for name, t in sorted(self._acc.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:24s} {t:8.3f}s  {100 * t / total:5.1f}%  "
                         f"(x{self._count[name]})")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self._acc)
