"""Per-stage wall-clock timing.

TPU-era equivalent of the reference's timing story: the Rake pipeline's
per-stage printout (Rakefile.rb:122-148, 197-208, formatter :49-57) and the
bench modes' millisecond deltas (src/Project4.scala:289-295 etc.).
"""

from __future__ import annotations

import contextlib
import time


def format_duration(seconds: float) -> str:
    """h:m:s:ms rendering like the Rakefile's print_time_diff."""
    hrs = int(seconds // 3600)
    rem = seconds % 3600
    mins = int(rem // 60)
    rem = rem % 60
    secs = int(rem)
    ms = int((rem % 1) * 1000)
    return f"{hrs}h:{mins}m:{secs}s:{ms}ms"


class StageTimer:
    """Collects named stage durations; supports nesting via labels."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self._order: list[str] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.stages:
                self._order.append(name)
                self.stages[name] = 0.0
            self.stages[name] += dt

    def total(self) -> float:
        # dotted names ("pairgen.plan") are nested inside their parent
        # stage and already counted there
        return sum(v for k, v in self.stages.items() if "." not in k)

    def report(self) -> str:
        lines = ["============ Time Taken ============="]
        lines.append(f"Total Time : {format_duration(self.total())}")
        for name in self._order:
            lines.append(f"  {name:<18}: {format_duration(self.stages[name])}")
        return "\n".join(lines)
