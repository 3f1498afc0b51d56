"""Stage tracing: wall-clock timers, throughput counters, peak RSS, and
optional JAX profiler capture.

The reference's observability is stage prints + a per-100k-reads progress
line + peak RSS (/root/reference/phaser/phaser.py:161-175, 2354-2356,
read_variant_map.py:120-123).  This module structures the same signals:
every pipeline stage records wall time and item counts; a run summary
reports reads/s per stage.  Set PHASER_TPU_PROFILE_DIR to also capture a
JAX profiler trace for the device stages.
"""

from __future__ import annotations

import contextlib
import os
import resource
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageStat:
    name: str
    seconds: float = 0.0
    items: int = 0
    unit: str = "items"

    @property
    def rate(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


@dataclass
class Tracer:
    stats: Dict[str, StageStat] = field(default_factory=dict)
    order: List[str] = field(default_factory=list)
    _profiling: bool = False

    def __post_init__(self):
        prof_dir = os.environ.get("PHASER_TPU_PROFILE_DIR")
        if prof_dir:
            try:
                import jax
                jax.profiler.start_trace(prof_dir)
                self._profiling = True
            except Exception:
                pass

    @contextlib.contextmanager
    def stage(self, name: str, unit: str = "items"):
        from .failures import failure_stage
        if name not in self.stats:
            self.stats[name] = StageStat(name, unit=unit)
            self.order.append(name)
        st = self.stats[name]
        t0 = time.perf_counter()
        try:
            with failure_stage(name):
                yield st
        finally:
            st.seconds += time.perf_counter() - t0

    def add(self, name: str, items: int, unit: str = "items") -> None:
        if name not in self.stats:
            self.stats[name] = StageStat(name, unit=unit)
            self.order.append(name)
        self.stats[name].items += items

    def peak_rss_mb(self) -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    def summary_lines(self) -> List[str]:
        out = ["     --- stage timings ---"]
        for name in self.order:
            st = self.stats[name]
            line = "     %-28s %8.3fs" % (name, st.seconds)
            if st.items:
                line += "  %12d %s (%.0f/s)" % (st.items, st.unit, st.rate)
            out.append(line)
        out.append("     peak RSS: %.1f MB" % self.peak_rss_mb())
        return out

    def finish(self) -> None:
        if self._profiling:
            try:
                import jax
                jax.profiler.stop_trace()
            except Exception:
                pass
