"""Tracing and profiling utilities.

The reference has no profiling at all (SURVEY.md section 5: "Tracing /
profiling: none"); here every plate run can be timed per stage and full XLA
traces can be captured for TensorBoard/Perfetto via jax.profiler.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax

logger = logging.getLogger(__name__)

__all__ = ["StageTimer", "device_trace"]


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage; blocking-aware for device work.

    Usage:
        timer = StageTimer()
        with timer.stage("decode"):
            ...
        with timer.stage("device", block=result):   # waits for the device
            result = program(batch)
        print(timer.report())
    """

    totals: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, block=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                jax.block_until_ready(block)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:20s} {total:8.3f}s  ({n} calls, {total / n * 1e3:7.1f} ms/call)")
        return "\n".join(lines)

    def as_dict(self) -> dict[str, float]:
        return dict(self.totals)

    def dump(self, path: str | Path) -> None:
        payload = {"totals_s": self.totals, "counts": self.counts}
        Path(path).write_text(json.dumps(payload, indent=1))


@contextlib.contextmanager
def device_trace(log_dir: str | Path):
    """Capture an XLA device trace (TensorBoard / Perfetto readable).

    with device_trace("/tmp/trace"):
        program(batch).block_until_ready()
    """
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"XLA trace written to {log_dir}")
