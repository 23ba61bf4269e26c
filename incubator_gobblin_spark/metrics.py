"""Metrics emission: the scrapable runtime-metrics surface.

Reference: gobblin-metrics-libs — MetricContext trees with tags,
counters/meters/timers, and pluggable reporters (file/Kafka/JMX
emitters; throughput guidance in
gobblin-docs/metrics/Gobblin-Metrics-Performance.md:23). The engine's
inner loop already rides Spark's own metrics (task counters,
``observe()`` aggregates evaluated inside the action); what was
missing is an EMISSION surface a production user can scrape.

Spark-first: per-job metrics are collected driver-side (cheap — one
record per run, never per row; per-row counting stays in ``observe()``)
and emitted as JSON-lines events, one object per event, append-only —
the format log scrapers and the reference's OutputStreamReporter both
understand. Pipeline.run() reports run_id, rows, duration, watermark
automatically when a reporter is attached.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


@dataclass
class MetricsContext:
    """Named context with tags (MetricContext analogue); counters and
    timers accumulate in-process and flush as one event."""

    name: str
    tags: dict[str, str] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)
    gauges: dict[str, float] = field(default_factory=dict)
    timers: dict[str, float] = field(default_factory=dict)

    def counter(self, key: str, inc: int = 1) -> None:
        self.counters[key] = self.counters.get(key, 0) + inc

    def gauge(self, key: str, value: float) -> None:
        self.gauges[key] = float(value)

    def timer(self, key: str):
        """Context manager recording elapsed seconds."""
        ctx = self

        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                ctx.timers[key] = round(time.perf_counter() - self.t0, 6)
                return False

        return _T()

    def snapshot(self) -> dict:
        return {
            "context": self.name,
            "tags": self.tags,
            "counters": dict(self.counters),
            "gauges": dict(self.gauges),
            "timers": dict(self.timers),
        }


class FileMetricsReporter:
    """Append-only JSON-lines reporter (OutputStreamReporter/file
    emitter analogue). One ``emit`` = one line = one event; appends are
    O_APPEND atomic for lines under PIPE_BUF, and each line is
    self-contained so a torn tail never corrupts earlier events."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def emit(self, event: dict) -> None:
        line = json.dumps({"ts": round(time.time(), 3), **event})
        with open(self.path, "a") as fh:
            fh.write(line + "\n")

    def emit_context(self, ctx: MetricsContext) -> None:
        self.emit(ctx.snapshot())

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
