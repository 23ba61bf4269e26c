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


class ConsoleMetricsReporter:
    """OutputStreamReporter-to-stdout analogue (the reference's default
    console emitter): each event renders as one ``key=value`` line —
    human-readable in driver logs, still machine-greppable."""

    def __init__(self, stream=None) -> None:
        import sys

        self.stream = stream or sys.stdout

    def emit(self, event: dict) -> None:
        flat = flatten_event(event)
        body = " ".join(f"{k}={v}" for k, v in sorted(flat.items()))
        self.stream.write(f"[metrics] {body}\n")

    def emit_context(self, ctx: MetricsContext) -> None:
        self.emit(ctx.snapshot())


class AggregatingMetricsReporter:
    """In-memory rollup reporter — the offline analogue of the Graphite /
    InfluxDB emitters (gobblin-metrics-graphite GraphiteReporter,
    gobblin-metrics-influxdb InfluxDBReporter): every event flattens
    into dotted metric keys; numeric values accumulate as (count, sum,
    last) so a scraper sees both totals and the latest gauge. Feed it
    alongside a FileMetricsReporter via CompositeMetricsReporter."""

    def __init__(self) -> None:
        self.stats: dict[str, dict] = {}
        self.events: int = 0

    def emit(self, event: dict) -> None:
        self.events += 1
        for key, val in flatten_event(event).items():
            if not isinstance(val, (int, float)) or isinstance(val, bool):
                continue
            s = self.stats.setdefault(key, {"count": 0, "sum": 0.0, "last": None})
            s["count"] += 1
            s["sum"] += float(val)
            s["last"] = float(val)

    def emit_context(self, ctx: MetricsContext) -> None:
        self.emit(ctx.snapshot())

    def totals(self) -> dict[str, float]:
        return {k: s["sum"] for k, s in self.stats.items()}

    def last(self) -> dict[str, float]:
        return {k: s["last"] for k, s in self.stats.items()}


class CompositeMetricsReporter:
    """Fan one emission out to several reporters (the reference attaches
    multiple reporters to one MetricContext the same way)."""

    def __init__(self, *reporters) -> None:
        self.reporters = list(reporters)

    def emit(self, event: dict) -> None:
        for r in self.reporters:
            r.emit(event)

    def emit_context(self, ctx: MetricsContext) -> None:
        for r in self.reporters:
            r.emit_context(ctx)


def flatten_event(event: dict, prefix: str = "") -> dict:
    """Flatten a nested event into dotted keys — Graphite's metric-path
    convention. Tag dicts flatten too (tags.table=lineitem); context
    names prefix everything under them."""
    out: dict = {}
    name = event.get("context") if not prefix else None
    base = f"{name}." if name else prefix
    for k, v in event.items():
        if k == "context":
            continue
        key = f"{base}{k}"
        if isinstance(v, dict):
            out.update(flatten_event(v, prefix=f"{key}."))
        else:
            out[key] = v
    return out
