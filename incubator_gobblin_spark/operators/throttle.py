"""Egress rate limiting: the ThrottleWriter / RateBasedLimiter analogue.

Reference:
- ThrottleWriter rate-limits writes in records or bytes per second
  (gobblin-core .../writer/ThrottleWriter.java:44).
- RateBasedLimiter is the underlying token-bucket
  (gobblin-utility .../util/limiter/RateBasedLimiter.java:45).
- LimitingExtractorDecorator throttles extraction
  (gobblin-runtime .../LimitingExtractorDecorator.java).

Spark-first: ingestion throttling is admission control
(``maxOffsetsPerTrigger`` / ``maxFilesPerTrigger`` — see streaming.flow),
which needs no code here. What still needs a real limiter is *egress* to
rate-limited externals (HTTP APIs, JDBC servers) from inside
``foreachPartition``/``foreachBatch`` — Spark has no built-in for that.
The bucket is per-task (per partition); the aggregate cluster rate is
``rate_per_sec × concurrent tasks``, so callers size the per-task rate
as target_rate / expected parallelism — same arithmetic the reference's
per-fork limiter required.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator
from typing import TypeVar

T = TypeVar("T")


class TokenBucket:
    """Token bucket: ``rate_per_sec`` sustained, ``burst`` instantaneous.

    ``acquire(n)`` blocks until n tokens are available. Monotonic-clock
    based; refill is computed lazily (no background thread — safe inside
    Spark tasks)."""

    def __init__(self, rate_per_sec: float, burst: float | None = None):
        if rate_per_sec <= 0:
            raise ValueError("rate_per_sec must be > 0")
        self.rate = float(rate_per_sec)
        self.capacity = float(burst if burst is not None else rate_per_sec)
        self.tokens = self.capacity
        self.stamp = time.monotonic()

    def _refill(self) -> None:
        now = time.monotonic()
        self.tokens = min(self.capacity, self.tokens + (now - self.stamp) * self.rate)
        self.stamp = now

    def try_acquire(self, n: float = 1.0) -> bool:
        self._refill()
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def acquire(self, n: float = 1.0) -> float:
        """Block until n tokens are granted; returns seconds waited."""
        waited = 0.0
        while True:
            self._refill()
            if self.tokens >= n:
                self.tokens -= n
                return waited
            need = (n - self.tokens) / self.rate
            time.sleep(need)
            waited += need


def throttled(
    rows: Iterable[T],
    rate_per_sec: float,
    burst: float | None = None,
    cost: Callable[[T], float] | None = None,
) -> Iterator[T]:
    """Rate-limited pass-through iterator for foreachPartition bodies::

        def send(partition):
            for row in throttled(partition, rate_per_sec=100):
                http_post(row)
        df.foreachPartition(send)

    ``cost`` prices each row in tokens (records/sec by default; return
    byte counts for bytes/sec semantics — ThrottleWriter supported both).
    """
    bucket = TokenBucket(rate_per_sec, burst)
    for row in rows:
        bucket.acquire(cost(row) if cost is not None else 1.0)
        yield row
