"""Watermark predicates and interval partitioning for incremental ingest.

Reference: watermarks in Gobblin are *incremental-processing cursors*
(SURVEY.md §1.5), not event-time watermarks:

- Watermark / CheckpointableWatermark / WatermarkInterval
  (gobblin-api .../source/extractor/Watermark.java:33,
  WatermarkInterval.java:30) — a serialized [low, high] progress range.
- Predicate / WatermarkPredicate (gobblin-core
  .../extractor/watermark/Predicate.java:27): ``{column, value,
  condition, format}`` conditions injected into source SQL.
- Partitioner (gobblin-core .../source/extractor/partition/Partitioner.java:50,
  getGlobalPartition:95, getPartitionList:167): split [low, high] into N
  interval partitions at simple/hour/date/timestamp granularity.
- Watermark format types: SimpleWatermark, DateWatermark ("yyyyMMdd"),
  HourWatermark, TimestampWatermark ("yyyyMMddHHmmss")
  (gobblin-core .../source/extractor/watermark/*.java).

Spark-first: the predicate is a Column pushed into the scan (parquet
row-group pruning / JDBC WHERE pushdown — verified via PushedFilters in
the physical plan), and interval partitioning maps onto
``spark.read.jdbc(partitionColumn, lowerBound, upperBound, numPartitions)``
for JDBC or simply falls out of file listing for lake scans. The state
side (remembering the committed high watermark between runs) lives in
``state.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class WatermarkType(Enum):
    """Granularities of QueryBasedSource watermarks
    (gobblin-core .../extractor/watermark/WatermarkType.java)."""

    SIMPLE = "simple"        # opaque monotonically increasing long
    DATE = "date"            # day granularity
    HOUR = "hour"            # hour granularity
    TIMESTAMP = "timestamp"  # second granularity


@dataclass(frozen=True)
class WatermarkInterval:
    """The (low, expected-high] range a run is responsible for
    (gobblin-api .../source/extractor/WatermarkInterval.java:30).

    Semantics replicated from QueryBasedExtractor's predicate generation:
    low-exclusive, high-inclusive — so consecutive runs partition the
    stream with no gap and no overlap.
    """

    column: str
    low: object | None  # None -> full snapshot (first run)
    high: object | None  # None -> unbounded (read to current)

    def predicate(self) -> Column:
        cond = F.lit(True)
        if self.low is not None:
            cond = cond & (F.col(self.column) > F.lit(self.low))
        if self.high is not None:
            cond = cond & (F.col(self.column) <= F.lit(self.high))
        return cond

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate())


def partition_interval(
    low: datetime, high: datetime, num_partitions: int
) -> list[tuple[datetime, datetime]]:
    """Split a [low, high] timestamp range into N half-open (lo, hi]
    chunks (Partitioner.getPartitionList:167). Used to parallelize
    watermark back-fills (each chunk is an independent incremental run)
    and to drive JDBC partitioned reads."""
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    total = (high - low) / num_partitions
    bounds = [low + total * i for i in range(num_partitions)] + [high]
    return [(bounds[i], bounds[i + 1]) for i in range(num_partitions)]


def high_watermark(df: DataFrame, column: str):
    """Compute the actual high watermark of the data just processed —
    the value persisted to the state store for the next run
    (QueryBasedExtractor's adjusted high watermark)."""
    row = df.select(F.max(F.col(column)).alias("hwm")).first()
    return row["hwm"] if row else None
