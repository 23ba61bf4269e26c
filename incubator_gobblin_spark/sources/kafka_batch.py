"""Kafka batch source: offset-range work planning + bounded reads.

Reference surface:
- KafkaSource computes one WorkUnit per topic-partition set with start/end
  offsets and handles offsets that fell out of the retention window
  (gobblin-modules/gobblin-kafka-common/.../kafka/KafkaSource.java:82,
  getWorkunits:190).
- KafkaExtractor pulls ``[startOffset, endOffset)`` per partition
  (kafka/KafkaExtractor.java:59).
- MultiLongWatermark carries one committed offset per partition
  (kafka/MultiLongWatermark.java:37).

Spark-first: planning produces the ``startingOffsets``/``endingOffsets``
JSON of ``spark.read.format("kafka")`` — Spark's Kafka relation then
opens one consumer per offset range in parallel (its input partitions
ARE the WorkUnits). The out-of-range reset policy is applied at plan
time against broker-reported earliest/latest, exactly where
KafkaSource.getWorkunits applied it. Payload decode composes with the
engine's converter transforms (from_json / schema lattice).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class OffsetResetPolicy(Enum):
    """What to do when the committed offset is outside the broker's
    retained [earliest, latest] range (KafkaSource's
    ``topic.move.to.earliest/latest.offset.allowed`` semantics)."""

    EARLIEST = "earliest"  # re-read from the oldest retained record
    LATEST = "latest"      # skip to the newest (lose the gap)
    FAIL = "fail"          # refuse to plan (default: data loss is an error)


@dataclass(frozen=True)
class PartitionRange:
    """One topic-partition's planned pull range: [start, end)."""

    topic: str
    partition: int
    start: int
    end: int


def plan_offsets(
    earliest: dict[int, int],
    latest: dict[int, int],
    committed: dict[int, int] | None,
    topic: str,
    reset: OffsetResetPolicy = OffsetResetPolicy.FAIL,
) -> list[PartitionRange]:
    """Compute per-partition pull ranges (KafkaSource.getWorkunits:190).

    ``committed`` holds the next-offset-to-read per partition from the
    previous run's watermark (MultiLongWatermark); None means first run
    (start from earliest). Ranges are [start, end) with end = latest at
    plan time, so consecutive runs tile the log with no gap/overlap —
    the same low-exclusive/high-inclusive discipline as query watermarks,
    shifted to Kafka's half-open convention.
    """
    ranges = []
    for p in sorted(latest):
        lo_avail, hi_avail = earliest.get(p, 0), latest[p]
        start = committed.get(p, lo_avail) if committed is not None else lo_avail
        if start < lo_avail:
            if reset is OffsetResetPolicy.FAIL:
                raise ValueError(
                    f"partition {p}: committed offset {start} < earliest "
                    f"{lo_avail} (records expired); set an explicit reset policy"
                )
            start = lo_avail if reset is OffsetResetPolicy.EARLIEST else hi_avail
        if start > hi_avail:
            # committed beyond latest: topic was recreated/truncated
            if reset is OffsetResetPolicy.FAIL:
                raise ValueError(
                    f"partition {p}: committed offset {start} > latest {hi_avail}"
                )
            start = lo_avail if reset is OffsetResetPolicy.EARLIEST else hi_avail
        ranges.append(PartitionRange(topic, p, start, hi_avail))
    return ranges


def offsets_json(ranges: list[PartitionRange]) -> tuple[str, str]:
    """(startingOffsets, endingOffsets) JSON for the Spark Kafka reader."""
    start: dict[str, dict[str, int]] = {}
    end: dict[str, dict[str, int]] = {}
    for r in ranges:
        start.setdefault(r.topic, {})[str(r.partition)] = r.start
        end.setdefault(r.topic, {})[str(r.partition)] = r.end
    return json.dumps(start), json.dumps(end)


def next_committed(ranges: list[PartitionRange]) -> dict[int, int]:
    """The watermark to persist after a successful run: end offsets become
    the next run's start (MultiLongWatermark advance)."""
    return {r.partition: r.end for r in ranges}


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    ranges: list[PartitionRange],
    value_schema=None,
    reader_format: str = "kafka",
    reader_options: dict[str, str] | None = None,
) -> DataFrame:
    """Bounded Kafka read over planned ranges (KafkaExtractor semantics).

    ``reader_format="kafka"`` targets the real connector (spark-sql-kafka
    on the classpath — a cluster deployment); ``"mockkafka"`` targets the
    file-backed broker (sources/mock_kafka.py, register it first), which
    executes the IDENTICAL planning -> offsets-JSON -> bounded-scan path
    in containers without the connector jar. When ``value_schema`` is
    given the JSON payload is parsed into columns; otherwise raw
    key/value bytes pass through (decode composes with converter
    transforms).
    """
    starting, ending = offsets_json(ranges)
    topics = sorted({r.topic for r in ranges})
    reader = (
        spark.read.format(reader_format)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting)
        .option("endingOffsets", ending)
    )
    if reader_format == "kafka":
        reader = reader.option("kafka.bootstrap.servers", bootstrap_servers)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    if value_schema is not None:
        df = df.select(
            "key",
            "topic",
            "partition",
            "offset",
            "timestamp",
            F.from_json(F.col("value").cast("string"), value_schema).alias("value"),
        )
    return df
