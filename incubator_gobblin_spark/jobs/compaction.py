"""Compaction: dedup-with-delta + small-file rewrite.

Reference: gobblin-compaction's MR job
(.../mapreduce/MRCompactorAvroKeyDedupJobRunner.java:63) groups records
by key schema and reduces to one record per key (RecordKeyDedupReducerBase
:74-97 — delta-comparator argmax, else any), while also solving the
small-file problem via combine-file input
(.../avro/AvroKeyRecursiveCombineFileInputFormat.java). Compactable
datasets are found by time-range/threshold verifiers
(.../compaction/source/CompactionSource.java:99, compaction/verify/*).

Spark-first: one hash-agg dedup (max_by — single shuffle, map-side
partial aggregation) + a coalesced write with ``maxRecordsPerFile``, so
both problems (duplicates, file counts) are fixed by the same job. The
output is staged and atomically published over the input partition
(SNAPSHOT semantics), mirroring compaction's rename-into-place.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from incubator_gobblin_spark.formats.avro_ocf import resolve_format

from incubator_gobblin_spark.operators.dedup import dedup_argmax, dedup_exact
from incubator_gobblin_spark.sinks.files import FileSink, TableType, new_run_id


@dataclass
class CompactionResult:
    run_id: str
    input_rows: int
    output_rows: int
    duplicates_removed: int
    published_paths: list[str]


def compact(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    keys: Sequence[str] | None,
    delta: Sequence[str] = (),
    tie_breakers: Sequence[str] = (),
    fmt: str = "parquet",
    target_file_rows: int = 1_000_000,
    partition_by: Sequence[str] = (),
) -> CompactionResult:
    """Compact one dataset (typically one time partition of a table).

    ``keys=None`` -> full-record dedup (the reference's default when no
    primarykey-annotated fields exist); ``delta`` non-empty -> argmax
    dedup. ``target_file_rows`` drives the small-file rewrite.
    """
    # layout-preserving read: a partitioned compaction rewrite must
    # reproduce partition values byte-for-byte (see purge.py)
    from incubator_gobblin_spark.sources.files import read_layout_preserving

    df = read_layout_preserving(spark, input_path, fmt)
    input_rows = df.count()

    if delta:
        out = dedup_argmax(df, keys or df.columns, delta, tie_breakers)
    else:
        out = dedup_exact(df, keys)

    sink = FileSink(
        path=output_path,
        fmt=fmt,
        table_type=TableType.SNAPSHOT_ONLY,
        partition_by=list(partition_by),
        max_records_per_file=target_file_rows,
    )
    run_id = new_run_id()
    sink.write_staging(out, run_id)
    output_rows = spark.read.format(resolve_format(fmt)).load(sink.staging_dir(run_id)).count()
    published = sink.publish(run_id)
    return CompactionResult(
        run_id=run_id,
        input_rows=input_rows,
        output_rows=output_rows,
        duplicates_removed=input_rows - output_rows,
        published_paths=published,
    )
