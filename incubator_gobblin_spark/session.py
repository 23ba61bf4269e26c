"""SparkSession factory with scale-aware defaults.

The session config is the engine's substitute for Gobblin's launcher
selection (reference: gobblin-runtime JobLauncherFactory): instead of
choosing thread-pool vs MapReduce execution, we configure one Spark
session and let the cluster manager own parallelism.

Defaults are tuned so the same code runs on ``local[N]`` for tests and
on a multi-executor cluster unchanged:

- AQE on (runtime coalescing, skew-join splitting) so a plan built at
  sf0.001 still behaves at 100 TB;
- shuffle partitions ~ cores locally; on a real cluster the AQE
  coalescer right-sizes post-shuffle partitions anyway;
- UTC session timezone (oracle comparisons and lake layouts are
  timezone-free);
- Arrow enabled for every pandas-interop path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "incubator_gobblin_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master=None`` defers to an existing session / spark-submit; tests
    pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Lake timestamps are timezone-free instants under the UTC
        # session: surface parquet TIMESTAMP(isAdjustedToUTC=false) as
        # TIMESTAMP (ltz) at the scan so date/watermark filters stay
        # pushable (a post-scan ntz->ltz cast would block pushdown).
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # Field-id column resolution is NOT a session default: the r11
        # same-host interleaved A/B measured the session-wide flag at
        # ~3% on plain parquet scans (it inserts the field-id matching
        # pass per file even when no read schema carries ids), the
        # bulk of the r10 shared-bench drift. The id-mode lake readers
        # (Delta column-mapping mode=id, Iceberg id-carrying files)
        # flip it on at their own read sites via ensure_field_id_read
        # — and leave it on, because Spark consults the conf when the
        # lazy scan executes. Sessions that never touch an id-mode
        # table never pay.
        # Write timestamps as INT64 micros, not legacy INT96: INT96
        # carries no row-group min/max, so footer-derived stats
        # (write_delta_table) and every foreign reader's file skipping
        # would silently lose timestamp bounds; micros is what modern
        # parquet writers (Spark 3.x+ recommended, Arrow, DuckDB) emit
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_field_id_read(spark: SparkSession) -> None:
    """Enable parquet field-id column resolution for lake scans.

    Called by every id-mode read site (Delta column-mapping mode=id,
    Iceberg imports) on first touch, and left on DELIBERATELY: the
    import functions return lazy DataFrames and Spark consults the
    conf when the scan executes, so a set/restore around DataFrame
    construction would silently break every deferred read. It is NOT
    a session default — the r11 interleaved A/B measured the flag at
    ~3% on plain parquet scans, so sessions that never read an
    id-mode table shouldn't pay; after the first id-mode read the
    session-wide cost is the unavoidable price of Spark's
    conf-at-execution semantics."""
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")


def rebalance_for_write(df, part_cols: list[str] | None = None):
    """Right-size a frame's partitioning for a file write (guide rule:
    output files in the 100 MB - 1 GB range, never one shard per
    shuffle partition).

    A frame arriving with N shuffle partitions writes N part files per
    hive partition value — a small CDC batch staged at the session's
    32 shuffle partitions becomes 32 tiny delete/data files whose read
    plans then pay one scan arm (or one task) per file. The REBALANCE
    hint lets AQE coalesce the write into advisory-size
    (``spark.sql.adaptive.advisoryPartitionSizeInBytes``) output
    partitions — and, keyed by the hive partition columns, clusters
    each partition value's rows together (Iceberg's
    ``write.distribution-mode=hash`` shape) while still SPLITTING a
    skewed value across tasks. Scale-adaptive by construction: a
    10-row batch becomes one file, a 10 TB table becomes
    advisory-sized files."""
    cols = [c for c in (part_cols or []) if c in df.columns]
    return df.hint("rebalance", *cols) if cols else df.hint("rebalance")


def table_path(sf_dir: str, name: str) -> str:
    """Path of one driver-generated parquet table."""
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the standard tables (region nation customer supplier
    part orders lineitem events documents embeddings). Tolerant of
    nanosecond-timestamp parquet (sources.files.read_parquet)."""
    from incubator_gobblin_spark.sources.files import read_parquet

    return read_parquet(spark, table_path(sf_dir, name))
