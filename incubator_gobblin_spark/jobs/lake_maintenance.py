"""Lake maintenance JOB: one policy-driven pass over a lake table.

Reference: in gobblin, compaction and retention are scheduled JOBS,
not ad-hoc API calls — ``MRCompactor`` plans one compaction job per
dataset/partition (gobblin-compaction
``.../mapreduce/MRCompactor.java``; selection policy
``CompactionSuiteBase``) and the retention cleaner runs per-dataset
version policies (gobblin-data-management
``.../retention/dataset/CleanableDatasetBase.java``). This module is
the lake-native equivalent: ``maintain_lake_table`` detects the
table's format (Delta ``_delta_log`` vs Iceberg ``metadata/``) and
runs the full converge-to-clean policy —

- Delta: ``compact_delta_files`` (absorb deletion vectors, bin-pack
  small files, one dataChange=false commit) then ``vacuum_delta``
  (retention-gated physical cleanup of tombstoned files + superseded
  bitmaps).
- Iceberg: ``rewrite_iceberg_data_files`` (absorb position/equality
  deletes, bin-pack), then ``expire_iceberg_snapshots`` (prune the
  metadata chain to ``keep_snapshots``), then
  ``remove_iceberg_orphan_files`` (free files no remaining snapshot
  references, retention-gated).

Idempotent by construction — every stage no-ops on a converged table
— so it composes with :class:`~incubator_gobblin_spark.jobs.schedule.
ScheduleDriver` exactly like the reference's Quartz-scheduled
compaction/retention flows: register ``maintain_lake_table`` as the
job body and let the run-when-due loop drive it.

Returns a report dict per stage; ``dry_run`` propagates to the
physical-cleanup stages (the rewrite stages never destroy — they
only add commits — so dry_run skips them entirely rather than
half-simulating)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def maintain_delta_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    retention_hours: float = 168.0,
    allow_short_retention: bool = False,
    dry_run: bool = False,
) -> dict:
    """One maintenance pass over a standalone Delta table: OPTIMIZE
    (DV absorption + bin-packing) then VACUUM. See module docstring."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        compact_delta_files,
        vacuum_delta,
    )

    report: dict = {"format": "delta"}
    if not dry_run:
        report["optimize"] = compact_delta_files(
            spark,
            path,
            target_file_bytes=target_file_bytes,
            small_file_bytes=small_file_bytes,
        )
    report["vacuum"] = vacuum_delta(
        path,
        retention_hours=retention_hours,
        allow_short_retention=allow_short_retention,
        dry_run=dry_run,
    )
    return report


def maintain_iceberg_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    keep_snapshots: int = 2,
    retention_hours: float = 168.0,
    allow_short_retention: bool = False,
    dry_run: bool = False,
) -> dict:
    """One maintenance pass over a standalone Iceberg table:
    RewriteDataFiles, ExpireSnapshots, RemoveOrphanFiles."""
    from incubator_gobblin_spark.sinks.iceberg_export import (
        expire_iceberg_snapshots,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        remove_iceberg_orphan_files,
        rewrite_iceberg_data_files,
    )

    report: dict = {"format": "iceberg"}
    if not dry_run:
        report["rewrite"] = rewrite_iceberg_data_files(
            spark,
            path,
            target_file_bytes=target_file_bytes,
            small_file_bytes=small_file_bytes,
        )
        expire_iceberg_snapshots(path, keep_last=keep_snapshots)
        report["expired_to"] = keep_snapshots
    report["orphans"] = remove_iceberg_orphan_files(
        path,
        retention_hours=retention_hours,
        allow_short_retention=allow_short_retention,
        dry_run=dry_run,
    )
    return report


def maintain_lake_table(spark: SparkSession, path: str, **kw) -> dict:
    """Format-detecting one-call maintenance (the job body to hand to
    ``ScheduleDriver``): Delta tables get OPTIMIZE+VACUUM, Iceberg
    tables get rewrite+expire+orphan-removal. Manifest-commit lakes
    refuse inside the underlying ops (their lifetime belongs to
    ``FileSink.compact_runs`` / ``FileSink.vacuum``)."""
    has_delta = os.path.isdir(os.path.join(path, "_delta_log"))
    has_iceberg = os.path.isdir(os.path.join(path, "metadata"))
    if has_delta and has_iceberg:
        raise ValueError(
            f"maintain_lake_table: {path} carries BOTH a Delta log and "
            "Iceberg metadata — maintain each surface explicitly "
            "(maintain_delta_table / maintain_iceberg_table)"
        )
    if has_delta:
        return maintain_delta_table(spark, path, **kw)
    if has_iceberg:
        return maintain_iceberg_table(spark, path, **kw)
    raise FileNotFoundError(
        f"maintain_lake_table: {path} carries neither a Delta log nor "
        "Iceberg metadata"
    )
