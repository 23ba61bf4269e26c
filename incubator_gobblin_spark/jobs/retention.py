"""Retention job: version discovery + policy selection + delete.

Reference: gobblin-data-management retention — version finders list a
dataset's versions from the filesystem
(.../retention/version/finder/DateTimeDatasetVersionFinder.java:37,
GlobModTimeDatasetVersionFinder, UnixTimestampVersionFinder), policies
pick the deletable subset (NewestKRetentionPolicy.java:39,
TimeBasedRetentionPolicy.java:48, CombineRetentionPolicy), and the
cleaner deletes them.

Spark-first: the version listing IS a DataFrame
(dataset, version_path, version_ts, size_bytes) built driver-side from
file metadata (listing is metadata-bound, not data-bound — a driver
thread pool is the right tool, same as the reference's ParallelRunner);
policies are the retention operators; delete is the only side effect
and supports dry_run.
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from incubator_gobblin_spark.operators import retention as R


def find_versions_datetime(
    spark: SparkSession,
    root: str,
    pattern: str = r"(\d{4})/(\d{2})/(\d{2})",
) -> DataFrame:
    """DateTimeDatasetVersionFinder: datasets are ``root/<name>``, each
    version a date-layout subpath matching ``pattern``."""
    rows = []
    for dataset in sorted(os.listdir(root)):
        ds_root = os.path.join(root, dataset)
        if not os.path.isdir(ds_root):
            continue
        for dirpath, _dirs, files in os.walk(ds_root):
            rel = os.path.relpath(dirpath, ds_root)
            m = re.search(pattern, rel.replace(os.sep, "/"))
            if not m or not files:
                continue
            version_ts = datetime(*(int(g) for g in m.groups()))
            size = sum(
                os.path.getsize(os.path.join(dirpath, f_)) for f_ in files
            )
            rows.append((dataset, dirpath, version_ts, size))
    return spark.createDataFrame(
        rows, "dataset string, version_path string, version_ts timestamp, size_bytes long"
    )


def find_versions_glob_modtime(
    spark: SparkSession,
    root: str,
    glob_pattern: str = "*",
) -> DataFrame:
    """GlobModTimeDatasetVersionFinder (gobblin-data-management
    .../version/finder/GlobModTimeDatasetVersionFinder.java:37): versions
    are the glob matches under each dataset root, version timestamp =
    path MODIFICATION time (for layouts whose names carry no time)."""
    import glob as _glob

    rows = []
    for dataset in sorted(os.listdir(root)):
        ds_root = os.path.join(root, dataset)
        if not os.path.isdir(ds_root):
            continue
        for p in sorted(_glob.glob(os.path.join(ds_root, glob_pattern))):
            st = os.stat(p)
            version_ts = datetime.fromtimestamp(st.st_mtime)
            size = _tree_size(p)
            rows.append((dataset, p, version_ts, size))
    return spark.createDataFrame(
        rows, "dataset string, version_path string, version_ts timestamp, size_bytes long"
    )


def find_versions_watermark(
    spark: SparkSession,
    root: str,
    regex: str | None = None,
) -> DataFrame:
    """WatermarkDatasetVersionFinder (.../version/finder/
    WatermarkDatasetVersionFinder.java:55): versions are DIRECT
    subdirectories of each dataset dir; the watermark is the subdir name
    (or regex capture group 1), ordered by STRING sort — policies order
    on the ``watermark`` column. Non-matching candidates are skipped,
    mirroring the reference's warn-and-ignore."""
    pat = re.compile(regex) if regex else None
    rows = []
    for dataset in sorted(os.listdir(root)):
        ds_root = os.path.join(root, dataset)
        if not os.path.isdir(ds_root):
            continue
        for name in sorted(os.listdir(ds_root)):
            p = os.path.join(ds_root, name)
            if not os.path.isdir(p):
                continue
            if pat is not None:
                m = pat.search(name)
                if not m or not m.groups():
                    continue
                wm = m.group(1)
            else:
                wm = name
            rows.append((dataset, p, wm, _tree_size(p)))
    return spark.createDataFrame(
        rows, "dataset string, version_path string, watermark string, size_bytes long"
    )


def find_versions_unix_timestamp(
    spark: SparkSession,
    root: str,
    regex: str | None = None,
    unit: str = "ms",
) -> DataFrame:
    """UnixTimestampVersionFinder (.../version/finder/
    UnixTimestampVersionFinder.java:44): the watermark finder's string
    version parsed as a unix timestamp (reference feeds epoch MILLIS to
    joda DateTime; ``unit="s"`` for second-resolution layouts).
    Unparsable versions are skipped with a warning, as in the
    reference."""
    versions = find_versions_watermark(spark, root, regex).collect()
    div = 1000.0 if unit == "ms" else 1.0
    rows = []
    for r in versions:
        try:
            ts = datetime.fromtimestamp(int(r["watermark"]) / div)
        except (ValueError, OSError, OverflowError):
            continue
        rows.append((r["dataset"], r["version_path"], ts, r["size_bytes"]))
    return spark.createDataFrame(
        rows, "dataset string, version_path string, version_ts timestamp, size_bytes long"
    )


def _tree_size(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f_)) for f_ in files)
    return total


@dataclass
class RetentionResult:
    deleted: list[str]
    dry_run: bool


def apply_newest_k(
    versions: DataFrame, k: int, dry_run: bool = True
) -> RetentionResult:
    """Keep the newest K versions per dataset; delete the rest
    (NewestKRetentionPolicy.listDeletableVersions:83)."""
    deletable = R.newest_k(
        versions,
        group_by=["dataset"],
        version_col="version_ts",
        k=k,
        keep=False,
        tie_breakers=["version_path"],
    )
    return _delete(deletable, dry_run)


def apply_older_than(
    versions: DataFrame, cutoff, dry_run: bool = True
) -> RetentionResult:
    """TimeBasedRetentionPolicy: delete versions older than cutoff."""
    return _delete(R.older_than(versions, "version_ts", cutoff), dry_run)


def _delete(deletable: DataFrame, dry_run: bool) -> RetentionResult:
    # The deletable set is tiny relative to the data (it's a listing);
    # collecting paths to the driver for FS deletes is the correct
    # pattern — deletes are metadata ops, not data ops.
    paths = [r["version_path"] for r in deletable.select("version_path").collect()]
    if not dry_run:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
    return RetentionResult(deleted=paths, dry_run=dry_run)
