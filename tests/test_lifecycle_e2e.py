"""Whole-lake lifecycle, end to end on one dataset: incremental
watermarked ingest with a quality gate -> partitioned publish ->
late-duplicate delivery -> compaction -> time retention -> GDPR purge,
with the final lake state checked against an independently computed
expectation over the source table.

This is the integration path a Gobblin user actually lives
(AbstractJobLauncher ingest runs + the data-management job family:
gobblin-compaction, gobblin-data-management retention/.../purger) —
each stage is unit-tested elsewhere; here the handoffs are the test:
partition layouts produced by one stage must be consumable by the
next, and row accounting must close over the whole chain.
"""

import os

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.jobs import compaction, purge, retention
from incubator_gobblin_spark.operators.quality import PolicyType, RowPolicy
from incubator_gobblin_spark.pipeline import Pipeline
from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sinks.files import (
    FileSink,
    TableType,
    new_run_id,
    time_partition_tree,
)
from incubator_gobblin_spark.state import StateStore

VALUE_CAP = 300.0
SPLIT = "2024-01-15"
RETAIN_FROM = "2024-01-08"


def _with_partitions(df):
    for name, col in time_partition_tree("ts", granularity="day"):
        df = df.withColumn(name, col)
    return df


def test_full_lifecycle(spark, sf_dir, tmp_path):
    lake_root = str(tmp_path / "lake")
    lake = os.path.join(lake_root, "events")
    store = StateStore(str(tmp_path / "state"))
    src = load_table(spark, sf_dir, "events")
    part_cols = ["year", "month", "day"]

    def pipeline(high=None):
        p = (
            Pipeline(spark, "events_ingest")
            .source_df(src)
            .watermark("ts", store, "events", high=high)
            .convert(_with_partitions)
            .quality(
                RowPolicy("value_cap", F.col("value") <= VALUE_CAP, PolicyType.ERR_FILE)
            )
            .sink(
                FileSink(
                    path=lake,
                    table_type=TableType.APPEND_ONLY,
                    partition_by=part_cols,
                )
            )
        )
        return p

    # -- stage 1: two incremental ingest runs split by watermark --------
    r1 = pipeline(high=F.lit(SPLIT).cast("timestamp")).run()
    r2 = pipeline().run()
    ok = F.col("value") <= VALUE_CAP
    n_ok = src.filter(ok).count()
    assert r1.rows_written + r2.rows_written == n_ok
    assert r1.error_path is not None  # sf0.001 events has values > 300

    # -- stage 2: a late duplicate delivery of one day ------------------
    dup_day = src.filter(F.to_date("ts") == "2024-01-10").filter(ok)
    n_dup = dup_day.count()
    assert n_dup > 0
    dup_sink = FileSink(
        path=lake, table_type=TableType.APPEND_ONLY, partition_by=part_cols
    )
    rid = new_run_id()
    dup_sink.write_staging(_with_partitions(dup_day), rid)
    dup_sink.publish(rid)
    day_dir = os.path.join(lake, "year=2024", "month=01", "day=10")
    assert (
        spark.read.option("basePath", lake).parquet(day_dir).count() == 2 * n_dup
    )

    # -- stage 3: compaction dedups exactly the duplicated day ----------
    res = compaction.compact(
        spark, day_dir, day_dir, keys=None  # full-record dedup
    )
    assert res.duplicates_removed == n_dup
    assert spark.read.option("basePath", lake).parquet(day_dir).count() == n_dup

    # -- stage 4: time retention drops days before the cutoff -----------
    versions = retention.find_versions_datetime(
        spark, lake_root, pattern=r"year=(\d{4})/month=(\d{2})/day=(\d{2})"
    )
    n_days = versions.count()
    assert n_days == src.filter(ok).select(F.to_date("ts")).distinct().count()
    result = retention.apply_older_than(
        versions, F.lit(RETAIN_FROM).cast("timestamp"), dry_run=False
    )
    assert len(result.deleted) == 7  # Jan 1-7
    assert not os.path.exists(os.path.join(lake, "year=2024", "month=01", "day=01"))

    # -- stage 5: GDPR purge of two users across the remaining lake -----
    purge_ids = spark.createDataFrame([(1,), (7,)], "user_id long")
    pres = purge.purge(
        spark, lake, purge_ids, on="user_id", partition_by=part_cols
    )
    assert pres.rows_purged > 0

    # -- final accounting: lake == independent expectation over source --
    expected = (
        src.filter(ok)
        .filter(F.to_date("ts") >= RETAIN_FROM)
        .filter(~F.col("user_id").isin(1, 7))
    )
    final = spark.read.parquet(lake)
    assert final.count() == expected.count()
    # value-level equality, not just counts
    src_cols = [c for c in src.columns]
    assert (
        final.select(*src_cols)
        .exceptAll(expected.select(*src_cols))
        .count() == 0
    )
    assert (
        expected.select(*src_cols)
        .exceptAll(final.select(*src_cols))
        .count() == 0
    )


def test_incremental_curation_into_lake(spark, sf_dir, tmp_path):
    """Incremental curation: each arriving batch runs the curation
    chain, then lands in the lake keyed by content fingerprint with
    matched='ignore' — so cross-batch duplicate texts keep their FIRST
    lake copy and replays are no-ops. The lake ends with zero duplicate
    fingerprints even though the batches never saw each other."""
    from incubator_gobblin_spark.functions import text
    from incubator_gobblin_spark.jobs import curate as curate_job
    from incubator_gobblin_spark.sinks.files import FileSink

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    cand = docs.filter(F.col("doc_id") % 97 != 0)
    # batch 2 re-delivers half of batch 1's docs under NEW ids (late
    # duplicate crawl) plus genuinely new docs
    b1 = cand.filter(F.col("doc_id") % 2 == 0)
    redelivered = b1.filter(F.col("doc_id") % 4 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    b2 = cand.filter(F.col("doc_id") % 2 == 1).unionByName(redelivered)

    lake = FileSink(path=str(tmp_path / "lake"), commit_mode="manifest")
    for i, batch in enumerate((b1, b2)):
        curated = curate_job.curate(batch, bench).withColumn(
            "fp", text.fingerprint("text")
        )
        lake.merge_into(spark, curated, on=["fp"], run_id=f"b{i}", matched="ignore")

    out = lake.read_committed(spark)
    dup_fps = (
        out.groupBy("fp").count().filter(F.col("count") > 1).count()
    )
    assert dup_fps == 0
    # every redelivered duplicate kept its ORIGINAL (batch-1) id
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    assert out.count() > 0

    # replaying batch 2 (same run id) changes nothing
    curated2 = curate_job.curate(b2, bench).withColumn(
        "fp", text.fingerprint("text")
    )
    lake.merge_into(spark, curated2, on=["fp"], run_id="b1", matched="ignore")
    assert lake.read_committed(spark).count() == out.count()
