"""End-to-end Pipeline tests: incremental watermark ingest across runs,
quality gates with error side-output, task-policy abort, fork."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.operators import converters as C
from incubator_gobblin_spark.operators.quality import (
    PolicyType,
    RowCountPolicy,
    RowPolicy,
    TaskPolicyError,
)
from incubator_gobblin_spark.pipeline import ForkBranch, Pipeline
from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sinks.files import FileSink, TableType
from incubator_gobblin_spark.state import StateStore


@pytest.fixture()
def store(tmp_path):
    return StateStore(str(tmp_path / "state"))


def _src(sf_dir):
    def _read(spark):
        return load_table(spark, sf_dir, "lineitem")

    return _read


def test_incremental_watermark_two_runs(spark, sf_dir, tmp_path, store):
    out = str(tmp_path / "out")
    total = load_table(spark, sf_dir, "lineitem").count()

    # run 1: bounded high watermark
    hi1 = F.lit("1997-01-01").cast("timestamp")
    p1 = (
        Pipeline(spark, "ingest")
        .source(_src(sf_dir))
        .watermark("l_shipdate", store, "lineitem", high=hi1)
        .sink(FileSink(path=out))
    )
    r1 = p1.run()
    expected1 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1997-01-01")
        .count()
    )
    assert r1.rows_written == expected1
    assert store.get("lineitem").high_watermark is not None

    # run 2: unbounded — picks up strictly after run 1's observed max
    p2 = (
        Pipeline(spark, "ingest")
        .source(_src(sf_dir))
        .watermark("l_shipdate", store, "lineitem")
        .sink(FileSink(path=out))
    )
    r2 = p2.run()
    assert r1.rows_written + r2.rows_written == total

    published = spark.read.parquet(out)
    assert published.count() == total
    # no row ingested twice: the two intervals partition the stream
    # (count parity + full-row distinct parity with the source)
    src = load_table(spark, sf_dir, "lineitem")
    assert published.distinct().count() == src.distinct().count()

    # run 3: empty increment keeps the committed watermark
    hwm_before = store.get("lineitem").high_watermark
    r3 = (
        Pipeline(spark, "ingest")
        .source(_src(sf_dir))
        .watermark("l_shipdate", store, "lineitem")
        .sink(FileSink(path=out))
        .run()
    )
    assert r3.rows_written == 0
    assert store.get("lineitem").high_watermark == hwm_before


def test_quality_err_file_side_output(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    src = load_table(spark, sf_dir, "events")
    n = src.count()
    ok = F.col("value") <= 150
    result = (
        Pipeline(spark, "q")
        .source_df(src)
        .quality(RowPolicy("value_cap", ok, PolicyType.ERR_FILE))
        .sink(FileSink(path=out))
        .run()
    )
    n_bad = src.filter(~ok).count()
    assert result.rows_written == n - n_bad
    assert result.error_path is not None
    errors = spark.read.parquet(result.error_path)
    assert errors.count() == n_bad
    assert "_failed_policies" in errors.columns
    assert errors.filter(
        F.array_contains("_failed_policies", "value_cap")
    ).count() == n_bad


def test_task_policy_abort_leaves_no_output(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    with pytest.raises(TaskPolicyError):
        (
            Pipeline(spark, "abort")
            .source_df(load_table(spark, sf_dir, "nation"))
            .task_policy(RowCountPolicy(expected=1))  # 25 rows -> fail
            .sink(FileSink(path=out))
            .run()
        )
    # nothing published, staging cleaned
    assert not os.path.exists(os.path.join(out, "_staging")) or not os.listdir(
        os.path.join(out, "_staging")
    )
    leftovers = [e for e in os.listdir(out)] if os.path.isdir(out) else []
    assert all(e.startswith("_") for e in leftovers)


def test_fork_two_branches(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    big = str(tmp_path / "big")
    small = str(tmp_path / "small")
    result = (
        Pipeline(spark, "forked")
        .source_df(src)
        .fork(
            ForkBranch(
                "big",
                FileSink(path=big),
                transforms=[C.filter_expr(F.col("o_totalprice") > 250000)],
            ),
            ForkBranch(
                "small",
                FileSink(path=small),
                transforms=[C.filter_expr(F.col("o_totalprice") <= 250000)],
            ),
        )
        .run()
    )
    n = src.count()
    assert result.branch_rows["big"] + result.branch_rows["small"] == n
    assert spark.read.parquet(big).count() == result.branch_rows["big"]
    assert spark.read.parquet(small).count() == result.branch_rows["small"]


def test_partitioned_append_and_snapshot(spark, sf_dir, tmp_path):
    out = str(tmp_path / "p")
    src = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.date_format("o_orderdate", "yyyy")
    )
    sink = FileSink(path=out, partition_by=["year"], table_type=TableType.SNAPSHOT_APPEND)
    Pipeline(spark, "p1").source_df(src.filter(F.col("year") == "1995")).sink(sink).run()
    Pipeline(spark, "p2").source_df(src.filter(F.col("year") == "1996")).sink(sink).run()
    df = spark.read.parquet(out)
    exp = src.filter(F.col("year").isin("1995", "1996")).count()
    assert df.count() == exp
    # dynamic partition overwrite: re-running 1995 replaces, not doubles
    Pipeline(spark, "p3").source_df(src.filter(F.col("year") == "1995")).sink(sink).run()
    assert spark.read.parquet(out).count() == exp


def test_multilevel_partition_publish_preserves_siblings(spark, tmp_path):
    """Regression: with multi-level partition_by, publish must operate on
    LEAF partition dirs — replacing at an intermediate level (year=) would
    silently delete sibling month partitions this run never touched."""
    out = str(tmp_path / "ml")
    df1 = spark.createDataFrame(
        [("1995", "01", 1), ("1995", "01", 2), ("1995", "02", 3), ("1996", "01", 4)],
        "year string, month string, v int",
    )
    sink = FileSink(
        path=out, partition_by=["year", "month"], table_type=TableType.SNAPSHOT_APPEND
    )
    Pipeline(spark, "ml1").source_df(df1).sink(sink).run()
    assert spark.read.parquet(out).count() == 4

    # run 2 touches ONLY 1995/01 — siblings 1995/02 and 1996/01 must survive
    df2 = spark.createDataFrame([("1995", "01", 9)], "year string, month string, v int")
    Pipeline(spark, "ml2").source_df(df2).sink(sink).run()
    got = spark.read.parquet(out)
    assert got.count() == 3  # 1995/01 replaced (2 rows -> 1), siblings intact
    # partition values read back with type inference (int)
    assert {(int(r["year"]), int(r["month"]), r["v"]) for r in got.collect()} == {
        (1995, 1, 9), (1995, 2, 3), (1996, 1, 4)
    }

    # APPEND_ONLY into an existing leaf dir: files append inside month=,
    # never renaming nested partition dirs into bogus file names
    asink = FileSink(
        path=out, partition_by=["year", "month"], table_type=TableType.APPEND_ONLY
    )
    df3 = spark.createDataFrame([("1995", "02", 7)], "year string, month string, v int")
    Pipeline(spark, "ml3").source_df(df3).sink(asink).run()
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert got.filter((F.col("year") == 1995) & (F.col("month") == 2)).count() == 2
    # layout is still a clean hive-style tree
    assert sorted(
        e for e in os.listdir(os.path.join(out, "year=1995")) if not e.startswith("_")
    ) == ["month=01", "month=02"]
