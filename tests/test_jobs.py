"""Lifecycle jobs: compaction dedup, retention deletion, GDPR purge,
dataset copy."""

from datetime import datetime

from pyspark.sql import functions as F

from incubator_gobblin_spark.jobs import compaction, copy, purge, retention
from incubator_gobblin_spark.session import load_table


def test_compaction_argmax_dedup(spark, sf_dir, tmp_path):
    src_path = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events")
    # inject duplicates: same key, older delta -> must lose
    dup = events.withColumn("ts", F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    events.unionByName(dup).write.parquet(src_path)

    res = compaction.compact(
        spark,
        src_path,
        out_path,
        keys=["event_id"],
        delta=["ts"],
        tie_breakers=["user_id"],
    )
    assert res.input_rows == 2 * events.count()
    assert res.output_rows == events.count()
    assert res.duplicates_removed == events.count()
    # winners are the newer copies
    out = spark.read.parquet(out_path)
    joined = out.alias("o").join(events.alias("e"), "event_id")
    assert joined.filter(F.col("o.ts") != F.col("e.ts")).count() == 0


def test_compaction_exact_dedup_small_files(spark, sf_dir, tmp_path):
    src_path = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    nation = load_table(spark, sf_dir, "nation")
    # 8 duplicate copies scattered across many small files
    nation.unionByName(nation).unionByName(nation).unionByName(nation).repartition(
        16
    ).write.parquet(src_path)
    res = compaction.compact(spark, src_path, out_path, keys=None)
    assert res.output_rows == 25
    assert res.duplicates_removed == res.input_rows - 25


def test_retention_newest_k_and_older_than(spark, tmp_path):
    root = tmp_path / "lake"
    for ds in ["a", "b"]:
        for day in ["2026/08/01", "2026/08/02", "2026/08/03", "2026/08/04"]:
            d = root / ds / day
            d.mkdir(parents=True)
            (d / "part-0.parquet").write_bytes(b"x" * 10)
    versions = retention.find_versions_datetime(spark, str(root))
    assert versions.count() == 8

    res = retention.apply_newest_k(versions, k=3, dry_run=True)
    assert len(res.deleted) == 2  # one per dataset
    assert all("2026/08/01" in p for p in res.deleted)

    res2 = retention.apply_older_than(
        versions, datetime(2026, 8, 3), dry_run=False
    )
    assert len(res2.deleted) == 4
    versions_after = retention.find_versions_datetime(spark, str(root))
    assert versions_after.count() == 4


def test_purge_partitioned(spark, sf_dir, tmp_path):
    data_path = str(tmp_path / "users")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.date_format("o_orderdate", "yyyy")
    )
    orders.write.partitionBy("year").parquet(data_path)
    n = orders.count()

    ids = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    n_purged_expected = (
        orders.join(ids, "o_custkey", "left_semi").count()
    )
    res = purge.purge(
        spark, data_path, ids, on="o_custkey", partition_by=["year"]
    )
    assert res.rows_purged == n_purged_expected
    after = spark.read.parquet(data_path)
    assert after.count() == n - n_purged_expected
    assert after.join(ids, "o_custkey", "left_semi").count() == 0
    # partition layout preserved
    assert after.select("year").distinct().count() == orders.select(
        "year"
    ).distinct().count()


def test_copy_incremental(spark, tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("bravo")

    r1 = copy.copy_dataset(spark, str(src), str(dst))
    assert r1.files_copied == 2
    assert (dst / "sub" / "b.txt").read_text() == "bravo"

    # unchanged -> nothing copied
    r2 = copy.copy_dataset(spark, str(src), str(dst))
    assert r2.files_copied == 0

    # changed file -> recopied
    (src / "a.txt").write_text("alpha-v2")
    r3 = copy.copy_dataset(spark, str(src), str(dst))
    assert r3.files_copied == 1
    assert (dst / "a.txt").read_text() == "alpha-v2"


def test_flow_dag_ordering_and_skip():
    from incubator_gobblin_spark.plans.flow import (
        FlowNode,
        NodeStatus,
        compile_order,
        run_flow,
    )

    ran = []
    nodes = [
        FlowNode("publish", lambda: ran.append("publish"), depends_on=["ingest"]),
        FlowNode("ingest", lambda: ran.append("ingest")),
        FlowNode("compact", lambda: ran.append("compact"), depends_on=["publish"]),
        FlowNode("unrelated", lambda: ran.append("unrelated")),
    ]
    order = compile_order(nodes)
    assert order.index("ingest") < order.index("publish") < order.index("compact")
    res = run_flow(nodes)
    assert res.succeeded and set(ran) == {"ingest", "publish", "compact", "unrelated"}

    # a failing node skips its descendants, unrelated branches still run
    def boom():
        raise RuntimeError("publish failed")

    nodes2 = [
        FlowNode("ingest", lambda: "ok"),
        FlowNode("publish", boom, depends_on=["ingest"]),
        FlowNode("compact", lambda: "never", depends_on=["publish"]),
        FlowNode("unrelated", lambda: "ok2"),
    ]
    res2 = run_flow(nodes2)
    assert res2.status["ingest"] is NodeStatus.SUCCEEDED
    assert res2.status["publish"] is NodeStatus.FAILED
    assert res2.status["compact"] is NodeStatus.SKIPPED
    assert res2.status["unrelated"] is NodeStatus.SUCCEEDED
    assert not res2.succeeded and "publish" in res2.errors

    # cycles and unknown deps are compile-time errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        compile_order([
            FlowNode("a", lambda: None, depends_on=["b"]),
            FlowNode("b", lambda: None, depends_on=["a"]),
        ])
    with _pytest.raises(ValueError, match="unknown"):
        compile_order([FlowNode("a", lambda: None, depends_on=["zzz"])])
