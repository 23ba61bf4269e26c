"""The lake maintenance JOB: policy pass + schedule wiring.

Reference parity: gobblin runs compaction (MRCompactor) and retention
(CleanableDatasetBase) as SCHEDULED jobs; maintain_lake_table is the
lake-native job body — format-detecting, idempotent, and composable
with ScheduleDriver's run-when-due loop.
"""

import os
import sys
from datetime import datetime

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.jobs.lake_maintenance import (  # noqa: E402
    maintain_lake_table,
)
from incubator_gobblin_spark.session import load_table  # noqa: E402
from incubator_gobblin_spark.sinks.delta_delete import (  # noqa: E402
    delete_delta_rows,
)
from incubator_gobblin_spark.sinks.delta_maintenance import (  # noqa: E402
    write_delta_table,
)
from incubator_gobblin_spark.sinks.iceberg_delete import (  # noqa: E402
    delete_iceberg_rows,
)
from incubator_gobblin_spark.sinks.iceberg_maintenance import (  # noqa: E402
    write_iceberg_table,
)
from incubator_gobblin_spark.sources.delta_import import read_delta  # noqa: E402
from incubator_gobblin_spark.sources.iceberg_import import (  # noqa: E402
    current_metadata,
    read_iceberg,
    snapshot_files,
)


def test_maintain_delta_converges_and_is_idempotent(
    spark, sf_dir, tmp_path
):
    root = str(tmp_path / "d")
    cust = load_table(spark, sf_dir, "customer").repartition(3)
    write_delta_table(spark, cust, root, coalesce_output=False)
    delete_delta_rows(spark, root, "c_custkey % 3 = 0")
    expect = cust.filter(~(F.col("c_custkey") % 3 == 0))

    rep = maintain_lake_table(
        spark, root, retention_hours=0, allow_short_retention=True
    )
    assert rep["format"] == "delta"
    assert rep["optimize"]["dvs_absorbed"] >= 1
    assert rep["vacuum"]["files_deleted"] >= 3
    got = read_delta(spark, root)
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0

    # second pass: converged, every stage no-ops
    rep2 = maintain_lake_table(
        spark, root, retention_hours=0, allow_short_retention=True
    )
    assert rep2["optimize"]["files_compacted"] == 0
    assert rep2["vacuum"]["files_deleted"] == 0


def test_maintain_iceberg_converges(spark, sf_dir, tmp_path):
    import time

    root = str(tmp_path / "i")
    cust = load_table(spark, sf_dir, "customer").repartition(3)
    write_iceberg_table(spark, cust, root, coalesce_output=False)
    delete_iceberg_rows(spark, root, "c_custkey % 4 = 2")
    expect = cust.filter(~(F.col("c_custkey") % 4 == 2))

    # age the tree so the orphan stage is retention-eligible
    for dp, _dd, fns in os.walk(root):
        for fn in fns:
            fp = os.path.join(dp, fn)
            old = time.time() - 7200
            try:
                os.utime(fp, (old, old))
            except OSError:
                pass

    rep = maintain_lake_table(
        spark,
        root,
        keep_snapshots=1,
        retention_hours=1,
        allow_short_retention=True,
    )
    assert rep["format"] == "iceberg"
    assert rep["rewrite"]["files_rewritten"] == 3
    assert rep["orphans"]["files_deleted"] >= 3
    meta = current_metadata(root)
    assert len(meta["snapshots"]) == 1  # expired to keep_snapshots
    _, dels = snapshot_files(meta, root, collect_deletes=True)
    assert not dels
    got = read_iceberg(spark, root)
    assert got.count() == expect.count()

    rep2 = maintain_lake_table(
        spark,
        root,
        keep_snapshots=1,
        retention_hours=1,
        allow_short_retention=True,
    )
    assert rep2["rewrite"]["files_rewritten"] == 0
    assert rep2["orphans"]["files_deleted"] == 0


def test_maintain_detects_and_refuses(spark, sf_dir, tmp_path):
    nat = load_table(spark, sf_dir, "nation")
    # neither format
    with pytest.raises(FileNotFoundError, match="neither"):
        maintain_lake_table(spark, str(tmp_path / "empty"))
    # both formats: ambiguous, refuse
    both = str(tmp_path / "both")
    write_delta_table(spark, nat, both)
    os.makedirs(os.path.join(both, "metadata"))
    with pytest.raises(ValueError, match="BOTH"):
        maintain_lake_table(spark, both)
    # dry run: no commit, no deletion — only the candidate listing
    solo = str(tmp_path / "solo")
    write_delta_table(spark, nat, solo)
    delete_delta_rows(spark, solo, "n_nationkey = 0")
    rep = maintain_lake_table(
        spark, solo, dry_run=True, retention_hours=0,
        allow_short_retention=True,
    )
    assert "optimize" not in rep
    assert rep["vacuum"]["files_deleted"] == 0
    live, _, _ = __import__(
        "incubator_gobblin_spark.sources.delta_import",
        fromlist=["_replay_state"],
    )._replay_state(os.path.join(solo, "_delta_log"), None)
    assert any(a.get("deletionVector") for a in live.values())


def test_maintenance_runs_on_schedule(spark, sf_dir, tmp_path):
    """The reference's shape: maintenance is a CRON JOB. Register the
    maintain body with ScheduleDriver; the run-when-due loop fires it
    and the table converges."""
    from incubator_gobblin_spark.jobs.schedule import ScheduleDriver

    root = str(tmp_path / "s")
    nat = load_table(spark, sf_dir, "nation")
    write_delta_table(spark, nat, root)
    delete_delta_rows(spark, root, "n_nationkey % 5 = 1")

    reports = []

    def runner(name, props):
        reports.append(
            maintain_lake_table(
                spark,
                props["lake.path"],
                retention_hours=0,
                allow_short_retention=True,
            )
        )

    drv = ScheduleDriver(runner)
    t0 = datetime(2026, 8, 16, 0, 0, 0)
    drv.register(
        "nightly-maintenance",
        {"job.schedule": "0 0 3 * * ?", "lake.path": root},
        t0,
    )
    fired = drv.tick(datetime(2026, 8, 16, 3, 0, 1))
    assert fired == ["nightly-maintenance"]
    assert reports and reports[0]["optimize"]["dvs_absorbed"] >= 1
    live, _, _ = __import__(
        "incubator_gobblin_spark.sources.delta_import",
        fromlist=["_replay_state"],
    )._replay_state(os.path.join(root, "_delta_log"), None)
    assert not any(a.get("deletionVector") for a in live.values())


def test_kafka_upsert_iceberg_exactly_once(spark, sf_dir, tmp_path):
    """Kafka -> Iceberg CDC upsert with the consumed watermark stored
    IN the table metadata: data + offsets commit atomically, replays
    plan zero records, updates win by key, and an all-filtered batch
    still advances the watermark."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from incubator_gobblin_spark.jobs.kafka_ingest import (
        ingest_kafka_upsert_iceberg,
    )
    from incubator_gobblin_spark.sources import mock_kafka as MK

    MK.register(spark)
    broker = str(tmp_path / "broker")
    table = str(tmp_path / "cdc")

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
        ]
    )

    def produce(rows):
        src = spark.createDataFrame(rows, "k long, v string").select(
            F.col("k").cast("string").alias("key"),
            F.to_json(F.struct("k", "v")).alias("value"),
        )
        (
            src.write.format("mockkafka")
            .mode("append")
            .option("path", broker)
            .option("topic", "cdc")
            .option("numPartitions", "2")
            .save()
        )

    def shape(df):
        return df.select("value.k", "value.v")

    # seed the table (CDC bootstrap)
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string"
    )
    write_iceberg_table(spark, base, table)

    kw = dict(
        on="k",
        value_schema=schema,
        transform=shape,
        reader_options={"path": broker},
    )
    # batch 1: updates for 0..4, inserts 100/101
    produce([(i, f"NEW{i}") for i in range(5)] + [(100, "a"), (101, "b")])
    r1 = ingest_kafka_upsert_iceberg(spark, "cdc", table, **kw)
    assert r1["published"] and r1["rows_upserted"] == 7
    got = {(r.k, r.v) for r in read_iceberg(spark, table).collect()}
    expect = {(i, f"NEW{i}") for i in range(5)} | {
        (i, f"v{i}") for i in range(5, 10)
    } | {(100, "a"), (101, "b")}
    assert got == expect

    # replay with no new data: plans ZERO records (watermark in table)
    r2 = ingest_kafka_upsert_iceberg(spark, "cdc", table, **kw)
    assert not r2["published"] and r2["records_planned"] == 0

    # batch 2: update one inserted key — the newer version wins
    produce([(100, "a2")])
    r3 = ingest_kafka_upsert_iceberg(spark, "cdc", table, **kw)
    assert r3["rows_upserted"] == 1
    got = {(r.k, r.v) for r in read_iceberg(spark, table).collect()}
    assert (100, "a2") in got and (100, "a") not in got
    assert len(got) == len(expect)

    # batch 3: rows exist but transform filters them all — the
    # watermark must STILL advance (properties-only version)
    produce([(999, "drop")])

    def drop_all(df):
        return shape(df).filter("k < 0")

    r4 = ingest_kafka_upsert_iceberg(
        spark, "cdc", table, on="k", value_schema=schema,
        transform=drop_all, reader_options={"path": broker},
    )
    assert r4["published"] and r4["rows_upserted"] == 0
    r5 = ingest_kafka_upsert_iceberg(spark, "cdc", table, **kw)
    assert r5["records_planned"] == 0  # 999 not replanned

    # the maintenance job absorbs the accumulated CDC deletes
    rep = maintain_lake_table(
        spark, table, keep_snapshots=1, retention_hours=168
    )
    assert rep["rewrite"]["delete_manifests_dropped"] >= 1
    got2 = {(r.k, r.v) for r in read_iceberg(spark, table).collect()}
    assert got2 == got


def test_kafka_upsert_watermark_never_regresses(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A concurrent same-topic run that advances the stored watermark
    through a properties-only commit (empty batch) must NOT be
    overwritten by a slower run that planned from the older state: the
    offsets property merges per-partition with max(stored, planned),
    so the next run never replays already-committed ranges."""
    import json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    import incubator_gobblin_spark.jobs.kafka_ingest as KI
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        set_iceberg_table_properties,
    )
    from incubator_gobblin_spark.sources import mock_kafka as MK
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
    )

    MK.register(spark)
    broker = str(tmp_path / "broker")
    table = str(tmp_path / "race")
    schema = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )

    def produce(rows):
        src = spark.createDataFrame(rows, "k long, v string").select(
            F.col("k").cast("string").alias("key"),
            F.to_json(F.struct("k", "v")).alias("value"),
        )
        (
            src.write.format("mockkafka")
            .mode("append")
            .option("path", broker)
            .option("topic", "race")
            .option("numPartitions", "1")
            .save()
        )

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k long, v string"
    )
    write_iceberg_table(spark, base, table)
    produce([(0, "NEW0"), (1, "NEW1")])

    # the racer: between this run's offset planning and its commit, a
    # faster run stores an ALREADY-ADVANCED watermark (properties-only
    # commit — current-snapshot-id unchanged, so the slow run's upsert
    # proceeds instead of aborting)
    racer_offsets = {"0": 3}
    real_read = KI.read_kafka_batch
    fired = []

    def read_then_race(*a, **kw):
        out = real_read(*a, **kw)
        if not fired:
            fired.append(1)
            set_iceberg_table_properties(
                table, {"kafka.offsets.race": json.dumps(racer_offsets)}
            )
        return out

    monkeypatch.setattr(KI, "read_kafka_batch", read_then_race)
    res = KI.ingest_kafka_upsert_iceberg(
        spark,
        "race",
        table,
        on="k",
        value_schema=schema,
        transform=lambda df: df.select("value.k", "value.v"),
        reader_options={"path": broker},
    )
    assert res["published"] and res["rows_upserted"] == 2

    stored = json.loads(
        current_metadata(table)["properties"]["kafka.offsets.race"]
    )
    # the slow run planned next=2 for partition 0; the racer stored 3;
    # the committed watermark is the per-partition max, not a regression
    assert stored == {"0": 3}

    # and the next run plans nothing below the merged watermark
    monkeypatch.setattr(KI, "read_kafka_batch", real_read)
    produce([(2, "NEW2")])  # offset 2 — below the racer's watermark of 3
    r2 = KI.ingest_kafka_upsert_iceberg(
        spark,
        "race",
        table,
        on="k",
        value_schema=schema,
        transform=lambda df: df.select("value.k", "value.v"),
        reader_options={"path": broker},
    )
    assert r2["records_planned"] == 0 and not r2["published"]
