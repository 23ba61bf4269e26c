"""Streaming CDC replication into STANDALONE lake tables:
StreamPipeline.to_delta_merge (exactly-once via the Delta protocol's
txn/SetTransaction identifiers) and to_iceberg_upsert (exactly-once
via the epoch watermark riding the atomic metadata commit — the
jobs.kafka_ingest trick as a foreachBatch face).

The replay proof simulates a crash BETWEEN the table commit and the
stream checkpoint: wipe the checkpoint and re-run the same broker
data — the same epoch re-applies, the stored txn version / epoch
property is >= the epoch id, and the apply is a no-op (no duplicate
rows, no new table version).
"""

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.session import load_table  # noqa: E402
from incubator_gobblin_spark.sources import mock_kafka as MK  # noqa: E402
from incubator_gobblin_spark.streaming.flow import StreamPipeline  # noqa: E402

VALUE_SCHEMA = "k BIGINT, v STRING"


def _produce(spark, root, events):
    spark.createDataFrame(
        events, "key STRING, value STRING"
    ).write.format("mockkafka").mode("append").option("path", root).option(
        "topic", "cdc"
    ).option("numPartitions", "2").save()


def _pipe(spark, root):
    return (
        StreamPipeline(spark, "lake-cdc")
        .source_kafka(
            "cdc",
            fmt="mockkafka",
            options={"path": root},
            value_schema=VALUE_SCHEMA,
        )
        .convert(lambda df: df.select("offset", "value.*"))
        .convert(lambda df: df.select("offset", "k", "v"))
    )


def test_stream_to_standalone_delta_merge_exactly_once(spark, tmp_path):
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        last_txn_actions,
        read_delta,
    )

    MK.register(spark)
    broker = str(tmp_path / "broker")
    MK.create_topic(broker, "cdc", 2)
    table = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k long, v string"
    )
    write_delta_table(spark, base, table)
    log_dir = os.path.join(table, "_delta_log")

    def run_once():
        # the merge source must match the table schema exactly — drop
        # the ordering column after in-batch compaction
        q = _pipe(spark, broker).to_delta_merge(
            table, on=["k"], checkpoint=ckpt, order_col="offset",
            app_id="t-delta", once=True,
        )
        q.awaitTermination(120)

    _produce(spark, broker, [
        ("1", '{"k":1,"v":"old"}'),
        ("1", '{"k":1,"v":"new"}'),      # same-key newer event wins
        ("100", '{"k":100,"v":"ins"}'),
    ])
    run_once()
    got = {r.k: r.v for r in read_delta(spark, table).collect()}
    assert got[1] == "new" and got[100] == "ins" and len(got) == 7
    v_after = _log_versions(log_dir)[-1]
    assert last_txn_actions(log_dir)["t-delta"]["version"] == 0

    # crash-replay: same epoch re-applies — the txn guard no-ops it
    shutil.rmtree(ckpt)
    run_once()
    assert _log_versions(log_dir)[-1] == v_after
    got2 = {r.k: r.v for r in read_delta(spark, table).collect()}
    assert got2 == got

    # progress: the next epoch applies with the next txn version
    _produce(spark, broker, [("1", '{"k":1,"v":"v3"}')])
    run_once()
    got3 = {r.k: r.v for r in read_delta(spark, table).collect()}
    assert got3[1] == "v3" and len(got3) == 7
    assert last_txn_actions(log_dir)["t-delta"]["version"] == 1


def test_stream_to_standalone_iceberg_upsert_exactly_once(
    spark, tmp_path
):
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    MK.register(spark)
    broker = str(tmp_path / "broker")
    MK.create_topic(broker, "cdc", 2)
    table = str(tmp_path / "iceberg")
    ckpt = str(tmp_path / "ckpt")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k long, v string"
    )
    write_iceberg_table(spark, base, table)

    def run_once():
        q = _pipe(spark, broker).to_iceberg_upsert(
            table, on=["k"], checkpoint=ckpt, order_col="offset",
            app_id="t-ice", once=True,
        )
        q.awaitTermination(120)

    _produce(spark, broker, [
        ("2", '{"k":2,"v":"B"}'),
        ("200", '{"k":200,"v":"ins"}'),
    ])
    run_once()
    got = {r.k: r.v for r in read_iceberg(spark, table).collect()}
    assert got[2] == "B" and got[200] == "ins" and len(got) == 7
    meta = current_metadata(table)
    snap_after = meta["current-snapshot-id"]
    assert meta["properties"]["streaming.upsert.epoch.t-ice"] == "0"

    # crash-replay: same epoch, stored watermark >= epoch — no-op
    shutil.rmtree(ckpt)
    run_once()
    meta2 = current_metadata(table)
    assert meta2["current-snapshot-id"] == snap_after
    assert {r.k: r.v for r in read_iceberg(spark, table).collect()} == got

    # progress
    _produce(spark, broker, [("2", '{"k":2,"v":"C"}')])
    run_once()
    got3 = {r.k: r.v for r in read_iceberg(spark, table).collect()}
    assert got3[2] == "C" and len(got3) == 7
    assert (
        current_metadata(table)["properties"][
            "streaming.upsert.epoch.t-ice"
        ]
        == "1"
    )


def test_txn_actions_survive_checkpoint_and_expiry(spark, tmp_path):
    """The epoch watermark must survive checkpoint+expire: a Delta
    checkpoint that dropped txn actions would reset the idempotent
    writer and double-apply a replayed epoch after log expiry."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        checkpoint_delta_table,
        expire_delta_log,
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        last_txn_actions,
    )

    table = str(tmp_path / "txn")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k long, v string"
    )
    write_delta_table(spark, base, table)
    src = spark.createDataFrame([(1, "X")], "k long, v string")
    merge_delta_rows(spark, table, src, on="k", txn=("app-a", 7))
    log_dir = os.path.join(table, "_delta_log")
    assert last_txn_actions(log_dir)["app-a"]["version"] == 7

    checkpoint_delta_table(table)
    expire_delta_log(table)
    # the pre-checkpoint JSON carrying the txn is gone; the checkpoint
    # must still carry it
    assert not os.path.exists(os.path.join(log_dir, f"{0:020d}.json"))
    assert last_txn_actions(log_dir)["app-a"]["version"] == 7


def test_multipart_checkpoint_carries_dvs_and_txn(spark, sf_dir, tmp_path):
    """A MULTI-PART checkpoint must slice DV descriptors and txn
    actions across parts without losing either: replay from the parts
    alone must keep deleted rows dead and the idempotent-writer epoch
    watermark intact."""
    from incubator_gobblin_spark.sinks.delta_delete import (
        delete_delta_rows,
    )
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        checkpoint_delta_table,
        expire_delta_log,
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.session import load_table
    from incubator_gobblin_spark.sources.delta_import import (
        last_txn_actions,
        read_delta,
    )

    table = str(tmp_path / "mp")
    cust = load_table(spark, sf_dir, "customer").repartition(4)
    write_delta_table(spark, cust, table)
    delete_delta_rows(spark, table, "c_custkey % 3 = 1")  # DVs on files
    src = cust.filter("c_custkey % 3 = 2").limit(5).withColumn(
        "c_name", F.lit("X")
    )
    merge_delta_rows(spark, table, src, on="c_custkey", txn=("mp-app", 42))
    expect = read_delta(spark, table)
    n_expect = expect.count()

    # part_size=2: protocol/meta/adds/removes/txn rows straddle parts
    rep = checkpoint_delta_table(table, part_size=2)
    assert rep["adds"] >= 2
    expire_delta_log(table)
    log_dir = os.path.join(table, "_delta_log")
    import glob

    parts = glob.glob(os.path.join(log_dir, "*.checkpoint.*.parquet"))
    assert len(parts) > 2, "checkpoint must actually be multi-part"

    # replay now STARTS from the parts: rows identical, DVs applied
    got = read_delta(spark, table)
    assert got.count() == n_expect
    assert got.exceptAll(expect).count() == 0
    # and the txn watermark survived the checkpoint + expiry
    assert last_txn_actions(log_dir)["mp-app"]["version"] == 42


def test_continuous_delta_cdf_to_iceberg_replication(
    spark, sf_dir, tmp_path
):
    """The FULL continuous cross-format path: a CDF-enabled Delta
    source streams its change feed (source_delta read_change_feed)
    into a standalone Iceberg table (to_iceberg_upsert
    change_feed=True) — updates AND deletes replicate, each micro-batch
    is one atomic commit, and a crash-replay applies nothing twice."""
    from incubator_gobblin_spark.sinks.delta_delete import (
        delete_delta_rows,
    )
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.delta_import import read_delta
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    src = str(tmp_path / "src_delta")
    dst = str(tmp_path / "dst_iceberg")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    write_delta_table(
        spark, docs, src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    # destination starts EMPTY — version 0's derived inserts arrive
    # through the feed itself
    write_iceberg_table(spark, docs.limit(0), dst)

    def run_once():
        q = (
            StreamPipeline(spark, "cdf-repl")
            .source_delta(src, read_change_feed=True)
            .to_iceberg_upsert(
                dst, on=["doc_id"], checkpoint=ckpt,
                change_feed=True, app_id="repl", once=True,
            )
        )
        q.awaitTermination(180)

    run_once()
    assert _ice_rows(spark, dst, read_iceberg) == _delta_rows(
        spark, src, read_delta
    )

    # source moves: MERGE + DELETE; the next trigger replicates both
    updates = docs.filter("doc_id % 9 = 0").withColumn(
        "n_chars", F.col("n_chars") + 7
    )
    merge_delta_rows(spark, src, updates, on="doc_id")
    delete_delta_rows(spark, src, "doc_id % 10 = 5")
    run_once()
    assert _ice_rows(spark, dst, read_iceberg) == _delta_rows(
        spark, src, read_delta
    )

    # crash-replay: wipe the stream checkpoint and re-run the same
    # feed — the epoch watermark no-ops every replayed batch
    snap = current_metadata(dst)["current-snapshot-id"]
    shutil.rmtree(ckpt)
    run_once()
    assert current_metadata(dst)["current-snapshot-id"] == snap
    assert _ice_rows(spark, dst, read_iceberg) == _delta_rows(
        spark, src, read_delta
    )


def _ice_rows(spark, path, read_iceberg):
    return sorted(
        map(tuple, read_iceberg(spark, path).select(
            "doc_id", "lang", "n_chars").collect())
    )


def _delta_rows(spark, path, read_delta):
    return sorted(
        map(tuple, read_delta(spark, path).select(
            "doc_id", "lang", "n_chars").collect())
    )


def test_lakecdf_to_standalone_delta_replication(spark, tmp_path):
    """Manifest lake -> standalone Delta, continuously: the lake's
    change stream (lakecdf, insert/delete tagged, commits sequenced by
    _commit_ordinal) drives to_delta_merge(change_feed=True) — the
    collapse orders by the ordinal so multi-commit micro-batches net
    correctly."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.sources.delta_import import read_delta

    lake = str(tmp_path / "lake")
    dst = str(tmp_path / "dst_delta")
    ckpt = str(tmp_path / "ckpt")
    sink = FileSink(path=lake, commit_mode="manifest")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "k long, v string"
    )
    sink.write_staging(base, "r0")
    sink.publish("r0")
    write_delta_table(spark, base.limit(0), dst)  # empty destination

    def run_once():
        q = (
            StreamPipeline(spark, "lake-to-delta")
            .source_lake_cdf(lake)
            .to_delta_merge(
                dst, on=["k"], checkpoint=ckpt, change_feed=True,
                app_id="lake-repl", once=True,
            )
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(map(tuple, read_delta(spark, dst).collect())) == sorted(
        map(tuple, base.collect())
    )

    # the lake merges a CDC batch (update + delete + insert)
    src = spark.createDataFrame(
        [(1, "NEW", "upsert"), (3, None, "delete"), (99, "ins", "upsert")],
        "k long, v string, op string",
    )
    sink.merge_into(spark, src, on=["k"], run_id="r1", op_col="op")
    run_once()
    got = {r.k: r.v for r in read_delta(spark, dst).collect()}
    assert got[1] == "NEW" and 3 not in got and got[99] == "ins"
    assert len(got) == 8  # 8 - 1 delete + 1 insert


def test_lakecdf_multi_commit_batch_nets_cross_commit_delete(spark, tmp_path):
    """One micro-batch spanning SEVERAL lake commits must collapse to
    the net outcome ACROSS commits (r11 ADVICE medium): a key inserted
    in commit N and deleted in commit N+1 of the same batch must NOT
    survive — _commit_ordinal sequences the commits so the delete
    outranks the earlier insert. The reverse (delete then reinsert)
    must survive."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.sources.delta_import import read_delta

    lake = str(tmp_path / "lake")
    dst = str(tmp_path / "dst_delta")
    sink = FileSink(path=lake, commit_mode="manifest")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k long, v string"
    )
    sink.write_staging(base, "r0")
    sink.publish("r0")
    # commit r1: insert key 100; delete key 2
    sink.merge_into(
        spark,
        spark.createDataFrame(
            [(100, "born", "upsert"), (2, None, "delete")],
            "k long, v string, op string",
        ),
        on=["k"],
        run_id="r1",
        op_col="op",
    )
    # commit r2: delete key 100 (insert->delete across commits);
    # reinsert key 2 (delete->insert across commits)
    sink.merge_into(
        spark,
        spark.createDataFrame(
            [(100, None, "delete"), (2, "reborn", "upsert")],
            "k long, v string, op string",
        ),
        on=["k"],
        run_id="r2",
        op_col="op",
    )

    write_delta_table(spark, base.limit(0), dst)
    q = (
        StreamPipeline(spark, "lake-to-delta-multicommit")
        .source_lake_cdf(lake)
        .to_delta_merge(
            dst,
            on=["k"],
            checkpoint=str(tmp_path / "ckpt"),
            change_feed=True,
            app_id="lake-repl-mc",
            once=True,
        )
    )
    q.awaitTermination(120)
    got = {r.k: r.v for r in read_delta(spark, dst).collect()}
    assert 100 not in got, "insert-then-delete across commits must die"
    assert got[2] == "reborn", "delete-then-reinsert must survive"
    assert got == {0: "v0", 1: "v1", 2: "reborn", 3: "v3"}


def test_change_feed_without_order_column_is_refused(spark, tmp_path):
    """change_feed=True over a stream with no _commit_version /
    _commit_ordinal raises rather than collapsing unorderably."""
    import pytest

    from incubator_gobblin_spark.streaming.flow import (
        _change_feed_order_cols,
    )

    df = spark.createDataFrame(
        [(1, "a", "insert")], "k long, v string, _change_type string"
    )
    with pytest.raises(ValueError, match="commit-ordering column"):
        _change_feed_order_cols(df)
    assert _change_feed_order_cols(
        df.withColumn("_commit_ordinal", F.lit(0).cast("long"))
    ) == ["_commit_ordinal"]
