"""Streaming pipeline tests: file-drop micro-batch ingest, forked
branches, windowed aggregation with watermark, session windows. Driven
synchronously with availableNow triggers + processAllAvailable."""

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.operators import converters as C
from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.streaming.flow import (
    StreamBranch,
    StreamPipeline,
    session_windows,
    windowed_counts,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_src")
    load_table(spark, sf_dir, "events").write.parquet(path)
    return path


def _events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_stream_files_to_files(spark, sf_dir, tmp_path, events_dir):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = _events_schema(spark, events_dir)
    q = (
        StreamPipeline(spark, "s1")
        .source_files(events_dir, "parquet", schema, max_files_per_trigger=2)
        .convert(C.filter_expr(F.col("value") >= 0))
        .to_files(out, ckpt, once=True)
    )
    q.awaitTermination(120)
    n_expected = spark.read.parquet(events_dir).filter(F.col("value") >= 0).count()
    assert spark.read.parquet(out).count() == n_expected

    # restart with no new data: checkpoint prevents reprocessing
    q2 = (
        StreamPipeline(spark, "s1")
        .source_files(events_dir, "parquet", schema, max_files_per_trigger=2)
        .convert(C.filter_expr(F.col("value") >= 0))
        .to_files(out, ckpt, once=True)
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_expected


def test_stream_fork_branches(spark, tmp_path, events_dir):
    ckpt = str(tmp_path / "ckpt")
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    schema = _events_schema(spark, events_dir)

    q = (
        StreamPipeline(spark, "s2")
        .source_files(events_dir, "parquet", schema)
        .to_branches(
            [
                StreamBranch(
                    "purchases",
                    lambda df, _e: df.write.mode("append").parquet(out_a),
                    transforms=[C.filter_expr(F.col("event_type") == "purchase")],
                ),
                StreamBranch(
                    "errors",
                    lambda df, _e: df.write.mode("append").parquet(out_b),
                    transforms=[C.filter_expr(F.col("event_type") == "error")],
                ),
            ],
            checkpoint=ckpt,
            once=True,
        )
    )
    q.awaitTermination(120)
    src = spark.read.parquet(events_dir)
    assert (
        spark.read.parquet(out_a).count()
        == src.filter(F.col("event_type") == "purchase").count()
    )
    assert (
        spark.read.parquet(out_b).count()
        == src.filter(F.col("event_type") == "error").count()
    )


def test_windowed_counts_stream(spark, tmp_path, events_dir):
    schema = _events_schema(spark, events_dir)
    stream = (
        StreamPipeline(spark, "s3")
        .source_files(events_dir, "parquet", schema)
        .with_watermark("ts", "1 hour")
        .dataframe()
    )
    agg = windowed_counts(stream, "ts", "1 day", group_cols=["event_type"])
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; with a 1h delay
    # every window except the last day closes
    got = spark.sql("SELECT sum(n) AS total FROM win_out").first()["total"]
    src = spark.read.parquet(events_dir)
    last_day_start = src.select(
        F.date_trunc("day", F.max("ts")).alias("d")
    ).first()["d"]
    expected_min = src.filter(F.col("ts") < last_day_start).count() - src.filter(
        F.col("ts") >= F.lit(last_day_start) - F.expr("INTERVAL 1 HOUR")
    ).count()
    assert got is not None and got >= expected_min > 0


def test_session_windows_batch_parity(spark, events_dir):
    """session_window in batch mode vs the lag/gap sessionization count."""
    src = spark.read.parquet(events_dir)
    sw = session_windows(src, "ts", "30 minutes", group_cols=["user_id"])
    n_sessions_sw = sw.groupBy("user_id").count().withColumnRenamed("count", "n1")

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flag = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1
    ).otherwise(0)
    n_sessions_lag = (
        src.withColumn("ns", flag)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n2"))
    )
    diff = (
        n_sessions_sw.join(n_sessions_lag, "user_id")
        .filter(F.col("n1") != F.col("n2"))
        .count()
    )
    assert diff == 0


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state must carry across
    micro-batches (two files, one per trigger)."""
    import json
    from incubator_gobblin_spark.streaming.stateful import running_stats

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"k": k, "v": v}) for k, v in [("a", 1.0), ("a", 3.0), ("b", 10.0)])
    )
    (src / "b2.json").write_text(
        "\n".join(json.dumps({"k": k, "v": v}) for k, v in [("a", 5.0), ("b", 20.0)])
    )
    schema = "k string, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = running_stats(stream, "k", "v", ema_alpha=0.5)
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_stats_sink").collect()
    # final emission per key must include BOTH batches' contributions
    last = {}
    for r in rows:
        last[r["key"]] = max(last.get(r["key"], (0,)), (r["n"], r["total"]))
    assert last["a"] == (3, 9.0)
    assert last["b"] == (2, 30.0)


@pytest.mark.slow  # soak/sweep: run with -m slow, not in the default budget
def test_stateful_seen_keys_filter_dedups_across_batches(spark, tmp_path):
    import json
    from incubator_gobblin_spark.streaming.stateful import seen_keys_filter

    src = tmp_path / "src2"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"fp": fp, "doc": d}) for fp, d in [("x", "doc-x"), ("y", "doc-y")])
    )
    (src / "b2.json").write_text(
        "\n".join(json.dumps({"fp": fp, "doc": d}) for fp, d in [("x", "doc-x-dup"), ("z", "doc-z")])
    )
    stream = (
        spark.readStream.schema("fp string, doc string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = seen_keys_filter(stream, ["fp"], "doc")
    q = (
        out.writeStream.format("memory")
        .queryName("seen_keys_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT fp, doc FROM seen_keys_sink").collect()
    got = {r["fp"]: r["doc"] for r in rows}
    # x emitted once with its FIRST payload; the batch-2 dup dropped
    assert len(rows) == 3
    assert got == {"x": "doc-x", "y": "doc-y", "z": "doc-z"}


def test_dedup_stream_drops_duplicates_within_watermark(spark, tmp_path):
    """Streaming dedup keeps one record per key across micro-batches
    (state within the watermark horizon) and evicts old state."""
    from incubator_gobblin_spark.streaming.flow import dedup_stream

    src = tmp_path / "dds"
    src.mkdir()
    out = str(tmp_path / "dds_out")
    schema = "k long, ts timestamp, v string"

    def _write(rows, dest):
        (spark.createDataFrame(rows, "k long, ts string, v string")
         .select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
         .coalesce(1).write.parquet(dest))

    # batch 1: duplicate key 1 inside the file; batch 2: key 1 again
    _write([(1, "2024-01-01 00:00:00", "a"), (1, "2024-01-01 00:00:05", "b"),
            (2, "2024-01-01 00:00:10", "c")], str(src / "b1"))
    _write([(1, "2024-01-01 00:00:20", "d"), (3, "2024-01-01 00:00:30", "e")],
           str(src / "b2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dedup_stream(stream, ["k"], "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dds_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    # exactly one row per key: duplicates both in-batch and cross-batch dropped
    assert sorted(r["k"] for r in rows) == [1, 2, 3]


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream event-time join matches rows within the interval
    and carries watermarks on both sides (bounded state)."""
    from incubator_gobblin_spark.streaming.flow import stream_stream_interval_join

    lsrc, rsrc = tmp_path / "ssl", tmp_path / "ssr"
    lsrc.mkdir(); rsrc.mkdir()
    lschema = "uid long, lts timestamp, lval string"
    rschema = "uid long, rts timestamp, rval string"

    def _write(rows, raw_schema, ts_col, dest):
        cols = [c.split()[0] for c in raw_schema.split(", ")]
        (spark.createDataFrame(rows, raw_schema.replace("timestamp", "string"))
         .select(*[F.col(c).cast("timestamp").alias(c) if c == ts_col else F.col(c)
                   for c in cols])
         .coalesce(1).write.parquet(dest))

    _write([(1, "2024-01-01 00:00:00", "l1"), (2, "2024-01-01 01:00:00", "l2")],
           lschema, "lts", str(lsrc / "b1"))
    _write([(1, "2024-01-01 00:10:00", "r-in"),      # within 1h of l1
            (1, "2024-01-01 03:00:00", "r-late"),    # outside the interval
            (2, "2024-01-01 01:30:00", "r2-in")],
           rschema, "rts", str(rsrc / "b1"))

    left = spark.readStream.schema(lschema).parquet(str(lsrc / "*"))
    right = spark.readStream.schema(rschema).parquet(str(rsrc / "*"))
    joined = stream_stream_interval_join(
        left, right, on="uid", left_ts="lts", right_ts="rts",
        left_delay="1 minute", right_delay="1 minute",
        lower="interval 0 seconds", upper="interval 1 hour",
    ).select("_l.uid", "lval", "rval")
    out = str(tmp_path / "ss_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["uid"], r["rval"]) for r in spark.read.parquet(out).collect())
    assert got == [(1, "r-in"), (2, "r2-in")]


def test_stream_pipeline_kafka_source_exactly_once(spark, tmp_path):
    """The KafkaStreamingExtractor path through the ENGINE pipeline:
    StreamPipeline.source_kafka over the file-backed broker -> convert
    -> exactly-once file sink. A restart after new produces ingests
    only the delta (checkpointed per-partition offsets)."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sources import mock_kafka as MK

    MK.register(spark)
    root = str(tmp_path / "broker")
    MK.create_topic(root, "t1", 2)

    def produce(n, prefix):
        (
            spark.range(n)
            .select(
                F.concat(F.lit(prefix), F.col("id")).cast("string").alias("key"),
                F.to_json(F.struct("id")).alias("value"),
            )
            .write.format("mockkafka")
            .mode("append")
            .option("path", root)
            .option("topic", "t1")
            .option("numPartitions", "2")
            .save()
        )

    produce(15, "a")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            StreamPipeline(spark, "kafka-ingest")
            .source_kafka("t1", fmt="mockkafka",
                          options={"path": root},
                          value_schema="id BIGINT")
            .convert(lambda df: df.select(
                "partition", "offset", F.col("value.id").alias("id")))
            .to_files(out, ckpt, once=True)
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 15
    produce(6, "b")
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 21  # 15 + 6, no reprocess
    assert got.select("partition", "offset").distinct().count() == 21


def test_stream_pipeline_to_merge_cdc_apply(spark, tmp_path):
    """Streaming CDC apply into the manifest lake: micro-batches of
    upsert/delete events merge per epoch (in-batch compaction keeps the
    latest event per key); a restarted stream replaying a committed
    epoch is a no-op, and final lake state equals the last event per
    key."""
    import os

    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sinks.files import FileSink

    lake = str(tmp_path / "lake")
    sink = FileSink(path=lake, commit_mode="manifest")
    base = spark.createDataFrame(
        [(i, float(i), 0) for i in range(20)], "k BIGINT, v DOUBLE, seq BIGINT"
    ).drop("seq")
    sink.write_staging(base, "base")
    sink.publish("base")

    cdc_dir = str(tmp_path / "cdc")
    os.makedirs(cdc_dir)
    ckpt = str(tmp_path / "ckpt")
    # batch 1: two events for key 1 (older then newer), delete key 2,
    # insert key 100
    spark.createDataFrame(
        [
            (1, 111.0, 1, "upsert"),
            (1, 222.0, 2, "upsert"),
            (2, 0.0, 3, "delete"),
            (100, 100.0, 4, "upsert"),
        ],
        "k BIGINT, v DOUBLE, seq BIGINT, op STRING",
    ).coalesce(1).write.mode("append").parquet(cdc_dir)

    def run_once():
        q = (
            StreamPipeline(spark, "cdc")
            .source_files(
                cdc_dir, "parquet",
                "k BIGINT, v DOUBLE, seq BIGINT, op STRING",
            )
            .to_merge(
                sink, on=["k"], checkpoint=ckpt, op_col="op",
                order_col="seq", once=True,
            )
        )
        q.awaitTermination(120)

    run_once()
    got = {r.k: r.v for r in sink.read_committed(spark).drop("seq").collect()}
    assert len(got) == 20  # 20 - 1 deleted + 1 inserted
    assert got[1] == 222.0 and 2 not in got and got[100] == 100.0

    # restart with no new data: no-op (offsets checkpointed)
    run_once()
    assert {
        r.k: r.v for r in sink.read_committed(spark).drop("seq").collect()
    } == got

    # batch 2 arrives; only it is applied
    spark.createDataFrame(
        [(3, 333.0, 5, "upsert")],
        "k BIGINT, v DOUBLE, seq BIGINT, op STRING",
    ).coalesce(1).write.mode("append").parquet(cdc_dir)
    run_once()
    got2 = {r.k: r.v for r in sink.read_committed(spark).drop("seq").collect()}
    assert got2[3] == 333.0 and len(got2) == 20


def test_kafka_cdc_stream_to_lake_merge(spark, tmp_path):
    """The full streaming CDC path: keyed events produced to the broker
    -> source_kafka -> decode -> to_merge into the manifest lake with
    offset-ordered in-batch compaction. Restart ingests only new
    events; lake state equals last-event-per-key."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.sources import mock_kafka as MK

    MK.register(spark)
    root = str(tmp_path / "broker")
    MK.create_topic(root, "cdc", 2)
    lake = str(tmp_path / "lake")
    sink = FileSink(path=lake, commit_mode="manifest")
    sink.write_staging(
        spark.createDataFrame(
            [(i, "base", None) for i in range(10)],
            "k BIGINT, payload STRING, op STRING",
        ).drop("op"),
        "base",
    )
    sink.publish("base")
    ckpt = str(tmp_path / "ckpt")

    def produce(events):
        spark.createDataFrame(
            events, "key STRING, value STRING"
        ).write.format("mockkafka").mode("append").option("path", root).option(
            "topic", "cdc"
        ).option("numPartitions", "2").save()

    def run_once():
        q = (
            StreamPipeline(spark, "cdc-merge")
            .source_kafka(
                "cdc", fmt="mockkafka", options={"path": root},
                value_schema="k BIGINT, payload STRING, op STRING",
            )
            .convert(lambda df: df.select("offset", "value.*"))
            .to_merge(
                sink, on=["k"], checkpoint=ckpt, op_col="op",
                order_col="offset", once=True,
            )
        )
        q.awaitTermination(120)

    produce([
        ("1", '{"k":1,"payload":"old","op":"upsert"}'),
        ("1", '{"k":1,"payload":"new","op":"upsert"}'),
        ("3", '{"k":3,"payload":"x","op":"delete"}'),
        ("42", '{"k":42,"payload":"ins","op":"upsert"}'),
    ])
    run_once()
    got = {r.k: r.payload for r in sink.read_committed(spark).collect()}
    assert len(got) == 10  # 10 - 1 delete + 1 insert
    assert got[1] == "new" and 3 not in got and got[42] == "ins"

    run_once()  # nothing new: no-op
    produce([("5", '{"k":5,"payload":"v2","op":"upsert"}')])
    run_once()
    got2 = {r.k: r.payload for r in sink.read_committed(spark).collect()}
    assert got2[5] == "v2" and len(got2) == 10


def test_lakecdf_streaming_source_tails_commits(spark, tmp_path):
    """readStream.format("lakecdf") tails the manifest commit log:
    batch 1 delivers history-from-the-beginning (base inserts + the
    merge's exact materialized changes), a restart from the checkpoint
    delivers ONLY the commits that landed in between (no reprocess),
    and an up-to-date restart delivers nothing."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources import lake_cdf

    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    sink = FileSink(
        path=lake,
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
        cdf_materialize=True,
    )
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "k INT, v STRING"
    )
    sink.write_staging(base.repartition(2), "r1")
    sink.publish("r1")
    cdc = spark.createDataFrame(
        [(2, "v2-new", None), (9, "v9", None), (4, None, "delete")],
        "k INT, v STRING, op STRING",
    )
    sink.merge_into(spark, cdc, on=["k"], run_id="m1", op_col="op")

    lake_cdf.register(spark)

    def run_once():
        q = (
            spark.readStream.format("lakecdf")
            .option("path", lake)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {
        (r.k, r.v, r._change_type) for r in spark.read.parquet(out).collect()
    }
    expected = {(i, f"v{i}", "insert") for i in range(6)} | {
        (2, "v2", "delete"),
        (2, "v2-new", "insert"),
        (4, "v4", "delete"),
        (9, "v9", "insert"),
    }
    assert got == expected

    # a commit between restarts: only ITS changes arrive
    cdc2 = spark.createDataFrame([(0, "v0-x", None)], "k INT, v STRING, op STRING")
    sink.merge_into(spark, cdc2, on=["k"], run_id="m2", op_col="op")
    run_once()
    got2 = {
        (r.k, r.v, r._change_type) for r in spark.read.parquet(out).collect()
    }
    assert got2 - got == {(0, "v0", "delete"), (0, "v0-x", "insert")}

    # up-to-date restart: no new rows
    run_once()
    assert (
        len(spark.read.parquet(out).collect()) == len(got2)
    ), "an up-to-date restart must deliver nothing"


def test_lakecdf_streams_append_commits_without_materialization(spark, tmp_path):
    """Append commits need no _changes sidecar: their new files stream
    as inserts directly from the manifest diff."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources import lake_cdf

    lake = str(tmp_path / "lake")
    sink = FileSink(
        path=lake, table_type=TableType.APPEND_ONLY, commit_mode="manifest"
    )
    sink.write_staging(
        spark.createDataFrame([(1, "a")], "k INT, v STRING"), "r1"
    )
    sink.publish("r1")
    sink.write_staging(
        spark.createDataFrame([(2, "b")], "k INT, v STRING"), "r2"
    )
    sink.publish("r2")

    lake_cdf.register(spark)
    q = (
        spark.readStream.format("lakecdf")
        .option("path", lake)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.k, r.v, r._change_type, r._commit_ordinal)
        for r in spark.sql("SELECT * FROM cdf_append").collect()
    }
    # _commit_ordinal sequences the commits WITHIN the batch (oldest
    # first) — the ordering column the net-outcome collapse needs
    assert rows == {(1, "a", "insert", 0), (2, "b", "insert", 1)}


def test_lake_replication_via_cdf_stream(spark, tmp_path):
    """Continuous lake replication: source lake A's CDF stream feeds a
    streaming MERGE into lake B — after each availableNow pass, B's
    snapshot equals A's. Updates ride as delete+insert pairs; a
    synthetic seq (insert > delete) lets the in-batch compaction keep
    the insert for updated keys."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType

    a = FileSink(
        path=str(tmp_path / "lakeA"),
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
        cdf_materialize=True,
    )
    b = FileSink(path=str(tmp_path / "lakeB"), commit_mode="manifest")
    ckpt = str(tmp_path / "ckpt")

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k INT, v STRING"
    )
    a.write_staging(base.repartition(2), "r1")
    a.publish("r1")

    def replicate():
        q = (
            StreamPipeline(spark, "repl")
            .source_lake_cdf(str(tmp_path / "lakeA"))
            .convert(
                lambda df: df.withColumn(
                    "seq",
                    F.when(F.col("_change_type") == "insert", 1).otherwise(0),
                ).withColumn(
                    "op",
                    F.when(
                        F.col("_change_type") == "delete", "delete"
                    ).otherwise(None),
                ).drop("_change_type", "_commit_ordinal")
            )
            .to_merge(
                b, on=["k"], checkpoint=ckpt, op_col="op",
                order_col="seq", once=True,
            )
        )
        q.awaitTermination(120)

    def snapshots_equal():
        sa = {(r.k, r.v) for r in a.read_committed(spark).collect()}
        sb = {(r.k, r.v) for r in b.read_committed(spark).select("k", "v").collect()}
        return sa == sb

    replicate()
    assert snapshots_equal()

    cdc = spark.createDataFrame(
        [(3, "v3-new", None), (42, "v42", None), (7, None, "delete")],
        "k INT, v STRING, op STRING",
    )
    a.merge_into(spark, cdc, on=["k"], run_id="m1", op_col="op")
    replicate()
    assert snapshots_equal()
    # replaying with nothing new is a no-op
    replicate()
    assert snapshots_equal()


def test_stream_to_egress_delivers_batches(spark, tmp_path, events_dir):
    """Streaming bulk egress: micro-batches drain through write_egress
    into the bulk-endpoint double; a checkpointed restart with no new
    data re-sends nothing (no duplicate delivery without a replayed
    epoch)."""
    from incubator_gobblin_spark.sinks.egress import (
        EgressConfig,
        FileBackedBulkEndpoint,
    )

    ckpt = str(tmp_path / "ckpt")
    ep = FileBackedBulkEndpoint(str(tmp_path / "ep"))
    schema = _events_schema(spark, events_dir)
    q = (
        StreamPipeline(spark, "egress")
        .source_files(events_dir, "parquet", schema, max_files_per_trigger=2)
        .to_egress(ep, EgressConfig(batch_size=100), checkpoint=ckpt, once=True)
    )
    q.awaitTermination(120)
    want = spark.read.parquet(events_dir).count()
    got = ep.delivered()
    assert len(got) == want
    ids = {r["event_id"] for r in got}
    assert len(ids) == want

    # restart on the same checkpoint, no new data -> nothing re-sent
    q2 = (
        StreamPipeline(spark, "egress")
        .source_files(events_dir, "parquet", schema, max_files_per_trigger=2)
        .to_egress(ep, EgressConfig(batch_size=100), checkpoint=ckpt, once=True)
    )
    q2.awaitTermination(120)
    assert len(ep.delivered()) == want


def test_reststream_source_tails_watermark(spark, tmp_path):
    """readStream.format("reststream") tails a REST resource by
    watermark: batch 1 delivers everything up to the source max, a
    restart from the checkpoint delivers ONLY rows past the committed
    watermark (no reprocess, no gap), an up-to-date restart delivers
    nothing; timestamp columns survive the JSON hop typed."""
    import pandas as pd

    src_path = str(tmp_path / "accounts.parquet")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_source(n):
        pd.DataFrame(
            {
                "id": range(1, n + 1),
                "name": [f"acct-{i}" for i in range(1, n + 1)],
                "created": pd.to_datetime(
                    [f"2024-01-{i:02d}" for i in range(1, n + 1)]
                ),
            }
        ).to_parquet(src_path)

    write_source(10)

    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    def run_once():
        df = (
            StreamPipeline(spark)
            .source_rest(
                src_path,
                resource="accounts",
                wm_column="id",
                ddl="id long, name string, created timestamp",
                page_size=3,  # forces paging inside each workunit
                num_partitions=2,
            )
            ._source(spark)
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out).collect()
    assert {r["id"] for r in got} == set(range(1, 11))
    assert all(r["created"].year == 2024 for r in got)  # typed timestamps

    # rows land at the source between runs: only the delta arrives
    write_source(16)
    run_once()
    got2 = spark.read.parquet(out).collect()
    assert {r["id"] for r in got2} == set(range(1, 17))
    assert len(got2) == 16  # no reprocess of 1..10

    # up-to-date restart: nothing new
    run_once()
    assert len(spark.read.parquet(out).collect()) == 16


def test_reststream_to_manifest_lake_composition(spark, tmp_path):
    """The new-source/exactly-once-sink composition: a REST resource
    tails into a manifest lake via to_manifest (epoch-keyed publish);
    a second run after source growth appends ONLY the delta, and the
    lake's batch read surface sees every record exactly once."""
    import pandas as pd

    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    src_path = str(tmp_path / "orders.parquet")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    def write_source(n):
        pd.DataFrame(
            {"oid": range(1, n + 1), "amount": [float(i) for i in range(1, n + 1)]}
        ).to_parquet(src_path)

    sink = FileSink(path=lake, table_type=TableType.APPEND_ONLY, commit_mode="manifest")

    def run_once():
        q = (
            StreamPipeline(spark, "rest-ingest")
            .source_rest(
                src_path,
                resource="orders",
                wm_column="oid",
                ddl="oid long, amount double",
                page_size=4,
                num_partitions=2,
            )
            .to_manifest(sink, checkpoint=ckpt, once=True)
        )
        q.awaitTermination(120)

    write_source(7)
    run_once()
    got1 = {r["oid"] for r in sink.read_committed(spark).collect()}
    assert got1 == set(range(1, 8))

    write_source(12)
    run_once()
    rows = sink.read_committed(spark).collect()
    assert {r["oid"] for r in rows} == set(range(1, 13))
    assert len(rows) == 12  # exactly once: no replay of 1..7


def test_stream_fuzzy_ingest_dedups_across_epochs(spark, tmp_path):
    """Streaming near-dup admission: docs arriving in a LATER
    micro-batch that near-duplicate docs committed by an EARLIER one
    are dropped at the door; originals and fresh docs land exactly
    once."""
    import json

    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a long familiar tune about rivers and mountains"
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 1, "text": base},
                {"doc_id": 2, "text": "totally different material " * 6},
            ]
        )
    )
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 10, "text": base + " coda"},   # near-dup of 1
                {"doc_id": 11, "text": "fresh new words " * 7},
            ]
        )
    )
    corpus = FileSink(
        path=str(tmp_path / "corpus"),
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
    )
    index = FileSink(
        path=str(tmp_path / "index"),
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
    )

    def _read(s):
        return (
            s.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )

    pipe = StreamPipeline(spark, "fuzzy-stream")
    pipe.source(_read)
    q = pipe.to_fuzzy_ingest(
        corpus, index, checkpoint=str(tmp_path / "ckpt"), once=True
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in corpus.read_committed(spark).collect()}
    assert got == {1, 2, 11}  # 10 dropped as a near-dup of committed 1


def test_reststream_to_fuzzy_ingest_composition(spark, tmp_path):
    """REST stream -> near-dup-dedup'd corpus lake: documents arriving
    through the paged REST source land in the corpus only if nothing
    near-duplicating them was committed by an earlier run — the full
    'continuously ingest an API into a clean training corpus' chain."""
    import pandas as pd

    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a long familiar tune about rivers and mountains"
    )
    src_path = str(tmp_path / "posts.parquet")
    corpus = FileSink(
        path=str(tmp_path / "corpus"),
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
    )
    index = FileSink(
        path=str(tmp_path / "index"),
        table_type=TableType.APPEND_ONLY,
        commit_mode="manifest",
    )

    def run_once():
        q = (
            StreamPipeline(spark, "rest-fuzzy")
            .source_rest(
                src_path,
                resource="posts",
                wm_column="doc_id",
                ddl="doc_id long, text string",
                page_size=2,
                num_partitions=1,
            )
            .to_fuzzy_ingest(
                corpus, index, checkpoint=str(tmp_path / "ckpt"), once=True
            )
        )
        q.awaitTermination(180)

    pd.DataFrame(
        {"doc_id": [1, 2], "text": [base, "some other subject " * 6]}
    ).to_parquet(src_path)
    run_once()
    # the API gains rows: one near-dup of committed doc 1, one fresh
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, "some other subject " * 6,
                     base + " tail", "genuinely new story " * 6],
        }
    ).to_parquet(src_path)
    run_once()
    got = {r["doc_id"] for r in corpus.read_committed(spark).collect()}
    assert got == {1, 2, 4}  # 3 dropped as near-dup; 1/2 not reprocessed


def test_stateful_funnel_tracker_across_batches(spark, tmp_path):
    """Streaming funnel: per-user step progress must carry across
    micro-batches with first-match anchoring and the step window
    enforced against the carried anchor."""
    import json
    from incubator_gobblin_spark.streaming.stateful import funnel_tracker

    src = tmp_path / "funnel_src"
    src.mkdir()
    # batch 1: u1 views (t=0) and clicks (t=10); u2 clicks before viewing
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:00", "event_type": "view"},
                {"user_id": 1, "ts": "2024-01-01T00:00:10", "event_type": "click"},
                {"user_id": 2, "ts": "2024-01-01T00:00:00", "event_type": "click"},
                {"user_id": 2, "ts": "2024-01-01T00:00:05", "event_type": "view"},
            ]
        )
    )
    # batch 2: u1 purchases in-window; u2 clicks in-window of its view;
    # u3 appears and only views; a stale pre-anchor click for u1 is a no-op
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"user_id": 1, "ts": "2024-01-01T00:00:50", "event_type": "purchase"},
                {"user_id": 1, "ts": "2024-01-01T00:00:05", "event_type": "click"},
                {"user_id": 2, "ts": "2024-01-01T00:00:30", "event_type": "click"},
                {"user_id": 3, "ts": "2024-01-01T00:01:00", "event_type": "view"},
            ]
        )
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = funnel_tracker(
        stream, ["view", "click", "purchase"], within_seconds=60
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "funnel_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_sink ORDER BY user, step_idx").collect()
    got = [(r["user"], r["step_idx"], r["step"]) for r in rows]
    assert got == [
        ("1", 1, "view"), ("1", 2, "click"), ("1", 3, "purchase"),
        ("2", 1, "view"), ("2", 2, "click"),
        ("3", 1, "view"),
    ]


def test_reststream_funnel_composition(spark, tmp_path):
    """Composition: the streaming REST source feeds the stateful funnel
    tracker; a restart from the checkpoint ingests ONLY the delta and
    the carried per-user state lets run-2 events complete funnels that
    STARTED in run 1."""
    import pandas as pd

    from incubator_gobblin_spark.streaming.flow import StreamPipeline
    from incubator_gobblin_spark.streaming.stateful import funnel_tracker

    src_path = str(tmp_path / "events_api.parquet")
    ckpt = str(tmp_path / "funnel_rest_ckpt")
    out = str(tmp_path / "funnel_rest_out")

    def write_source(rows):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
            }
        ).to_parquet(src_path)

    batch1 = [
        (1, "2024-01-01T00:00:00", 1, "view"),
        (2, "2024-01-01T00:00:10", 1, "click"),
        (3, "2024-01-01T00:00:20", 2, "view"),
    ]
    write_source(batch1)

    def run_once():
        df = (
            StreamPipeline(spark)
            .source_rest(
                src_path,
                resource="events",
                wm_column="event_id",
                ddl="event_id long, ts timestamp, user_id long, event_type string",
                page_size=2,
                num_partitions=1,
            )
            ._source(spark)
        )
        q = (
            funnel_tracker(
                df, ["view", "click", "purchase"], within_seconds=120,
                output_mode="append",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = {(r["user"], r["step_idx"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("1", 1), ("1", 2), ("2", 1)}

    # delta lands at the API between runs: u1 purchases (completing a
    # funnel STARTED in run 1 — needs carried state), u2 clicks
    write_source(
        batch1
        + [
            (4, "2024-01-01T00:01:00", 1, "purchase"),
            (5, "2024-01-01T00:01:10", 2, "click"),
        ]
    )
    run_once()
    got2 = {(r["user"], r["step_idx"]) for r in spark.read.parquet(out).collect()}
    assert got2 == got1 | {("1", 3), ("2", 2)}


def test_deltastream_tails_external_delta_table(spark, tmp_path):
    """The deltastream source tails a Delta log by version: batch 1
    delivers the committed snapshot, a restart from the checkpoint
    delivers ONLY newly added versions; a rewrite version fails loudly
    unless ignore_changes; partition columns come back typed."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    root = str(tmp_path / "ext_delta_stream")
    sink = FileSink(
        path=root, commit_mode="manifest", table_type=TableType.APPEND_ONLY,
        partition_by=["lang"], delta_log=True,
    )
    b1 = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20)], "doc_id long, lang string, n long"
    )
    sink.write_staging(b1, "r1")
    sink.publish("r1")

    out = str(tmp_path / "ds_out")
    ckpt = str(tmp_path / "ds_ckpt")

    def run_once():
        df = StreamPipeline(spark).source_delta(root)._source(spark)
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def rows():
        # partition columns are appended at the end of the exported
        # schema; select explicitly for a stable comparison
        return sorted(
            map(
                tuple,
                spark.read.parquet(out).select("doc_id", "lang", "n").collect(),
            )
        )

    run_once()
    got = spark.read.parquet(out)
    assert rows() == [(1, "en", 10), (2, "de", 20)]
    assert dict(got.dtypes)["lang"] == "string"

    b2 = spark.createDataFrame([(3, "en", 30)], "doc_id long, lang string, n long")
    sink.write_staging(b2, "r2")
    sink.publish("r2")
    run_once()
    assert rows() == [(1, "en", 10), (2, "de", 20), (3, "en", 30)]
    run_once()  # up to date: no new rows
    assert spark.read.parquet(out).count() == 3


def test_deltastream_rejects_rewrites_unless_opted_in(spark, tmp_path):
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    root = str(tmp_path / "ext_delta_rw")
    sink = FileSink(path=root, commit_mode="manifest", delta_log=True)
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    sink.write_staging(df, "r1")
    sink.publish("r1")
    sink.merge_into(
        spark, df.withColumn("v", F.col("v") + 1), on=["k"], run_id="m1"
    )

    def run(ignore_changes):
        out = str(
            tmp_path / f"rw_out_{ignore_changes}"
        )
        q = (
            StreamPipeline(spark)
            .source_delta(root, ignore_changes=ignore_changes)
            ._source(spark)
            .writeStream.format("parquet")
            .option("path", out)
            .option(
                "checkpointLocation", str(tmp_path / f"rw_ckpt_{ignore_changes}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    import pyspark.errors

    with pytest.raises(Exception, match="not append-only"):
        run(False)
    got = run(True)  # rewrites stream as inserts (documented duplicates)
    assert sorted(map(tuple, got.collect())) == [
        (1, 10), (1, 11), (2, 20), (2, 21)
    ]


def test_delta_to_lake_continuous_replication(spark, tmp_path):
    """Composition: an EXTERNAL Delta table replicates continuously
    into a manifest lake — source_delta (version offsets) feeding the
    streaming MERGE. Appends at the source arrive as upserts; a
    restart ingests only new versions; replays are idempotent."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    src_root = str(tmp_path / "delta_src")
    src = FileSink(
        path=src_root, commit_mode="manifest",
        table_type=TableType.APPEND_ONLY, delta_log=True,
    )
    tgt = FileSink(path=str(tmp_path / "lake_tgt"), commit_mode="manifest")
    ckpt = str(tmp_path / "repl_ckpt")

    def replicate():
        q = (
            StreamPipeline(spark, "delta_repl")
            .source_delta(src_root)
            .to_merge(tgt, on=["k"], checkpoint=ckpt, once=True)
        )
        q.awaitTermination(120)

    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src.write_staging(b1, "r1")
    src.publish("r1")
    replicate()
    assert sorted(map(tuple, tgt.read_committed(spark).collect())) == [
        (1, "a"), (2, "b")
    ]

    b2 = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
    src.write_staging(b2, "r2")
    src.publish("r2")
    replicate()
    assert sorted(map(tuple, tgt.read_committed(spark).collect())) == [
        (1, "a"), (2, "b2"), (3, "c")
    ]
    replicate()  # no new source versions: idempotent no-op
    assert sorted(map(tuple, tgt.read_committed(spark).collect())) == [
        (1, "a"), (2, "b2"), (3, "c")
    ]


def test_deltastream_date_partitioned_table(spark, tmp_path):
    """A date-partitioned Delta table (the most common layout) streams
    with the partition column restored as a real DateType."""
    import datetime
    import json

    root = tmp_path / "dldate"
    (root / "_delta_log").mkdir(parents=True)
    spark.createDataFrame([(1,)], "k long").coalesce(1).write.parquet(
        str(root / "dt=2024-01-01")
    )
    import os as _os

    pf = [
        f for f in _os.listdir(root / "dt=2024-01-01") if f.endswith(".parquet")
    ][0]
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "dt", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
    acts = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["dt"], "configuration": {}}},
        {"add": {"path": f"dt=2024-01-01/{pf}",
                 "partitionValues": {"dt": "2024-01-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(root / "_delta_log" / f"{0:020d}.json", "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")

    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    out = str(tmp_path / "dldate_out")
    q = (
        StreamPipeline(spark)
        .source_delta(str(root))
        ._source(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dldate_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["dt"] == "date"
    assert [tuple(r) for r in got.collect()] == [
        (1, datetime.date(2024, 1, 1))
    ]


def test_funnel_tracker_orders_across_arrow_chunks(spark, tmp_path):
    """Event-time ordering must hold across Arrow chunk boundaries: with
    maxRecordsPerBatch=2 the click (later rows, earlier time) and the
    view land in different chunks, and the funnel must still advance."""
    import json

    src = tmp_path / "chunk_src"
    src.mkdir()
    # rows ordered so the EARLIEST event sits LAST (chunk 2): a
    # chunk-local walk would process click@20..30 first, skip them
    # (step 0 wants view), then see view@10 and stall at step 1
    rows = [
        {"user_id": 1, "ts": "2024-01-01T00:00:20", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01T00:00:25", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01T00:00:30", "event_type": "click"},
        {"user_id": 1, "ts": "2024-01-01T00:00:10", "event_type": "view"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    from incubator_gobblin_spark.streaming.stateful import funnel_tracker

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        ).json(str(src))
        q = (
            funnel_tracker(stream, ["view", "click"], within_seconds=60)
            .writeStream.format("memory")
            .queryName("chunk_funnel_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = sorted(
        (r["step_idx"], r["step"])
        for r in spark.sql("SELECT * FROM chunk_funnel_sink").collect()
    )
    assert got == [(1, "view"), (2, "click")]


def test_streaming_curation_to_lake(spark, sf_dir, tmp_path):
    """Continuous curation: two micro-batches curate independently but
    dedup GLOBALLY through the fingerprint-keyed insert-only merge —
    a text re-arriving in batch 2 keeps its batch-1 lake copy; quality
    rejects and benchmark-contaminated docs never land; a replayed run
    is a no-op."""
    from incubator_gobblin_spark.session import load_table
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    half = [r["doc_id"] for r in train.select("doc_id").orderBy("doc_id").collect()]
    b1_ids, b2_ids = half[: len(half) // 2], half[len(half) // 2 :]
    src = str(tmp_path / "cur_src")
    # batch 2 re-sends a batch-1 document's text under a NEW id
    dup_src = train.filter(F.col("doc_id") == b1_ids[0]).select(
        (F.col("doc_id") + 10**6).alias("doc_id"), "text", "lang",
        "source", "n_chars",
    )
    import glob
    import os
    import shutil

    os.makedirs(src)
    for i, bdf in enumerate(
        (
            train.filter(F.col("doc_id").isin(b1_ids)),
            train.filter(F.col("doc_id").isin(b2_ids)).unionByName(dup_src),
        )
    ):
        staging = str(tmp_path / f"cur_stage_{i}")
        bdf.coalesce(1).write.parquet(staging)
        part = glob.glob(f"{staging}/part-*.parquet")[0]
        shutil.move(part, f"{src}/b{i}.parquet")

    lake = FileSink(path=str(tmp_path / "cur_lake"), commit_mode="manifest")
    q = (
        StreamPipeline(spark, "cur")
        .source_files(src, "parquet", train.schema, max_files_per_trigger=1)
        .to_curate(
            bench, lake, checkpoint=str(tmp_path / "cur_ckpt"), once=True
        )
    )
    q.awaitTermination(180)

    got = lake.read_committed(spark)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    # the duplicate text under the new id never displaced batch 1's copy
    assert b1_ids[0] + 10**6 not in ids
    # every landed doc is a curation survivor of its batch
    from incubator_gobblin_spark.jobs import curate as curate_job

    full = curate_job.curate(train, bench)
    survivors = {r["doc_id"] for r in full.select("doc_id").collect()}
    # per-batch caps can admit MORE than the global run (caps reset per
    # batch) but never a quality-rejected or contaminated doc
    rejected = (
        {r["doc_id"] for r in train.select("doc_id").collect()} - survivors
    )
    from incubator_gobblin_spark.functions import corpus as C

    gated_out = {
        r["doc_id"]
        for r in train.filter(~C.gopher_keep("text")).select("doc_id").collect()
    }
    assert not (ids & gated_out)
    assert got.count() == got.select("fp").distinct().count()  # global dedup


def test_two_curation_streams_share_one_lake_without_run_id_collision(
    spark, sf_dir, tmp_path
):
    """Two to_curate queries (separate checkpoints) landing in ONE lake
    both start at epoch 0 — their run ids must not collide, or the
    second stream's batches would be silently dropped as 'already
    committed' replays."""
    from incubator_gobblin_spark.session import load_table
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ids = [r["doc_id"] for r in train.select("doc_id").orderBy("doc_id").collect()]
    half = len(ids) // 2
    lake = FileSink(path=str(tmp_path / "shared_lake"), commit_mode="manifest")

    import glob
    import os
    import shutil

    def run_stream(name, id_subset):
        src = str(tmp_path / f"src_{name}")
        os.makedirs(src)
        staging = str(tmp_path / f"stage_{name}")
        train.filter(F.col("doc_id").isin(id_subset)).coalesce(1).write.parquet(
            staging
        )
        shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], f"{src}/b.parquet")
        q = (
            StreamPipeline(spark, name)
            .source_files(src, "parquet", train.schema)
            .to_curate(
                bench, lake, checkpoint=str(tmp_path / f"ckpt_{name}"), once=True
            )
        )
        q.awaitTermination(180)

    run_stream("s1", ids[:half])
    n1 = lake.read_committed(spark).count()
    assert n1 > 0
    run_stream("s2", ids[half:])  # also epoch 0, different checkpoint
    n2 = lake.read_committed(spark).count()
    assert n2 > n1  # the second stream's batch actually landed
    assert len(lake.manifest_history()) == 2


def test_deltastream_skip_change_commits(spark, tmp_path):
    """skipChangeCommits (delta-spark's option): a rewrite version is
    skipped ENTIRELY — the stream survives a content-rewriting commit
    with ZERO duplicate rows and later appends still stream; contrast
    ignoreChanges (streams rewrites as duplicate inserts) and the
    default (fails loudly)."""
    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    root = str(tmp_path / "ext_delta_skip")
    sink = FileSink(path=root, commit_mode="manifest", delta_log=True)
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    sink.write_staging(df, "r1")
    sink.publish("r1")

    out = str(tmp_path / "skip_out")
    ckpt = str(tmp_path / "skip_ckpt")

    def run_once():
        q = (
            StreamPipeline(spark)
            .source_delta(root, skip_change_commits=True)
            ._source(spark)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == [
        (1, 10),
        (2, 20),
    ]
    # a rewrite (merge) lands, then an append: the rewrite version is
    # skipped wholesale (its updated rows never stream — the option's
    # documented lossy contract), the append streams exactly once
    sink.merge_into(
        spark, df.withColumn("v", F.col("v") + 1), on=["k"], run_id="m1"
    )
    b2 = spark.createDataFrame([(3, 30)], "k long, v long")
    sink.write_staging(b2, "r2")
    sink.publish("r2")
    run_once()
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == [
        (1, 10),
        (2, 20),
        (3, 30),
    ]


def test_lakecdf_legacy_schema_escape_hatch(spark, tmp_path):
    """emitCommitOrdinal=false keeps the pre-ordinal source schema —
    the compatibility hatch for a query restarted from an old
    checkpoint whose file sink predates _commit_ordinal (a fresh
    restart would otherwise fail on the sink's narrower schema)."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources import lake_cdf

    lake = str(tmp_path / "lake")
    sink = FileSink(
        path=lake, table_type=TableType.APPEND_ONLY, commit_mode="manifest"
    )
    sink.write_staging(
        spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"), "r1"
    )
    sink.publish("r1")

    lake_cdf.register(spark)
    q = (
        spark.readStream.format("lakecdf")
        .option("path", lake)
        .option("emitCommitOrdinal", "false")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_legacy")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    df = spark.sql("SELECT * FROM cdf_legacy")
    assert "_commit_ordinal" not in df.columns
    assert {(r.k, r.v, r._change_type) for r in df.collect()} == {
        (1, "a", "insert"),
        (2, "b", "insert"),
    }
