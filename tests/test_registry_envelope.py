"""Schema-registry envelope decode (EnvelopeSchemaConverter.java:57) +
mid-stream schema change detection (KafkaSchemaChangeInjector.java:48)."""

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.formats.registry import (
    FileSchemaRegistry,
    InMemorySchemaRegistry,
    SchemaChangeMonitor,
    decode_envelope,
    encode_envelope,
    extract_schema_id,
)

V1 = {
    "type": "record",
    "name": "user",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
    ],
}
V2 = {
    "type": "record",
    "name": "user",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "country", "type": ["null", "string"]},
    ],
}


@pytest.fixture()
def registry():
    r = InMemorySchemaRegistry()
    r.register("users", V1)
    r.register("users", V2)
    return r


def test_registry_idempotent_ids(registry):
    id1 = registry.register("users", V1)
    assert registry.register("users", V1) == id1
    id2, latest = registry.latest("users")
    assert latest == V2 and id2 != id1


def test_file_registry_persists(tmp_path):
    p = str(tmp_path / "reg.json")
    r1 = FileSchemaRegistry(p)
    sid = r1.register("users", V1)
    r2 = FileSchemaRegistry(p)
    assert r2.get_by_id(sid) == V1
    assert r2.register("users", V1) == sid
    assert r2.latest("users")[0] == sid


def test_envelope_roundtrip_single_schema(spark, registry):
    sid = registry.register("users", V2)
    df = spark.range(50).select(
        F.struct(
            F.col("id"),
            F.concat(F.lit("u"), F.col("id")).alias("name"),
            F.lit("de").alias("country"),
        ).alias("rec")
    )
    enc = df.select(encode_envelope("rec", V2, sid).alias("value"))
    dec = enc.select(decode_envelope("value", registry, subject="users").alias("s"))
    out = dec.select("s.id", "s.name", "s.country").orderBy("id").collect()
    assert len(out) == 50
    assert out[7].name == "u7" and out[7].country == "de"


def test_mixed_writer_schemas_resolve_to_reader(spark, registry):
    """Half the records written under V1, half under V2; reader = V2
    latest: V1 records surface country=NULL (avro name resolution)."""
    id1 = registry.register("users", V1)
    id2 = registry.register("users", V2)
    old = spark.range(0, 10).select(
        encode_envelope(
            F.struct(F.col("id"), F.lit("old").alias("name")), V1, id1
        ).alias("value")
    )
    new = spark.range(10, 20).select(
        encode_envelope(
            F.struct(
                F.col("id"), F.lit("new").alias("name"), F.lit("fr").alias("country")
            ),
            V2,
            id2,
        ).alias("value")
    )
    dec = (
        old.unionAll(new)
        .select(decode_envelope("value", registry, subject="users").alias("s"))
        .select("s.*")
    )
    rows = {r.id: r for r in dec.collect()}
    assert len(rows) == 20
    assert rows[3].name == "old" and rows[3].country is None
    assert rows[15].name == "new" and rows[15].country == "fr"


def test_extract_schema_id_jvm_side(spark, registry):
    id1 = registry.register("users", V1)
    df = spark.range(5).select(
        encode_envelope(
            F.struct(F.col("id"), F.lit(None).cast("string").alias("name")), V1, id1
        ).alias("value")
    )
    ids = df.select(extract_schema_id("value")).distinct().collect()
    assert [r.schema_id for r in ids] == [id1]
    # the extraction itself is pure Column arithmetic — no Python eval
    # (materialize the envelopes first so the encode UDF isn't in plan)
    mat = spark.createDataFrame(df.collect(), df.schema)
    plan = (
        mat.select(extract_schema_id("value"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_schema_change_monitor_flags_unknown_id(spark, registry):
    monitor = SchemaChangeMonitor(registry)
    id2 = registry.register("users", V2)
    batch1 = spark.range(3).select(
        encode_envelope(
            F.struct(F.col("id"), F.lit("a").alias("name"), F.lit(None).cast("string").alias("country")),
            V2,
            id2,
        ).alias("value")
    )
    assert monitor.check(batch1) == set()

    # registry evolves AFTER plan-time snapshot: new writer appears
    v3 = dict(V2, fields=V2["fields"] + [{"name": "age", "type": ["null", "int"]}])
    id3 = InMemorySchemaRegistry().register("users", v3)  # simulate foreign id
    id3 = max(registry.snapshot()) + 7
    batch2 = spark.range(3).select(
        encode_envelope(
            F.struct(F.col("id"), F.lit("b").alias("name"), F.lit(None).cast("string").alias("country")),
            V2,
            id3,
        ).alias("value")
    )
    assert monitor.check(batch2) == {id3}
    assert monitor.seen_unknown == {id3}


def test_streaming_envelope_pipeline(spark, registry, tmp_path):
    """Kafka-envelope-shaped stream: binary values framed with
    magic+schema-id, decoded per micro-batch, change monitor riding
    foreachBatch (the KafkaSchemaChangeInjector position)."""
    from incubator_gobblin_spark.streaming.flow import StreamBranch, StreamPipeline

    id1 = registry.register("users", V1)
    src_dir = str(tmp_path / "in")
    spark.range(30).select(
        encode_envelope(
            F.struct(F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("name")),
            V1,
            id1,
        ).alias("value")
    ).write.parquet(src_dir)

    monitor = SchemaChangeMonitor(registry)
    got: list = []
    changes: list = []

    def _sink(batch_df, epoch_id):
        changes.extend(monitor.check(batch_df, "value"))
        decoded = batch_df.select(
            decode_envelope("value", registry, subject="users").alias("s")
        ).select("s.*")
        got.extend(decoded.collect())

    q = (
        StreamPipeline(spark, "envelopes")
        .source_files(src_dir, "parquet", "value binary")
        .to_branches(
            [StreamBranch("decode", _sink)],
            checkpoint=str(tmp_path / "ckpt"),
            once=True,
        )
    )
    q.awaitTermination(120)
    assert changes == []
    assert sorted(r.id for r in got) == list(range(30))
    assert {r.name for r in got} == {f"u{i}" for i in range(30)}


def test_decode_unknown_id_fails_fast(spark, registry):
    df = spark.range(1).select(
        encode_envelope(
            F.struct(F.col("id"), F.lit("x").alias("name")), V1, 999
        ).alias("value")
    )
    dec = df.select(decode_envelope("value", registry, reader_schema=V1).alias("s"))
    with pytest.raises(Exception, match="999"):
        dec.collect()
