"""Gobblin .pull job-spec compatibility (jobs/spec.py): the reference's
properties vocabulary compiles onto Pipeline and runs end-to-end."""

import json
import os

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.jobs import spec as S


def test_parse_properties_comments_continuations_interpolation(monkeypatch):
    monkeypatch.setenv("GOBBLIN_TEST_DIR", "/tmp/gwork")
    props = S.parse_properties(
        """
# a comment
! another comment
fs.uri=file:///
job.name=Demo
writer.fs.uri=${fs.uri}
metrics.log.dir=${env:GOBBLIN_TEST_DIR}/metrics
long.value=a,\\
b,c
missing.ref=${not.defined}
"""
    )
    assert props["writer.fs.uri"] == "file:///"
    assert props["metrics.log.dir"] == "/tmp/gwork/metrics"
    assert props["long.value"] == "a,b,c"
    assert props["missing.ref"] == "${not.defined}"  # kept literal


@pytest.fixture()
def json_source_dir(tmp_path):
    path = tmp_path / "users.json"
    rows = [
        {"name": "ada", "favorite_number": 1, "favorite_color": "green"},
        {"name": "bob", "favorite_number": 2, "favorite_color": "blue"},
        {"name": "eve", "favorite_number": 3, "favorite_color": "green"},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows))
    return str(path)


def _simplejson_props(json_path: str, out_dir: str) -> dict[str, str]:
    """The simplejson.pull example, pointed at local files."""
    avro_schema = {
        "namespace": "example.avro", "type": "record", "name": "User",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "favorite_number", "type": "int"},
            {"name": "favorite_color", "type": "string"},
        ],
    }
    return {
        "job.name": "GobblinDemo",
        "source.class": "org.apache.gobblin.example.simplejson.SimpleJsonSource",
        "converter.classes": "org.apache.gobblin.example.simplejson.SimpleJsonConverter,"
        "org.apache.gobblin.converter.filter.AvroFilterConverter",
        "converter.filter.field": "favorite_color",
        "converter.filter.value": "green",
        "source.filebased.files.to.pull": json_path,
        "source.schema": json.dumps(avro_schema),
        "qualitychecker.row.policies": "org.apache.gobblin.policies.schema.SchemaRowCheckPolicy",
        "qualitychecker.row.policy.types": "OPTIONAL",
        "data.publisher.type": "org.apache.gobblin.publisher.BaseDataPublisher",
        "data.publisher.final.dir": out_dir,
        "writer.output.format": "PARQUET",
    }


def test_simplejson_pull_job_runs(spark, tmp_path, json_source_dir):
    out = str(tmp_path / "out")
    result = S.run_job(spark, _simplejson_props(json_source_dir, out))
    assert result.rows_written == 2  # filter keeps the green rows
    got = spark.read.parquet(out)
    assert sorted(r["name"] for r in got.collect()) == ["ada", "eve"]


def test_pull_file_roundtrip(spark, tmp_path, json_source_dir):
    """The same job as an actual .pull FILE, exercising load_job_file."""
    out = str(tmp_path / "out2")
    props = _simplejson_props(json_source_dir, out)
    pull = tmp_path / "demo.pull"
    pull.write_text(
        "\n".join(f"{k}={v}" for k, v in props.items())
    )
    result = S.run_job(spark, str(pull))
    assert result.rows_written == 2


def test_time_partitioned_writer_layout(spark, tmp_path, sf_dir):
    """TimeBasedWriterPartitioner + TimePartitionedDataPublisher produce
    the year/month/day hive layout from a record timestamp."""
    events_src = str(tmp_path / "events_parquet")
    from incubator_gobblin_spark.session import load_table

    load_table(spark, sf_dir, "events").limit(200).write.parquet(events_src)
    out = str(tmp_path / "daily")
    props = {
        "job.name": "PartitionedWrite",
        "source.class": "org.apache.gobblin.source.FileBasedSource",
        "source.filebased.data.directory": events_src,
        "writer.partitioner.class": "org.apache.gobblin.writer.partitioner.TimeBasedAvroWriterPartitioner",
        "writer.partition.columns": "ts",
        "writer.partition.pattern": "yyyy/MM/dd",
        "data.publisher.type": "org.apache.gobblin.publisher.TimePartitionedDataPublisher",
        "data.publisher.final.dir": out,
        "writer.output.format": "PARQUET",
    }
    result = S.run_job(spark, props)
    assert result.rows_written == 200
    # hive-style partition dirs exist and Spark reads them back partitioned
    years = [d for d in os.listdir(out) if d.startswith("year=")]
    assert years
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert {"year", "month", "day"} <= set(got.columns)


def test_date_partitioned_source_with_min_watermark(spark, tmp_path):
    """DatePartitionedJsonFileSource scans the monthly layout above the
    min watermark (low-exclusive, the reference's contract)."""
    root = tmp_path / "ds" / "monthly"
    for month, payload in [("2015/01", 1), ("2015/02", 2), ("2015/03", 3)]:
        d = root / month
        d.mkdir(parents=True)
        (d / "part.json").write_text(json.dumps({"v": payload}))
    props = {
        "job.name": "DateRead",
        "source.class": "org.apache.gobblin.source.DatePartitionedJsonFileSource",
        "source.filebased.data.directory": str(tmp_path / "ds"),
        "date.partitioned.source.partition.prefix": "monthly",
        "date.partitioned.source.partition.pattern": "yyyy/MM",
        "date.partitioned.source.min.watermark.value": "2015/01",
        "data.publisher.final.dir": str(tmp_path / "dout"),
        "writer.output.format": "JSON",
    }
    result = S.run_job(spark, props)
    assert result.rows_written == 2  # 2015/02 and 2015/03 (low-exclusive)


def test_unsupported_classes_fail_loudly(spark):
    with pytest.raises(S.SpecError, match="unsupported source.class"):
        S.compile_source({"source.class": "com.example.MysterySource"})
    with pytest.raises(S.SpecError, match="unsupported converter"):
        S.compile_job(
            spark,
            {
                "job.name": "x",
                "source.class": "SimpleJsonSource",
                "source.filebased.files.to.pull": "/tmp/x.json",
                "converter.classes": "com.example.WeirdConverter",
                "data.publisher.final.dir": "/tmp/out",
            },
        )


def test_row_count_range_task_policy_aborts(spark, tmp_path, json_source_dir):
    """RowCountRangePolicy outside the allowed deviation aborts the
    publish (staging cleaned, final dir absent)."""
    from incubator_gobblin_spark.operators.quality import TaskPolicyError

    out = str(tmp_path / "never")
    props = _simplejson_props(json_source_dir, out)
    props.update(
        {
            "qualitychecker.task.policies": "org.apache.gobblin.policies.count.RowCountRangePolicy",
            "qualitychecker.task.policy.types": "FAIL",
            "qualitychecker.rows.expected": "100",
            "qualitychecker.row.count.range": "0.1",
        }
    )
    with pytest.raises(TaskPolicyError):
        S.run_job(spark, props)
    assert not os.path.exists(os.path.join(out, "_staging")) or not os.listdir(
        os.path.join(out, "_staging")
    )


def test_retention_job_spec_newest_k(spark, tmp_path):
    """gobblin.retention.* vocabulary: NewestK over a datetime version
    tree, simulate mode lists but deletes nothing."""
    root = tmp_path / "datasets"
    for ds in ("tableA", "tableB"):
        for day in ("2024/01/01", "2024/01/02", "2024/01/03"):
            (root / ds / day).mkdir(parents=True)
            (root / ds / day / "part.txt").write_text("x")
    res = S.run_retention_job(
        spark,
        {
            "gobblin.retention.dataset.dir": str(root),
            "gobblin.retention.version.finder.class":
                "org.apache.gobblin.data.management.retention.version.finder.DateTimeDatasetVersionFinder",
            "gobblin.retention.retention.policy.class":
                "org.apache.gobblin.data.management.retention.policy.NewestKRetentionPolicy",
            "gobblin.retention.versions.retained": "2",
            "gobblin.retention.simulate": "true",
        },
    )
    # oldest version of each dataset is deletable; nothing removed
    assert sorted(res.deleted) == [
        str(root / "tableA" / "2024/01/01"),
        str(root / "tableB" / "2024/01/01"),
    ]
    assert res.dry_run and os.path.isdir(root / "tableA" / "2024/01/01")


def test_compaction_job_spec(spark, tmp_path):
    """compaction.* vocabulary: hourly -> daily dedup compaction."""
    src_dir = tmp_path / "in" / "hourly"
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c")], "k long, v string"
    )
    df.write.parquet(str(src_dir))
    res = S.run_compaction_job(
        spark,
        {
            "compaction.input.dir": str(tmp_path / "in"),
            "compaction.dest.dir": str(tmp_path / "out"),
            "compaction.spark.keys": "k,v",
        },
    )
    assert res.output_rows == 3
    got = spark.read.parquet(str(tmp_path / "out" / "daily"))
    assert got.count() == 3


def test_copy_job_spec(spark, tmp_path):
    """distcp.conf vocabulary (from/to) runs the incremental copy."""
    src = tmp_path / "copySource"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    dst = tmp_path / "copyTarget"
    res = S.run_copy_job(spark, {"from": str(src), "to": str(dst)})
    assert res.files_copied == 2
    assert (dst / "sub" / "b.txt").read_text() == "beta"
    # second run: nothing changed, nothing copied
    res2 = S.run_copy_job(spark, {"from": str(src), "to": str(dst)})
    assert res2.files_copied == 0


def test_hive_conversion_job_spec(spark, tmp_path):
    """hive-avro-to-orc.pull vocabulary: pattern-matched tables convert
    to flattened ORC tables with the _orc suffix."""
    spark.sql("CREATE DATABASE IF NOT EXISTS spec_db")
    df = spark.createDataFrame(
        [(1, ("x", 10)), (2, ("y", 20))],
        "id long, nested struct<tag:string, val:long>",
    )
    df.write.mode("overwrite").saveAsTable("spec_db.t1_avro")
    try:
        results = S.run_hive_conversion_job(
            spark,
            {
                "job.name": "GobblinHiveAvroToOrcConversion",
                "hive.dataset.database": "spec_db",
                "hive.dataset.table.pattern": "t*_avro",
                "source.class":
                    "org.apache.gobblin.data.management.convertion.hive.HiveSource",
                "converter.classes":
                    "org.apache.gobblin.data.management.convertion.hive.HiveAvroToOrcConverter",
            },
        )
        assert set(results) == {"t1_avro"}
        got = spark.table("spec_db.t1_avro_orc")
        assert got.count() == 2
        # flattened: nested struct became top-level columns
        assert "nested" not in got.columns
    finally:
        spark.sql("DROP TABLE IF EXISTS spec_db.t1_avro_orc")
        spark.sql("DROP TABLE IF EXISTS spec_db.t1_avro")
        spark.sql("DROP DATABASE IF EXISTS spec_db")


def test_merge_job_spec(spark, tmp_path):
    """merge.* vocabulary applies a CDC batch as a copy-on-write MERGE
    against the manifest lake; resubmitting the same run id is a
    no-op."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sinks.files import FileSink

    lake = str(tmp_path / "lake")
    sink = FileSink(path=lake, commit_mode="manifest")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k BIGINT, v DOUBLE"
    )
    sink.write_staging(base, "base")
    sink.publish("base")

    cdc_dir = str(tmp_path / "cdc")
    spark.createDataFrame(
        [(1, 100.0, "upsert"), (2, 200.0, None), (3, 0.0, "delete")],
        "k BIGINT, v DOUBLE, op STRING",
    ).write.parquet(cdc_dir)

    spec = {
        "merge.target.dir": lake,
        "merge.source.dir": cdc_dir,
        "merge.keys": "k",
        "merge.op.column": "op",
        "merge.run.id": "cdc1",
    }
    rid = S.run_merge_job(spark, spec)
    assert rid == "cdc1"
    got = {r.k: r.v for r in sink.read_committed(spark).collect()}
    assert len(got) == 9 and 3 not in got
    assert got[1] == 100.0 and got[2] == 200.0  # NULL op upserted

    # resubmitted job: idempotent no-op
    assert S.run_merge_job(spark, spec) == "cdc1"
    assert {r.k: r.v for r in sink.read_committed(spark).collect()} == got


def test_kafka_ingest_job_spec(spark, tmp_path):
    """kafka.* vocabulary drives the exactly-once ingestion loop; a
    second submission with nothing new is a no-op."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sinks.files import FileSink
    from incubator_gobblin_spark.sources import mock_kafka as MK

    MK.register(spark)
    root = str(tmp_path / "broker")
    MK.create_topic(root, "clicks", 2)
    (
        spark.range(12)
        .select(
            F.col("id").cast("string").alias("key"),
            F.to_json(F.struct("id")).alias("value"),
        )
        .write.format("mockkafka")
        .mode("append")
        .option("path", root)
        .option("topic", "clicks")
        .option("numPartitions", "2")
        .save()
    )
    spec = {
        "topic.whitelist": "clicks",
        "kafka.spark.reader.format": "mockkafka",
        "kafka.spark.reader.option.path": root,
        "kafka.spark.value.schema": "id BIGINT",
        "writer.output.dir": str(tmp_path / "lake"),
        "state.store.dir": str(tmp_path / "state"),
    }
    res = S.run_kafka_ingest_job(spark, spec)
    assert res["published"] and res["records_planned"] == 12
    sink = FileSink(path=str(tmp_path / "lake"), commit_mode="manifest")
    got = sink.read_committed(spark)
    assert got.count() == 12
    assert got.select(F.col("value.id")).distinct().count() == 12
    assert not S.run_kafka_ingest_job(spark, spec)["published"]


def test_writer_layout_vocabulary_compiles_sink(spark, tmp_path):
    """writer.cluster/zorder/bloom keys reach the FileSink; exclusive
    cluster+zorder and non-integer bloom.bits fail loudly."""
    base = {
        "writer.output.dir": str(tmp_path / "lake"),
        "data.publisher.spark.commit.mode": "manifest",
    }
    sink, _ = S.compile_sink({**base, "writer.zorder.columns": "x,y",
                              "writer.bloom.columns": "k",
                              "writer.bloom.bits": "4096"})
    assert sink.zorder_by == ["x", "y"]
    assert sink.bloom_cols == ["k"] and sink.bloom_bits == 4096
    sink2, _ = S.compile_sink({**base, "writer.cluster.columns": "k"})
    assert sink2.cluster_by == ["k"]
    with pytest.raises(S.SpecError, match="exclusive"):
        S.compile_sink({**base, "writer.cluster.columns": "a",
                        "writer.zorder.columns": "a,b"})
    with pytest.raises(S.SpecError, match="integer"):
        S.compile_sink({**base, "writer.bloom.bits": "lots"})

    # end to end: a bloom'd manifest job spec writes blooms into the
    # manifest and the lake prunes a point lookup
    import random

    keys = random.Random(4).sample(range(10**9), 300)
    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    sink3, _ = S.compile_sink({**base, "writer.bloom.columns": "k"})
    sink3.write_staging(df.repartition(4), "r1")
    sink3.publish("r1")
    assert all("bloom" in e for e in sink3.current_manifest()["entries"])
    kept, total = sink3.pruned_file_count([("k", "=", keys[0])])
    assert kept <= 2 and total >= 4


def test_cdf_and_evolution_spec_keys(spark, tmp_path):
    base = {
        "writer.output.dir": str(tmp_path / "lake"),
        "data.publisher.spark.commit.mode": "manifest",
        "data.publisher.spark.cdf.materialize": "true",
        "data.publisher.spark.schema.evolution": "true",
    }
    sink, _ = S.compile_sink(base)
    assert sink.cdf_materialize and sink.schema_evolution
    with pytest.raises(S.SpecError, match="true/false"):
        S.compile_sink({**base, "data.publisher.spark.cdf.materialize": "yes"})


def test_curation_job_spec(spark, tmp_path, sf_dir):
    """curate.* vocabulary runs the five-stage curation chain and
    publishes split-partitioned output; results equal a direct
    jobs.curate call on the same split of the corpus."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.jobs import curate as curate_job
    from incubator_gobblin_spark.session import load_table

    out_dir = str(tmp_path / "curated")
    spec = {
        "curate.input.dir": f"{sf_dir}/documents.parquet",
        "curate.bench.predicate": "doc_id % 97 = 0",
        "curate.cap.per.source": "20",
        "writer.output.dir": out_dir,
    }
    res = S.run_curation_job(spark, spec)
    docs = load_table(spark, sf_dir, "documents")
    want = curate_job.curate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        cap_per_source=20,
    )
    ids = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.split) for r in df.select("doc_id", "split").collect()
    )
    assert ids(res) == ids(want) and len(ids(res)) > 0
    published = spark.read.option("basePath", out_dir).parquet(out_dir)
    assert ids(published) == ids(res)
    import os

    assert any(d.startswith("split=") for d in os.listdir(out_dir))


def test_curation_job_spec_requires_bench(spark):
    import pytest as _pytest

    with _pytest.raises(S.SpecError):
        S.run_curation_job(spark, {"curate.input.dir": "/nonexistent"})


def test_merge_job_spec_matched_ignore(spark, tmp_path):
    """merge.matched=ignore makes the spec-driven MERGE insert-if-absent."""
    from incubator_gobblin_spark.sinks.files import FileSink

    lake = str(tmp_path / "lake")
    sink = FileSink(path=lake, commit_mode="manifest")
    sink.write_staging(
        spark.createDataFrame([(1, "keep")], "k BIGINT, v STRING"), "base"
    )
    sink.publish("base")
    cdc = str(tmp_path / "cdc")
    spark.createDataFrame(
        [(1, "clobber"), (2, "new")], "k BIGINT, v STRING"
    ).write.parquet(cdc)
    S.run_merge_job(
        spark,
        {
            "merge.target.dir": lake,
            "merge.source.dir": cdc,
            "merge.keys": "k",
            "merge.matched": "ignore",
        },
    )
    got = {r.k: r.v for r in sink.read_committed(spark).collect()}
    assert got == {1: "keep", 2: "new"}


def test_curation_job_spec_incremental_lake(spark, tmp_path, sf_dir):
    """curate.lake.dir switches the spec job to incremental mode:
    fingerprint-keyed insert-only merges, replay no-op."""
    from incubator_gobblin_spark.sinks.files import FileSink

    lake = str(tmp_path / "lake")
    spec = {
        "curate.input.dir": f"{sf_dir}/documents.parquet",
        "curate.bench.predicate": "doc_id % 97 = 0",
        "curate.lake.dir": lake,
        "curate.run.id": "batch1",
    }
    S.run_curation_job(spark, spec)
    sink = FileSink(path=lake, commit_mode="manifest")
    n1 = sink.read_committed(spark).count()
    assert n1 > 0
    # replay the same batch id: no-op; then a "new" batch whose docs
    # are all duplicates: nothing appended
    S.run_curation_job(spark, spec)
    assert sink.read_committed(spark).count() == n1
    S.run_curation_job(spark, {**spec, "curate.run.id": "batch2"})
    assert sink.read_committed(spark).count() == n1


def test_rest_ingest_job_spec(spark, tmp_path, sf_dir):
    """The REST vocabulary compiles and the incremental loop runs
    end-to-end through the file-backed endpoint double: snapshot run,
    growth delta, drained no-op."""
    import duckdb

    from incubator_gobblin_spark.jobs.spec import run_rest_ingest_job
    from incubator_gobblin_spark.sinks.files import FileSink

    api = str(tmp_path / "api.parquet")
    duckdb.sql(
        f"COPY (SELECT event_id, ts, event_type, value FROM "
        f"'{sf_dir}/events.parquet' WHERE ts <= TIMESTAMP '2024-01-10') "
        f"TO '{api}' (FORMAT PARQUET)"
    )
    props = {
        "rest.source.resource": "events",
        "rest.source.schema": (
            "event_id long, ts timestamp, event_type string, value double"
        ),
        "extract.delta.fields": "ts",
        "rest.source.order.by": "event_id",
        "rest.source.page.size": "5000",
        "rest.source.rate.per.sec": "10000",
        "source.max.number.of.partitions": "2",
        f"rest.endpoint.file.events": api,
        "writer.output.dir": str(tmp_path / "lake"),
        "state.store.dir": str(tmp_path / "state"),
    }
    r1 = run_rest_ingest_job(spark, props)
    assert r1["published"]
    sink = FileSink(path=props["writer.output.dir"], commit_mode="manifest")
    n1 = sink.read_committed(spark).count()
    assert n1 == duckdb.sql(f"SELECT count(*) FROM '{api}'").fetchone()[0]

    duckdb.sql(
        f"COPY (SELECT event_id, ts, event_type, value FROM "
        f"'{sf_dir}/events.parquet') TO '{api}' (FORMAT PARQUET)"
    )
    r2 = run_rest_ingest_job(spark, props)
    assert r2["published"] and r2["low"] is not None
    total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sink.read_committed(spark).count() == total

    r3 = run_rest_ingest_job(spark, props)
    assert not r3["published"]


def test_rest_ingest_job_spec_validation(spark):
    import pytest as _pytest

    from incubator_gobblin_spark.jobs.spec import SpecError, run_rest_ingest_job

    with _pytest.raises((SpecError, KeyError)):
        run_rest_ingest_job(spark, {"rest.source.resource": "x"})


def test_egress_job_spec(spark, tmp_path, sf_dir):
    from incubator_gobblin_spark.jobs.spec import run_egress_job
    from incubator_gobblin_spark.sinks.egress import FileBackedBulkEndpoint

    from incubator_gobblin_spark.session import load_table as _lt

    src_dir = str(tmp_path / "src")
    _lt(spark, sf_dir, "region").write.parquet(src_dir)
    ep_dir = str(tmp_path / "ep")
    res = run_egress_job(
        spark,
        {
            "egress.input.dir": src_dir,
            "egress.batch.size": "2",
            "egress.max.retries": "2",
            "egress.endpoint.dir": ep_dir,
        },
    )
    assert res.records_sent == 5 and res.batches_sent == 3
    got = FileBackedBulkEndpoint(ep_dir).delivered()
    assert {r["r_regionkey"] for r in got} == {0, 1, 2, 3, 4}


def test_rollback_job_spec(spark, tmp_path, sf_dir):
    from incubator_gobblin_spark.jobs.spec import run_rollback_job
    from incubator_gobblin_spark.session import load_table as _lt
    from incubator_gobblin_spark.sinks.files import FileSink

    lake = str(tmp_path / "lake")
    sink = FileSink(path=lake, commit_mode="manifest")
    region = _lt(spark, sf_dir, "region")
    sink.write_staging(region, "v1")
    sink.publish("v1")
    sink.merge_into(
        spark,
        region.limit(2).withColumn("r_name", F.lit("BAD")),
        on=["r_regionkey"],
        run_id="bad",
    )
    rid = run_rollback_job(
        spark, {"rollback.target.dir": lake, "rollback.to.run": "v1"}
    )
    assert rid == sink.manifest_history()[0]
    assert (
        sink.read_committed(spark).filter(F.col("r_name") == "BAD").count() == 0
    )


def test_mixture_job_modes(spark, tmp_path):
    """run_mixture_job: temperature and unimax modes compute weights
    from the corpus; explicit mode parses them; every mode materializes
    within the floor/ceil copy envelope per stream."""
    import math

    src = str(tmp_path / "docs")
    out = str(tmp_path / "mixed")
    rows = [(i, "en" if i < 80 else "de", f"text {i}") for i in range(100)]
    spark.createDataFrame(rows, "doc_id long, lang string, text string").write.parquet(src)
    n = {"en": 80, "de": 20}

    # explicit: exact weights
    res = S.run_mixture_job(
        spark,
        {
            "mixture.input.dir": src,
            "mixture.mode": "explicit",
            "mixture.weights": "en:0.5, de:2.0",
            "mixture.output.dir": out,
        },
    )
    assert res["weights"] == {"en": 0.5, "de": 2.0}
    assert res["rows_in"] == 100
    by_lang = {
        r["lang"]: r["c"]
        for r in spark.read.parquet(out)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert by_lang["de"] == 40  # integral weight: exact
    assert 0 <= by_lang["en"] <= 80

    # temperature: alpha=1 is proportional -> every multiplier 1.0
    res_t = S.run_mixture_job(
        spark,
        {
            "mixture.input.dir": src,
            "mixture.mode": "temperature",
            "mixture.alpha": "1.0",
        },
    )
    assert all(abs(w - 1.0) < 1e-6 for w in res_t["weights"].values())
    assert res_t["rows_out"] == 100

    # unimax: budget within capacity splits uniformly (50/50)
    res_u = S.run_mixture_job(
        spark,
        {
            "mixture.input.dir": src,
            "mixture.mode": "unimax",
            "mixture.budget": "60",
            "mixture.epoch.cap": "2.0",
        },
    )
    assert res_u["weights"]["en"] == 0.375  # 30/80
    assert res_u["weights"]["de"] == 1.5    # 30/20
    lo = sum(math.floor(w) * n[g] for g, w in res_u["weights"].items())
    hi = sum(math.ceil(w) * n[g] for g, w in res_u["weights"].items())
    assert lo <= res_u["rows_out"] <= hi

    # bad mode / missing budget are loud
    with pytest.raises(S.SpecError, match="mixture.budget"):
        S.run_mixture_job(
            spark, {"mixture.input.dir": src, "mixture.mode": "unimax"}
        )
    with pytest.raises(S.SpecError, match="mixture.mode"):
        S.run_mixture_job(
            spark, {"mixture.input.dir": src, "mixture.mode": "nope"}
        )


def test_fuzzy_ingest_job_spec(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a long familiar tune about rivers and mountains"
    )
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [(1, base), (2, "unrelated words " * 8)], "doc_id long, text string"
    ).write.parquet(b1)
    spark.createDataFrame(
        [(3, base + " coda"), (4, "brand new material " * 8)],
        "doc_id long, text string",
    ).write.parquet(b2)
    spec = {
        "fuzzy.corpus.dir": str(tmp_path / "corpus"),
        "fuzzy.index.dir": str(tmp_path / "index"),
    }
    r1 = S.run_fuzzy_ingest_job(
        spark, {**spec, "fuzzy.input.dir": b1, "fuzzy.run.id": "b1"}
    )
    assert r1["admitted"] == 2
    r2 = S.run_fuzzy_ingest_job(
        spark, {**spec, "fuzzy.input.dir": b2, "fuzzy.run.id": "b2"}
    )
    assert r2["admitted"] == 1 and r2["dropped_vs_committed"] == 1


def test_mixture_job_with_shards(spark, tmp_path):
    src = str(tmp_path / "docs2")
    out = str(tmp_path / "mixed2")
    rows = [(i, "en", f"text {i}") for i in range(60)]
    spark.createDataFrame(rows, "doc_id long, lang string, text string").write.parquet(src)
    res = S.run_mixture_job(
        spark,
        {
            "mixture.input.dir": src,
            "mixture.mode": "explicit",
            "mixture.weights": "en:2.0",
            "mixture.shards": "4",
            "mixture.output.dir": out,
        },
    )
    got = spark.read.parquet(out)
    assert res["rows_out"] == 120  # integral weight doubles every doc
    assert set(got.columns) >= {"doc_id", "copy_n", "shard", "pos"}
    rows = got.select("shard", "pos").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense rank
    # the two copies of one doc shuffle independently (different keys)
    c = got.filter(F.col("doc_id") == 0).select("shard", "pos").collect()
    assert len(c) == 2 and len({(r["shard"], r["pos"]) for r in c}) == 2


def test_curation_job_spec_semantic_stage(spark, tmp_path, sf_dir):
    """curate.semantic.* vocabulary: planted embedding leak is dropped
    by the spec-driven run; missing bench dir is a SpecError."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.jobs import curate as curate_job
    from incubator_gobblin_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = curate_job.curate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    leak_id = min(base_ids)
    emb_dir = str(tmp_path / "emb")
    bench_dir = str(tmp_path / "bench_emb")
    spark.createDataFrame(
        [(leak_id, [1.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(emb_dir)
    spark.createDataFrame(
        [(10**9, [3.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(bench_dir)
    res = S.run_curation_job(
        spark,
        {
            "curate.input.dir": f"{sf_dir}/documents.parquet",
            "curate.bench.predicate": "doc_id % 97 = 0",
            "curate.semantic.embeddings.dir": emb_dir,
            "curate.semantic.bench.dir": bench_dir,
            "curate.semantic.threshold": "0.99",
        },
    )
    got = {r["doc_id"] for r in res.select("doc_id").collect()}
    assert got == base_ids - {leak_id}

    import pytest as _pytest

    with _pytest.raises(S.SpecError, match="semantic.bench.dir"):
        S.run_curation_job(
            spark,
            {
                "curate.input.dir": f"{sf_dir}/documents.parquet",
                "curate.bench.predicate": "doc_id % 97 = 0",
                "curate.semantic.embeddings.dir": emb_dir,
            },
        )


def test_audit_job_spec(spark, tmp_path, sf_dir):
    """audit.* vocabulary: profile + skew + LSH dedup audit from one
    spec, each report published atomically."""
    import os

    out_dir = str(tmp_path / "audit_out")
    reports = S.run_audit_job(
        spark,
        {
            "audit.input.dir": f"{sf_dir}/documents.parquet",
            "audit.profile.columns": "doc_id,lang,source",
            "audit.skew.keys": "source",
            "audit.skew.top": "5",
            "audit.lsh.sample.predicate": "doc_id % 5 = 0",
            "writer.output.dir": out_dir,
        },
    )
    assert set(reports) == {"profile", "skew", "lsh_audit"}
    prof = reports["profile"].toPandas()
    assert set(prof["column"]) == {"doc_id", "lang", "source"}
    skew = reports["skew"].toPandas()
    assert len(skew) <= 5 and (skew["frac"] <= 1.0).all()
    audit = reports["lsh_audit"].toPandas().iloc[0]
    assert audit["n_truth"] >= 0 and 0 <= audit["recall"] <= 1
    for name in reports:
        pub = spark.read.parquet(os.path.join(out_dir, name))
        assert pub.count() == reports[name].count()


def test_audit_job_spec_minimal_and_errors(spark, sf_dir):
    reports = S.run_audit_job(
        spark, {"audit.input.dir": f"{sf_dir}/documents.parquet"}
    )
    assert set(reports) == {"profile"}  # skew/lsh legs are opt-in
    import pytest as _pytest

    with _pytest.raises(S.SpecError, match="audit.input.dir"):
        S.run_audit_job(spark, {})


def test_delta_source_spec(spark, tmp_path, sf_dir):
    """source.spark.format=delta reads an external Delta table through
    log replay inside a full pipeline spec, with version time travel."""
    from incubator_gobblin_spark.sinks.files import FileSink

    root = str(tmp_path / "delta_tbl")
    sink = FileSink(path=root, commit_mode="manifest", delta_log=True)
    df = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    sink.write_staging(df, "r1")
    sink.publish("r1")
    sink.merge_into(
        spark, df.withColumn("v", F.col("v") + 100), on=["k"], run_id="m1"
    )

    out = str(tmp_path / "delta_out")
    res = S.run_job(
        spark,
        {
            "source.class": "DeltaSource",
            "source.filebased.data.directory": root,
            "writer.output.format": "parquet",
            "writer.output.dir": out,
        },
    )
    got = spark.read.parquet(out)
    assert sorted(map(tuple, got.collect())) == [
        (i, i * 2 + 100) for i in range(5)
    ]

    reader = S.compile_source(
        {
            "source.class": "DeltaSource",
            "source.filebased.data.directory": root,
            "source.delta.version": "0",
        }
    )
    assert sorted(map(tuple, reader(spark).collect())) == [
        (i, i * 2) for i in range(5)
    ]


def test_curation_semantic_format_independent_of_corpus_format(
    spark, tmp_path, sf_dir
):
    """json document corpus + parquet embedding tables — the natural
    mixed shape; curate.semantic.format governs the embedding reads."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.session import load_table

    docs_dir = str(tmp_path / "docs_json")
    load_table(spark, sf_dir, "documents").write.json(docs_dir)
    emb_dir = str(tmp_path / "emb_pq")
    bench_dir = str(tmp_path / "bench_pq")
    base = S.run_curation_job(
        spark,
        {
            "curate.input.dir": docs_dir,
            "curate.input.format": "json",
            "curate.bench.predicate": "doc_id % 97 = 0",
        },
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    leak = min(base_ids)
    spark.createDataFrame(
        [(leak, [1.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(emb_dir)
    spark.createDataFrame(
        [(10**9, [2.0, 0.0])], "doc_id long, embedding array<double>"
    ).write.parquet(bench_dir)
    res = S.run_curation_job(
        spark,
        {
            "curate.input.dir": docs_dir,
            "curate.input.format": "json",
            "curate.bench.predicate": "doc_id % 97 = 0",
            "curate.semantic.embeddings.dir": emb_dir,
            "curate.semantic.bench.dir": bench_dir,
            "curate.semantic.threshold": "0.99",
        },
    )
    got = {r["doc_id"] for r in res.select("doc_id").collect()}
    assert got == base_ids - {leak}


# ---------------------------------------------------------------------------
# job.schedule vocabulary (JobScheduler.java:41, :360-407, :518)
# ---------------------------------------------------------------------------


def test_job_schedule_quartz_parse_and_next_fire_time():
    """The reference's shipped example ``job.schedule=0 0/2 * * * ?``
    (every 2 minutes) parses, and next_fire_time matches Quartz's
    trigger arithmetic."""
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import parse_quartz_cron

    cron = parse_quartz_cron("0 0/2 * * * ?")
    assert cron.next_fire_time(
        datetime(2024, 3, 1, 10, 1, 30)
    ) == datetime(2024, 3, 1, 10, 2, 0)
    # strictly after: a fire time AT 'after' rolls to the next slot
    assert cron.next_fire_time(
        datetime(2024, 3, 1, 10, 2, 0)
    ) == datetime(2024, 3, 1, 10, 4, 0)
    # hour rollover
    assert cron.next_fire_time(
        datetime(2024, 3, 1, 23, 59, 0)
    ) == datetime(2024, 3, 2, 0, 0, 0)


def test_job_schedule_quartz_field_semantics():
    """Quartz specifics: seconds field, SUN=1 day-of-week numbering,
    names, ranges, day-of-month vs day-of-week restriction."""
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import parse_quartz_cron

    # 06:30:15 every MON (Quartz MON=2)
    cron = parse_quartz_cron("15 30 6 ? * MON")
    nxt = cron.next_fire_time(datetime(2024, 3, 1, 0, 0, 0))  # a Friday
    assert nxt == datetime(2024, 3, 4, 6, 30, 15)  # next Monday
    assert nxt.weekday() == 0

    # first day of JAN and JUL, midnight
    cron = parse_quartz_cron("0 0 0 1 JAN,JUL ?")
    assert cron.next_fire_time(
        datetime(2024, 2, 1, 0, 0, 0)
    ) == datetime(2024, 7, 1, 0, 0, 0)

    # numeric dow: 1 = SUN
    cron = parse_quartz_cron("0 0 12 ? * 1")
    assert cron.next_fire_time(datetime(2024, 3, 1, 0, 0, 0)).weekday() == 6


def test_job_schedule_rejects_unsupported_forms():
    import pytest as _pytest

    from incubator_gobblin_spark.jobs.schedule import parse_quartz_cron

    with _pytest.raises(ValueError, match="6/7-field"):
        parse_quartz_cron("*/5 * * * *")  # POSIX 5-field
    with _pytest.raises(ValueError, match="L/W/#"):
        parse_quartz_cron("0 0 0 L * ?")
    with _pytest.raises(ValueError, match="year field"):
        parse_quartz_cron("0 0 0 1 1 ? 2024")


def test_job_schedule_compile_contract():
    """compile_schedule: no job.schedule -> one-time (the :518
    runonce defaulting); job.disabled honored; the cron is exposed for
    the delegated orchestrator."""
    from incubator_gobblin_spark.jobs.schedule import compile_schedule

    s = compile_schedule({"job.name": "j"})
    assert s.cron is None and s.run_once and not s.disabled

    s = compile_schedule({"job.schedule": "0 0 4 * * ?"})
    assert s.cron is not None and not s.run_once
    assert 4 in s.cron.hours

    s = compile_schedule({"job.schedule": "0 0 4 * * ?", "job.disabled": "true"})
    assert s.disabled


def test_job_spec_with_schedule_key_compiles_and_disabled_skips(spark, tmp_path):
    """A .pull spec carrying job.schedule compiles and runs one trigger
    occurrence; the same spec with job.disabled=true is skipped
    (returns None, writes nothing)."""
    import os

    from incubator_gobblin_spark.jobs import spec as SP

    src = str(tmp_path / "src")
    spark.range(5).selectExpr("id", "id * 2 AS v").coalesce(1).write.json(src)
    props = {
        "job.name": "scheduled-json-copy",
        "job.schedule": "0 0 4 * * ?",
        "source.class": "SimpleJsonSource",
        "source.filebased.data.directory": src,
        "writer.output.format": "parquet",
        "data.publisher.final.dir": str(tmp_path / "out"),
    }
    out = SP.run_job(spark, props)
    assert out is not None and out.rows_written == 5

    props2 = dict(props, **{"job.disabled": "true",
                            "data.publisher.final.dir": str(tmp_path / "out2")})
    assert SP.run_job(spark, props2) is None
    assert not os.path.exists(str(tmp_path / "out2"))


def test_run_job_does_not_reject_calendar_cron_forms(spark, tmp_path):
    """A valid Quartz calendar form (L/W/#) this engine's parser
    declines must not stop run_job — it never consults the cron
    (compile_schedule stays the strict orchestrator-facing parser)."""
    import pytest as _pytest

    from incubator_gobblin_spark.jobs import spec as SP
    from incubator_gobblin_spark.jobs.schedule import compile_schedule

    src = str(tmp_path / "src")
    spark.range(3).selectExpr("id", "id * 2 AS v").coalesce(1).write.json(src)
    props = {
        "job.name": "last-day-job",
        "job.schedule": "0 0 12 L * ?",  # last day of month: Quartz-valid
        "source.class": "SimpleJsonSource",
        "source.filebased.data.directory": src,
        "writer.output.format": "parquet",
        "data.publisher.final.dir": str(tmp_path / "out"),
    }
    out = SP.run_job(spark, props)
    assert out is not None and out.rows_written == 3
    with _pytest.raises(ValueError, match="L/W/#"):
        compile_schedule(props)  # the strict parser still declines


def test_metadata_retention_job_vocabulary(spark, sf_dir, tmp_path):
    """gobblin.retention.metadata.*: one spec prunes Iceberg snapshot
    history to keep-last-N and expires pre-checkpoint Delta commits;
    both surfaces stay readable afterwards."""
    from incubator_gobblin_spark.jobs import spec as SP
    from incubator_gobblin_spark.session import load_table
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources.delta_import import read_delta
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    df = load_table(spark, sf_dir, "region")
    root = str(tmp_path / "meta-ret")
    sink = FileSink(
        path=root, commit_mode="manifest", table_type=TableType.APPEND_ONLY
    )
    for i in range(3):
        sink.write_staging(df.filter(F.col("r_regionkey") % 3 == i), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_iceberg()
        sink.export_delta_log(checkpoint_interval=1)

    out = SP.run_metadata_retention_job(
        {
            "gobblin.retention.metadata.table.dir": root,
            "gobblin.retention.metadata.iceberg.keep.snapshots": "1",
            "gobblin.retention.metadata.delta.expire": "true",
        }
    )
    assert out["iceberg_kept"] == 1 and out["delta_removed"] > 0
    assert len(current_metadata(root)["snapshots"]) == 1
    committed = sorted(map(tuple, sink.read_committed(spark).collect()))
    assert sorted(map(tuple, read_iceberg(spark, root).collect())) == committed
    assert sorted(map(tuple, read_delta(spark, root).collect())) == committed


def test_schedule_driver_fires_when_due():
    """ScheduleDriver.tick with an injected clock: cron specs fire at
    next_fire_time and reschedule; nothing fires early
    (JobScheduler.java:360-407 semantics, no daemon, no sleeps)."""
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import ScheduleDriver

    ran = []
    drv = ScheduleDriver(lambda name, props: ran.append(name))
    t0 = datetime(2024, 3, 1, 0, 0, 0)
    drv.register("j2min", {"job.schedule": "0 0/2 * * * ?"}, now=t0)
    assert drv.next_fire("j2min") == datetime(2024, 3, 1, 0, 2, 0)

    assert drv.tick(datetime(2024, 3, 1, 0, 1, 59)) == []  # not due
    assert drv.tick(datetime(2024, 3, 1, 0, 2, 0)) == ["j2min"]
    assert ran == ["j2min"]
    # rescheduled strictly after the tick
    assert drv.next_fire("j2min") == datetime(2024, 3, 1, 0, 4, 0)
    # same instant again: nothing re-fires
    assert drv.tick(datetime(2024, 3, 1, 0, 2, 0)) == []


def test_schedule_driver_run_once_and_disabled():
    """A spec without job.schedule is run-once (the :518 defaulting):
    fires on the first tick, then descheduled. job.disabled never
    fires (:366-370). job.runonce=true with a cron fires exactly once
    at its first trigger."""
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import ScheduleDriver

    ran = []
    drv = ScheduleDriver(lambda name, props: ran.append(name))
    t0 = datetime(2024, 3, 1, 12, 0, 0)
    drv.register("once", {"job.name": "once"}, now=t0)
    drv.register(
        "off", {"job.schedule": "0 * * * * ?", "job.disabled": "true"}, now=t0
    )
    drv.register(
        "cron-once",
        {"job.schedule": "0 30 12 * * ?", "job.runonce": "true"},
        now=t0,
    )
    assert drv.next_fire("off") is None

    fired = drv.tick(datetime(2024, 3, 1, 12, 0, 1))
    assert fired == ["once"]  # cron-once not due yet, off never
    assert drv.next_fire("once") is None  # descheduled
    fired = drv.tick(datetime(2024, 3, 1, 12, 30, 0))
    assert fired == ["cron-once"]
    assert drv.next_fire("cron-once") is None  # run-once honored
    # long after: neither disabled nor exhausted jobs ever fire again
    assert drv.tick(datetime(2024, 3, 2, 12, 30, 0)) == []
    assert ran == ["once", "cron-once"]


def test_schedule_driver_misfire_fires_once_then_continues():
    """A clock jump past several fire times fires ONCE and reschedules
    from now (Quartz's default misfire instruction) — a batch engine
    must not replay a backlog of identical incremental extracts."""
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import ScheduleDriver

    ran = []
    drv = ScheduleDriver(lambda name, props: ran.append(name))
    drv.register(
        "j", {"job.schedule": "0 0/2 * * * ?"},
        now=datetime(2024, 3, 1, 0, 0, 0),
    )
    # jump 61 minutes: ~30 slots missed -> exactly one fire
    assert drv.tick(datetime(2024, 3, 1, 1, 1, 0)) == ["j"]
    assert ran == ["j"]
    assert drv.next_fire("j") == datetime(2024, 3, 1, 1, 2, 0)


def test_schedule_driver_runs_real_job_spec(spark, tmp_path):
    """The driver's runner can be run_job itself: a registered .pull
    spec executes one trigger occurrence per fire (the delegation
    contract's production wiring)."""
    import json
    from datetime import datetime

    from incubator_gobblin_spark.jobs.schedule import ScheduleDriver
    from incubator_gobblin_spark.jobs.spec import run_job

    src = tmp_path / "in.json"
    src.write_text(
        "\n".join(json.dumps({"k": i, "s": f"v{i}"}) for i in range(6))
    )
    out = tmp_path / "out"
    props = {
        "job.name": "drv-copy",
        "job.schedule": "0 0 4 * * ?",
        "source.class": "org.apache.gobblin.example.simplejson.SimpleJsonSource",
        "source.filebased.files.to.pull": str(src),
        "source.schema": json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "k", "type": "int"},
                    {"name": "s", "type": "string"},
                ],
            }
        ),
        "converter.classes":
            "org.apache.gobblin.example.simplejson.SimpleJsonConverter",
        "data.publisher.final.dir": str(out),
        "writer.output.format": "PARQUET",
    }
    drv = ScheduleDriver(lambda name, p: run_job(spark, p))
    drv.register("drv-copy", props, now=datetime(2024, 3, 1, 0, 0, 0))
    fired = drv.tick(datetime(2024, 3, 1, 4, 0, 0))
    assert fired == ["drv-copy"]
    got = spark.read.parquet(str(out))
    assert got.count() == 6
