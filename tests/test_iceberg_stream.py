"""icebergstream: Structured-Streaming source tailing an Iceberg
table's snapshot chain — the streaming face of
read_iceberg_incremental and the Iceberg sibling of deltastream."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sinks.files import FileSink, TableType
from incubator_gobblin_spark.sources.iceberg_stream import (
    IcebergStreamReader,
    _table_schema,
    register,
)


def _sink(path, **kw):
    return FileSink(path=str(path), commit_mode="manifest", **kw)


def _build_chain(spark, sf_dir, root, n=3):
    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    for i in range(n):
        sink.write_staging(df.filter(F.col("n_nationkey") % n == i), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_iceberg()
    return sink, df


def test_iceberg_stream_end_to_end_and_restart(spark, sf_dir, tmp_path):
    """readStream over the snapshot chain: batch 0 delivers the whole
    current table, a new export delivers ONLY the delta, and a
    restarted query resumes after the checkpointed snapshot (no
    reprocess)."""
    root = str(tmp_path / "icb-stream")
    sink, df = _build_chain(spark, sf_dir, root, n=3)
    register(spark)
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")

    def run_once():
        q = (
            spark.readStream.format("icebergstream")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out_dir)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, df.collect())
    )
    # drained restart: no new snapshot -> no new rows
    run_once()
    assert spark.read.parquet(out_dir).count() == df.count()
    # a fourth commit streams ONLY its delta
    extra = df.limit(2).withColumn(
        "n_nationkey", F.col("n_nationkey") + 1000
    )
    sink.write_staging(extra, "r3")
    sink.publish("r3")
    sink.export_iceberg()
    run_once()
    got = spark.read.parquet(out_dir)
    assert got.count() == df.count() + 2
    assert got.filter(F.col("n_nationkey") >= 1000).count() == 2


def _reader(root):
    schema, part_cols, part_types = _table_schema(root)
    return IcebergStreamReader(
        {"path": root}, schema, part_cols, part_types
    )


def test_iceberg_stream_guards(spark, sf_dir, tmp_path):
    """Driver-level guard semantics: non-append snapshots mid-stream
    raise; a fresh earliest stream on an EXPIRED chain serves the
    first surviving (self-contained) snapshot as full state; a
    checkpointed offset predating expired history raises; row-level
    delete manifests refuse."""
    from incubator_gobblin_spark.sinks.iceberg_export import (
        append_position_deletes,
        expire_iceberg_snapshots,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        snapshot_files,
    )

    root = str(tmp_path / "icb-guard")
    sink, df = _build_chain(spark, sf_dir, root, n=3)
    reader = _reader(root)
    snaps = current_metadata(root)["snapshots"]
    seqs = [s["sequence-number"] for s in snaps]

    # mid-stream full-mode compaction (operation=overwrite) raises
    sink.export_iceberg(mode="full")
    reader2 = _reader(root)
    hi = reader2.latestOffset()["seq"]
    with pytest.raises(ValueError, match="not an append"):
        reader2.partitions({"seq": seqs[-1]}, {"seq": hi})
    # ...but a FRESH stream serves the compacted chain as batch 0
    parts = reader2.partitions({"seq": 0}, {"seq": hi})
    rows = sum(1 for p in parts for _ in reader2.read(p))
    assert rows == df.count()

    # expiry: a fresh stream reads the surviving state; a checkpointed
    # pre-expiry offset raises
    expire_iceberg_snapshots(sink, keep_last=1)
    reader3 = _reader(root)
    hi3 = reader3.latestOffset()["seq"]
    parts = reader3.partitions({"seq": 0}, {"seq": hi3})
    rows = sum(1 for p in parts for _ in reader3.read(p))
    assert rows == df.count()
    with pytest.raises(ValueError, match="expired"):
        reader3.partitions({"seq": 1}, {"seq": hi3})

    # row-level delete manifests refuse
    files, _ = snapshot_files(
        current_metadata(root), root, collect_deletes=True
    )
    coords = [
        (r[0], r[1])
        for r in spark.read.parquet(*[f["path"] for f in files])
        .withColumn("_fp", F.col("_metadata.file_path"))
        .withColumn("_pos", F.col("_metadata.row_index"))
        .filter(F.col("n_nationkey") == 1)
        .select("_fp", "_pos")
        .collect()
    ]
    append_position_deletes(root, coords)
    reader4 = _reader(root)
    with pytest.raises(ValueError, match="delete"):
        reader4.partitions({"seq": 0}, {"seq": reader4.latestOffset()["seq"]})


def test_iceberg_stream_partitioned_restore(spark, sf_dir, tmp_path):
    """Identity partition values restore typed through the stream
    (manifest partition struct -> column)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).limit(200)
    root = str(tmp_path / "icb-part-stream")
    sink = _sink(
        root, partition_by=["lang"], table_type=TableType.APPEND_ONLY
    )
    sink.write_staging(docs, "r0")
    sink.publish("r0")
    sink.export_iceberg()
    reader = _reader(root)
    parts = reader.partitions(
        {"seq": 0}, {"seq": reader.latestOffset()["seq"]}
    )
    rows = [t for p in parts for t in reader.read(p)]
    # the stream's schema order = the exported Iceberg schema order
    # (data columns first, partition columns appended)
    order = [name for name, _ in reader.fields]
    want = sorted(map(tuple, sink.read_committed(spark).select(
        *order).collect()))
    assert sorted(rows) == want
    assert "lang" in order  # the partition column is restored


def test_iceberg_stream_skip_change_commits(spark, sf_dir, tmp_path):
    """skipChangeCommits (iceberg-spark's
    streaming-skip-overwrite-snapshots): a mid-stream mode='full'
    compaction snapshot is skipped entirely — the stream stays alive
    with ZERO duplicate rows and post-compaction appends still stream;
    the default still loud-fails."""
    root = str(tmp_path / "icb-skip")
    sink, df = _build_chain(spark, sf_dir, root, n=3)
    consumed = _reader(root).latestOffset()["seq"]  # drained here
    sink.export_iceberg(mode="full")  # compaction rewrite snapshot
    extra = df.limit(2).withColumn(
        "n_nationkey", F.col("n_nationkey") + 1000
    )
    sink.write_staging(extra, "r3")
    sink.publish("r3")
    sink.export_iceberg()

    schema, part_cols, part_types = _table_schema(root)
    skip = IcebergStreamReader(
        {"path": root, "skipchangecommits": "true"},
        schema,
        part_cols,
        part_types,
    )
    hi = skip.latestOffset()["seq"]
    parts = skip.partitions({"seq": consumed}, {"seq": hi})
    rows = [r for p in parts for r in skip.read(p)]
    assert len(rows) == 2  # ONLY the post-compaction append
    assert all(r[0] >= 1000 for r in rows)
    # default still refuses the rewrite snapshot
    with pytest.raises(ValueError, match="not an append"):
        _reader(root).partitions({"seq": consumed}, {"seq": hi})


def test_iceberg_stream_pipeline_skip_survives_compaction(
    spark, sf_dir, tmp_path
):
    """End-to-end through StreamPipeline.source_iceberg with
    skip_change_commits: checkpointed availableNow runs consume the
    chain, survive a mode='full' compaction between runs with zero
    duplicates, and deliver only the post-compaction append."""
    from incubator_gobblin_spark.streaming.flow import StreamPipeline

    root = str(tmp_path / "icb-pipe-skip")
    sink, df = _build_chain(spark, sf_dir, root, n=2)
    out = str(tmp_path / "pipe-out")
    cp = str(tmp_path / "pipe-cp")

    def run_once():
        q = (
            StreamPipeline(spark)
            .source_iceberg(root, skip_change_commits=True)
            ._source(spark)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == df.count()
    sink.export_iceberg(mode="full")  # compaction between runs
    extra = df.limit(3).withColumn(
        "n_nationkey", F.col("n_nationkey") + 1000
    )
    sink.write_staging(extra, "r9")
    sink.publish("r9")
    sink.export_iceberg()
    run_once()
    got = spark.read.parquet(out)
    assert got.count() == df.count() + 3  # zero duplicates
    assert got.filter(F.col("n_nationkey") >= 1000).count() == 3


def test_iceberg_stream_resolves_renamed_columns_by_field_id(
    spark, tmp_path
):
    """Data files written before a rename carry the OLD parquet column
    name; the stream must match by embedded field id (spec §Schema
    Evolution) — a name-based read would stream nulls for the renamed
    column."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf
    from incubator_gobblin_spark.sinks.iceberg_export import (
        _MANIFEST_LIST_AVRO,
        _manifest_entry_avro,
    )

    root = str(tmp_path / "sren")
    os.makedirs(os.path.join(root, "data"))
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    fp = os.path.join(root, "data", "f1.parquet")
    pq.write_table(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "old_name": pa.array(["a", "b"], pa.string())},
            schema=pa.schema(
                [
                    pa.field("k", pa.int64(),
                             metadata={b"PARQUET:field_id": b"1"}),
                    pa.field("old_name", pa.string(),
                             metadata={b"PARQUET:field_id": b"2"}),
                ]
            ),
        ),
        fp,
    )
    entry_schema = _manifest_entry_avro(
        {"type": "record", "name": "r102", "fields": []}
    )
    manifest = os.path.join(meta_dir, "sren-m0.avro")
    with open(manifest, "wb") as fh:
        fh.write(
            encode_ocf(
                entry_schema,
                [{"status": 1, "snapshot_id": 3, "sequence_number": 1,
                  "file_sequence_number": 1,
                  "data_file": {"content": 0, "file_path": fp,
                                "file_format": "PARQUET", "partition": {},
                                "record_count": 2,
                                "file_size_in_bytes": os.path.getsize(fp)}}],
                codec="null",
                extra_meta={"schema": b"{}", "partition-spec": b"[]",
                            "partition-spec-id": b"0",
                            "format-version": b"2", "content": b"data"},
            )
        )
    mlist = os.path.join(meta_dir, "snap-3-1-sren.avro")
    with open(mlist, "wb") as fh:
        fh.write(
            encode_ocf(
                _MANIFEST_LIST_AVRO,
                [{"manifest_path": manifest,
                  "manifest_length": os.path.getsize(manifest),
                  "partition_spec_id": 0, "content": 0,
                  "sequence_number": 1, "min_sequence_number": 1,
                  "added_snapshot_id": 3, "added_files_count": 1,
                  "existing_files_count": 0, "deleted_files_count": 0,
                  "added_rows_count": 2, "existing_rows_count": 0,
                  "deleted_rows_count": 0}],
                codec="null",
                extra_meta={"format-version": b"2"},
            )
        )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000005",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "new_name", "required": False,
                 "type": "string"},
            ]}
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 3, "sequence-number": 1, "timestamp-ms": 0,
             "summary": {"operation": "append"}, "manifest-list": mlist,
             "schema-id": 0}
        ],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)

    reader = _reader(root)
    hi = reader.latestOffset()["seq"]
    parts = reader.partitions({"seq": 0}, {"seq": hi})
    rows = sorted(r for p in parts for r in reader.read(p))
    assert rows == [(1, "a"), (2, "b")]  # values, not nulls


def test_iceberg_stream_id_files_never_fall_back_to_name(spark, tmp_path):
    """ADVICE r9: id-carrying files must resolve by id ONLY. After a
    rename-then-re-add (old column "a" -> "b", NEW column "a" added
    with a fresh id), a name fallback for the missing id would stream
    the OLD column's values into the new column; the spec requires a
    missing field id in an id-carrying file to read null."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf
    from incubator_gobblin_spark.sinks.iceberg_export import (
        _MANIFEST_LIST_AVRO,
        _manifest_entry_avro,
    )

    root = str(tmp_path / "readd")
    os.makedirs(os.path.join(root, "data"))
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    # file written BEFORE the rename: column "a" is field id 2
    fp = os.path.join(root, "data", "f1.parquet")
    pq.write_table(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "a": pa.array(["old1", "old2"], pa.string())},
            schema=pa.schema(
                [
                    pa.field("k", pa.int64(),
                             metadata={b"PARQUET:field_id": b"1"}),
                    pa.field("a", pa.string(),
                             metadata={b"PARQUET:field_id": b"2"}),
                ]
            ),
        ),
        fp,
    )
    entry_schema = _manifest_entry_avro(
        {"type": "record", "name": "r102", "fields": []}
    )
    manifest = os.path.join(meta_dir, "readd-m0.avro")
    with open(manifest, "wb") as fh:
        fh.write(
            encode_ocf(
                entry_schema,
                [{"status": 1, "snapshot_id": 3, "sequence_number": 1,
                  "file_sequence_number": 1,
                  "data_file": {"content": 0, "file_path": fp,
                                "file_format": "PARQUET", "partition": {},
                                "record_count": 2,
                                "file_size_in_bytes": os.path.getsize(fp)}}],
                codec="null",
                extra_meta={"schema": b"{}", "partition-spec": b"[]",
                            "partition-spec-id": b"0",
                            "format-version": b"2", "content": b"data"},
            )
        )
    mlist = os.path.join(meta_dir, "snap-3-1-readd.avro")
    with open(mlist, "wb") as fh:
        fh.write(
            encode_ocf(
                _MANIFEST_LIST_AVRO,
                [{"manifest_path": manifest,
                  "manifest_length": os.path.getsize(manifest),
                  "partition_spec_id": 0, "content": 0,
                  "sequence_number": 1, "min_sequence_number": 1,
                  "added_snapshot_id": 3, "added_files_count": 1,
                  "existing_files_count": 0, "deleted_files_count": 0,
                  "added_rows_count": 2, "existing_rows_count": 0,
                  "deleted_rows_count": 0}],
                codec="null",
                extra_meta={"format-version": b"2"},
            )
        )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000006",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                # id 2 renamed a -> b; id 3 is a NEW column reusing "a"
                {"id": 2, "name": "b", "required": False,
                 "type": "string"},
                {"id": 3, "name": "a", "required": False,
                 "type": "string"},
            ]}
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 3, "sequence-number": 1, "timestamp-ms": 0,
             "summary": {"operation": "append"}, "manifest-list": mlist,
             "schema-id": 0}
        ],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)

    reader = _reader(root)
    hi = reader.latestOffset()["seq"]
    parts = reader.partitions({"seq": 0}, {"seq": hi})
    rows = sorted(r for p in parts for r in reader.read(p))
    # b streams the old values by id; the re-added "a" streams null —
    # a name fallback would have put "old1"/"old2" in the a slot
    assert rows == [(1, "old1", None), (2, "old2", None)]


def _evolve_to_identity_lang(root):
    """Append a spec-1 identity(lang) partition spec to an
    UNPARTITIONED table's current metadata and make it the default —
    the external-writer spec-evolution shape: existing spec-0 data
    files physically store lang and their partition tuples are
    empty."""
    import json

    meta_dir = os.path.join(root, "metadata")
    v = max(
        int(f[1:].split(".")[0])
        for f in os.listdir(meta_dir)
        if f.endswith(".metadata.json")
    )
    mp = os.path.join(meta_dir, f"v{v}.metadata.json")
    raw = json.load(open(mp))
    lang_id = next(
        f["id"] for f in raw["schemas"][0]["fields"] if f["name"] == "lang"
    )
    raw["partition-specs"].append({
        "spec-id": 1,
        "fields": [{
            "name": "lang", "transform": "identity",
            "source-id": lang_id, "field-id": 1000,
        }],
    })
    raw["default-spec-id"] = 1
    raw["last-partition-id"] = 1000
    json.dump(raw, open(mp, "w"))


def test_stream_spec_evolution_restores_stored_partition_column(
    spark, sf_dir, tmp_path
):
    """Partition evolution (unpartitioned -> identity(lang)): the
    pre-evolution data files physically STORE lang and their partition
    tuples lack the field. The stream reader restored identity columns
    from the DEFAULT spec's part_cols, so those rows streamed lang as
    null — it must resolve per FILE spec and fall back to the parquet
    column, mirroring read_iceberg's _ident rule."""
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        write_iceberg_table,
    )

    root = str(tmp_path / "specevo-stream")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .limit(40)
    )
    write_iceberg_table(spark, docs, root)  # spec 0: unpartitioned
    _evolve_to_identity_lang(root)

    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("icebergstream")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.filter(F.col("lang").isNull()).count() == 0
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_changelog_stream_spec_evolution_restores_partition_column(
    spark, sf_dir, tmp_path
):
    """Same fixture through readchangefeed=true: the changelog splits
    carry each file's own spec_id, so pre-evolution insert rows stream
    lang from the parquet column, not null from the missing partition
    field."""
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        write_iceberg_table,
    )

    root = str(tmp_path / "specevo-cdc")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .limit(40)
    )
    write_iceberg_table(spark, docs, root)
    _evolve_to_identity_lang(root)

    register(spark)
    out, ckpt = str(tmp_path / "outc"), str(tmp_path / "ckptc")
    q = (
        spark.readStream.format("icebergstream")
        .option("path", root)
        .option("readchangefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.filter(F.col("lang").isNull()).count() == 0
    base = got.filter(F.col("_change_type") == "insert").select(
        "doc_id", "lang", "n_chars"
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, docs.collect())
    )
