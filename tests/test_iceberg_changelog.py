"""Iceberg incremental changelog scan (iceberg-core
IncrementalChangelogScan semantics): net row-level changes between two
snapshots — appends as inserts, position/equality delete files as
deletes recovered from the parent snapshot, CDC upserts as
delete+insert pairs, compaction (replace) invisible, and windowed
scans by ancestor lineage."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.session import load_table  # noqa: E402
from incubator_gobblin_spark.sinks.iceberg_delete import (  # noqa: E402
    delete_iceberg_rows,
)
from incubator_gobblin_spark.sinks.iceberg_maintenance import (  # noqa: E402
    rewrite_iceberg_data_files,
    upsert_iceberg_rows,
    write_iceberg_table,
)
from incubator_gobblin_spark.sources.iceberg_changelog import (  # noqa: E402
    read_iceberg_changelog,
)
from incubator_gobblin_spark.sources.iceberg_import import (  # noqa: E402
    current_metadata,
    read_iceberg,
)

COLS = ["doc_id", "lang", "n_chars"]


def _rows(df, cols=COLS):
    return sorted(map(tuple, df.select(*cols).collect()))


def _snapshot_ids(root):
    meta = current_metadata(root)
    return [s["snapshot-id"] for s in meta["snapshots"]]


def test_changelog_delete_upsert_rewrite(spark, sf_dir, tmp_path):
    root = str(tmp_path / "cl1")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_iceberg_table(spark, docs, root, partition_by=["lang"])  # s0
    delete_iceberg_rows(spark, root, "doc_id % 5 = 2")  # s1: pos deletes
    after_s1 = docs.filter("doc_id % 5 <> 2")

    updates = after_s1.filter("doc_id % 7 = 0").withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    inserts = docs.filter("doc_id < 4").withColumn(
        "doc_id", F.col("doc_id") + 900000
    )
    source = updates.unionByName(inserts)
    upsert_iceberg_rows(spark, root, source, on="doc_id")  # s2: eq del + add
    rewrite_iceberg_data_files(spark, root)  # s3: replace — invisible

    s0, s1, s2, s3 = _snapshot_ids(root)

    ch = read_iceberg_changelog(spark, root, None)
    # s0: every base row inserted at ordinal 0
    c0 = ch.filter(f"_commit_snapshot_id = {s0}")
    assert c0.select("_change_type").distinct().collect()[0][0] == "insert"
    assert _rows(c0) == _rows(docs)
    assert c0.select("_change_ordinal").distinct().collect()[0][0] == 0
    # s1: the predicate rows deleted
    c1 = ch.filter(f"_commit_snapshot_id = {s1}")
    assert c1.select("_change_type").distinct().collect()[0][0] == "delete"
    assert _rows(c1) == _rows(docs.filter("doc_id % 5 = 2"))
    # s2: upsert = superseded parent rows deleted + all source inserted.
    # NOTE: the upsert's equality deletes name every source key, so the
    # delete side is the PARENT rows whose key appears in the source —
    # exactly the updated rows (inserted keys match nothing).
    c2 = ch.filter(f"_commit_snapshot_id = {s2}")
    assert _rows(c2.filter("_change_type = 'delete'")) == _rows(
        after_s1.filter("doc_id % 7 = 0")
    )
    assert _rows(c2.filter("_change_type = 'insert'")) == _rows(source)
    # s3: replace emits nothing
    assert ch.filter(f"_commit_snapshot_id = {s3}").count() == 0

    # replay proof: inserts minus later deletes rebuild the final state
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("_change_ordinal").desc(),
        # within one snapshot (CDC upsert) the insert supersedes
        F.when(F.col("_change_type") == "insert", 1).otherwise(0).desc(),
    )
    last = (
        ch.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter("_change_type = 'insert'")
    )
    assert _rows(last) == _rows(read_iceberg(spark, root))

    # windowed scan: only s2's changes, ordinal rebased to 0
    ch2 = read_iceberg_changelog(spark, root, s1, s2)
    assert ch2.count() == c2.count()
    assert ch2.select("_change_ordinal").distinct().collect()[0][0] == 0

    # empty window
    assert read_iceberg_changelog(spark, root, s3, s3).count() == 0

    # non-ancestor from-snapshot refuses
    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_changelog(spark, root, 999999, s3)


def test_changelog_update_pairing_and_expired_parent(
    spark, sf_dir, tmp_path
):
    """identifier_fields pairs same-snapshot delete+insert of one key
    into update_preimage/update_postimage (iceberg-spark
    create_changelog_view compute-updates); a changelog whose oldest
    snapshot has an EXPIRED parent refuses with guidance instead of
    crashing."""
    from incubator_gobblin_spark.sinks.iceberg_export import (
        expire_iceberg_snapshots,
    )

    root = str(tmp_path / "cl2")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_iceberg_table(spark, docs, root)  # s0
    updates = docs.filter("doc_id % 7 = 0").withColumn(
        "n_chars", F.col("n_chars") + 1
    )
    inserts = docs.filter("doc_id < 2").withColumn(
        "doc_id", F.col("doc_id") + 800000
    )
    upsert_iceberg_rows(
        spark, root, updates.unionByName(inserts), on="doc_id"
    )  # s1
    s0, s1 = _snapshot_ids(root)

    ch = read_iceberg_changelog(
        spark, root, s0, s1, identifier_fields=["doc_id"]
    )
    # updated keys render as pre/post pairs; brand-new keys stay insert
    assert _rows(ch.filter("_change_type = 'update_preimage'")) == _rows(
        docs.filter("doc_id % 7 = 0")
    )
    assert _rows(ch.filter("_change_type = 'update_postimage'")) == _rows(
        updates
    )
    assert _rows(ch.filter("_change_type = 'insert'")) == _rows(inserts)
    assert ch.filter("_change_type = 'delete'").count() == 0

    # unknown identifier column refuses
    with pytest.raises(ValueError, match="identifier_fields"):
        read_iceberg_changelog(
            spark, root, s0, s1, identifier_fields=["nope"]
        )

    # expire s0 (this engine's expire clears the survivor's parent
    # pointer): the full-history changelog serves the EFFECTIVE state
    # as the initial batch — its own delete files applied, never the
    # superseded raw rows
    expire_iceberg_snapshots(root, keep_last=1)
    boot = read_iceberg_changelog(spark, root, None)
    assert (
        boot.select("_change_type").distinct().collect()[0][0] == "insert"
    )
    assert _rows(boot) == _rows(read_iceberg(spark, root))

    # foreign-style expiry keeps a DANGLING parent pointer
    # (iceberg-core RemoveSnapshots) — that head refuses with guidance
    import json as _json

    meta_dir = os.path.join(root, "metadata")
    v = sorted(
        int(f[1:].split(".")[0])
        for f in os.listdir(meta_dir)
        if f.endswith(".metadata.json")
    )[-1]
    mpath = os.path.join(meta_dir, f"v{v}.metadata.json")
    m = _json.load(open(mpath))
    m["snapshots"][0]["parent-snapshot-id"] = 999999
    _json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="expired"):
        read_iceberg_changelog(spark, root, None)


def test_changelog_partition_scoped_equality_delete(
    spark, sf_dir, tmp_path
):
    """A foreign writer's PARTITION-SCOPED equality delete (q137's
    shape) attributes deletes to the scoped partition only — the
    changelog must kill exactly the in-scope keys, never the same
    keys in other partitions."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sinks.iceberg_export import (
        append_equality_deletes,
    )

    root = str(tmp_path / "scoped")
    sink = FileSink(
        path=root,
        commit_mode="manifest",
        table_type=TableType.APPEND_ONLY,
        partition_by=["lang"],
    )
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    sink.write_staging(docs, "base")
    sink.publish("base")
    sink.export_iceberg()  # s0

    first_lang = docs.agg(F.min("lang")).collect()[0][0]
    keys = sorted(
        int(r.doc_id)
        for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()
    )
    append_equality_deletes(
        root,
        [{"doc_id": k} for k in keys],
        ["doc_id"],
        partition_scope={"lang": first_lang},
    )  # s1
    s0, s1 = _snapshot_ids(root)

    ch = read_iceberg_changelog(spark, root, s0, s1)
    expect = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("lang") == first_lang)
    )
    assert expect.count() > 0
    assert _rows(ch) == _rows(expect)
    assert ch.select("_change_type").distinct().collect()[0][0] == "delete"
    # cross-check: the snapshot reader and the applied changelog agree
    assert _rows(read_iceberg(spark, root)) == _rows(
        docs.exceptAll(expect)
    )


def test_changelog_removed_data_files_emit_parent_rows_as_deletes(
    spark, sf_dir, tmp_path
):
    """A snapshot that REMOVES whole data files (a foreign writer's
    copy-on-write overwrite; this engine's re-export after a lake
    merge) contributes the rows live in them at the parent snapshot as
    ``delete``. Regression: r11 shipped `_abs_path` (undefined) on
    this path — any removed-data-file snapshot raised NameError
    (r12 ADVICE high)."""
    from incubator_gobblin_spark.sinks.files import FileSink

    root = str(tmp_path / "cow")
    sink = FileSink(path=root, commit_mode="manifest")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    sink.write_staging(docs.repartition(4), "base")
    sink.publish("base")
    sink.export_iceberg()  # s0: append

    # lake-side CDC merge rewrites the touched files; the re-export is
    # an OVERWRITE snapshot: removed data files + added data files
    cdc = docs.filter("doc_id % 10 = 3").withColumn(
        "op", F.lit("delete")
    )
    sink.merge_into(spark, cdc, on=["doc_id"], run_id="m1", op_col="op")
    sink.export_iceberg()  # s1: overwrite
    s0, s1 = _snapshot_ids(root)
    meta = current_metadata(root)
    assert (
        next(s for s in meta["snapshots"] if s["snapshot-id"] == s1)[
            "summary"
        ]["operation"]
        == "overwrite"
    )

    ch = read_iceberg_changelog(spark, root, s0, s1)
    dels = ch.filter("_change_type = 'delete'")
    ins = ch.filter("_change_type = 'insert'")
    # survivor rows of rewritten files ride as delete+insert pairs (the
    # per-file form cannot cancel them), so assert the NET outcome:
    # parent state + changelog == final state, and the actually-deleted
    # keys appear ONLY on the delete side
    gone = docs.filter("doc_id % 10 = 3")
    assert gone.count() > 0
    assert _rows(dels.join(gone.select("doc_id"), "doc_id", "left_semi")) \
        == _rows(gone)
    assert ins.join(gone.select("doc_id"), "doc_id", "left_semi").count() == 0
    parent = read_iceberg(spark, root, snapshot_id=s0)
    final = read_iceberg(spark, root, snapshot_id=s1)
    assert _rows(parent.exceptAll(dels.select(*COLS)).unionByName(
        ins.select(*COLS)
    )) == _rows(final)


def test_changelog_added_foreign_files_resolve_by_field_id(spark, tmp_path):
    """Changelog INSERTS from files added by a conformant foreign
    writer (parquet field ids, pre-rename column names) must resolve
    columns by ID like the snapshot reader — a name-based read would
    null-fill the renamed column in changelog output only (r12 ADVICE
    low). Two hand-authored snapshots: s0 adds a plain engine-style
    file under the current name, s1 adds a foreign id-carrying file
    under the OLD name."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf
    from incubator_gobblin_spark.sinks.iceberg_export import (
        _MANIFEST_LIST_AVRO,
        _manifest_entry_avro,
    )

    root = str(tmp_path / "clren")
    os.makedirs(os.path.join(root, "data"))
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    # s0's file: engine-style, no ids, current (renamed) column name
    fb = os.path.join(root, "data", "fb.parquet")
    pq.write_table(
        pa.table({"k": pa.array([3], pa.int64()),
                  "new_name": pa.array(["c"], pa.string())}),
        fb,
    )
    # s1's file: foreign writer — field ids, column still named old_name
    fa = os.path.join(root, "data", "fa.parquet")
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
        fa,
    )

    entry_schema = _manifest_entry_avro(
        {"type": "record", "name": "r102", "fields": []}
    )

    def _manifest(name, snap_id, seq, fp, rc):
        p = os.path.join(meta_dir, name)
        with open(p, "wb") as fh:
            fh.write(
                encode_ocf(
                    entry_schema,
                    [{"status": 1, "snapshot_id": snap_id,
                      "sequence_number": seq, "file_sequence_number": seq,
                      "data_file": {
                          "content": 0, "file_path": fp,
                          "file_format": "PARQUET", "partition": {},
                          "record_count": rc,
                          "file_size_in_bytes": os.path.getsize(fp)}}],
                    codec="null",
                    extra_meta={"schema": b"{}", "partition-spec": b"[]",
                                "partition-spec-id": b"0",
                                "format-version": b"2", "content": b"data"},
                )
            )
        return p

    def _mlist(name, entries):
        p = os.path.join(meta_dir, name)
        with open(p, "wb") as fh:
            fh.write(
                encode_ocf(
                    _MANIFEST_LIST_AVRO,
                    [{"manifest_path": mp,
                      "manifest_length": os.path.getsize(mp),
                      "partition_spec_id": 0, "content": 0,
                      "sequence_number": seq, "min_sequence_number": seq,
                      "added_snapshot_id": sid, "added_files_count": 1,
                      "existing_files_count": 0, "deleted_files_count": 0,
                      "added_rows_count": rc, "existing_rows_count": 0,
                      "deleted_rows_count": 0}
                     for mp, sid, seq, rc in entries],
                    codec="null",
                    extra_meta={"format-version": b"2"},
                )
            )
        return p

    m0 = _manifest("clren-m0.avro", 10, 1, fb, 1)
    m1 = _manifest("clren-m1.avro", 11, 2, fa, 2)
    ml0 = _mlist("snap-10-1-clren.avro", [(m0, 10, 1, 1)])
    ml1 = _mlist("snap-11-1-clren.avro", [(m0, 10, 1, 1), (m1, 11, 2, 2)])
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000000c",
        "location": root,
        "last-sequence-number": 2,
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
        "current-snapshot-id": 11,
        "snapshots": [
            {"snapshot-id": 10, "sequence-number": 1, "timestamp-ms": 0,
             "summary": {"operation": "append"}, "manifest-list": ml0,
             "schema-id": 0},
            {"snapshot-id": 11, "sequence-number": 2, "timestamp-ms": 1,
             "parent-snapshot-id": 10,
             "summary": {"operation": "append"}, "manifest-list": ml1,
             "schema-id": 0},
        ],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)

    ch = read_iceberg_changelog(spark, root, None)
    got = sorted(
        map(tuple, ch.select("k", "new_name", "_commit_snapshot_id")
            .collect())
    )
    # the foreign file's old_name values surface under new_name —
    # never null
    assert got == [(1, "a", 11), (2, "b", 11), (3, "c", 10)]


def test_chunked_changelog_matches_unbounded_and_resumes(
    spark, sf_dir, tmp_path
):
    """read_iceberg_changelog_chunked over a backlog deeper than the
    chunk size: (1) concatenating every chunk equals one unbounded
    call row-for-row (ordinals rebased globally); (2) the crash-resume
    contract — restart from a committed chunk watermark yields exactly
    the un-applied suffix (parity with jobs/replicate.py's loop)."""
    from incubator_gobblin_spark.sources.iceberg_changelog import (
        read_iceberg_changelog_chunked,
    )

    root = str(tmp_path / "chunked")
    docs = load_table(spark, sf_dir, "documents").select(*COLS).limit(60)
    write_iceberg_table(spark, docs, root)  # s0
    # 5 more commits: deletes and upserts
    delete_iceberg_rows(spark, root, "doc_id % 9 = 1")
    for bump in range(1, 5):
        upsert_iceberg_rows(
            spark, root,
            docs.limit(4).withColumn("n_chars", F.col("n_chars") + bump),
            on="doc_id",
        )
    all_cols = [*COLS, "_change_type", "_change_ordinal",
                "_commit_snapshot_id"]
    want = sorted(map(tuple, read_iceberg_changelog(
        spark, root, None, max_snapshots=64
    ).select(*all_cols).collect()))

    chunks = list(read_iceberg_changelog_chunked(
        spark, root, None, chunk_snapshots=2
    ))
    assert len(chunks) == 3  # 6 snapshots / 2 per chunk
    assert [i["ordinal_base"] for i, _ in chunks] == [0, 2, 4]
    # chunk watermarks are the chain's snapshot ids, oldest-first
    sids = _snapshot_ids(root)
    assert [i["to_snapshot_id"] for i, _ in chunks] == [
        sids[1], sids[3], sids[5]
    ]
    got = sorted(
        t
        for _, df in chunks
        for t in map(tuple, df.select(*all_cols).collect())
    )
    assert got == want

    # crash after applying chunk 1 (watermark = its to_snapshot_id):
    # the restarted generator yields ONLY the remaining chunks
    wm = chunks[0][0]["to_snapshot_id"]
    resumed = list(read_iceberg_changelog_chunked(
        spark, root, wm, chunk_snapshots=2
    ))
    assert [i["to_snapshot_id"] for i, _ in resumed] == [sids[3], sids[5]]
    # resumed ordinals rebase from 0 (a fresh consumer epoch), but the
    # ROWS are exactly the suffix
    tail_want = sorted(
        t
        for _, df in chunks[1:]
        for t in map(
            tuple, df.select(*COLS, "_change_type",
                             "_commit_snapshot_id").collect()
        )
    )
    tail_got = sorted(
        t
        for _, df in resumed
        for t in map(
            tuple, df.select(*COLS, "_change_type",
                             "_commit_snapshot_id").collect()
        )
    )
    assert tail_got == tail_want

    # an up-to-date watermark yields nothing
    assert list(read_iceberg_changelog_chunked(
        spark, root, sids[5], chunk_snapshots=2
    )) == []
