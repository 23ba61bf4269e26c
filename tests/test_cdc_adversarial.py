"""Adversarial pass over the r11 CDC surfaces (r11 VERDICT ask 5):

- delta_cdf's cdc-less derivation when the removed file carries a
  STANDING deletion vector (a foreign writer's pure whole-file delete
  on a DV'd table) — the derived deletes must be the live rows only;
- the no-op-DV-commit skip's interaction with CDF sidecars — a
  replayed keyed delete that skips the commit must also reclaim its
  staged _change_data files, leaving no orphans and no phantom CDF
  rows;
- iceberg changelog parent recovery under MIXED position+equality
  delete files in ONE snapshot (the Flink-CDC commit shape), rows hit
  by both deduped — batch and stream faces agree;
- replicate's net-outcome collapse for delete-then-reinsert of the
  same key inside one window (the key must survive with the new row).
"""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.session import load_table  # noqa: E402

CDF_CONF = {"delta.enableChangeDataFeed": "true"}


def test_cdf_derives_remove_of_dv_carrying_file(spark, sf_dir, tmp_path):
    """A cdc-less commit that REMOVES a file carrying a standing DV
    (foreign whole-file delete): the derived CDF deletes must be the
    file's LIVE rows — emitting the DV-dead positions too would
    resurrect already-reported deletes downstream."""
    from incubator_gobblin_spark.sinks.delta_delete import delete_delta_rows
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_cdf import read_delta_changes
    from incubator_gobblin_spark.sources.delta_import import _log_versions

    root = str(tmp_path / "dvrm")
    nat = load_table(spark, sf_dir, "nation").coalesce(1)
    write_delta_table(spark, nat, root, configuration=CDF_CONF)  # v0
    delete_delta_rows(spark, root, "n_nationkey % 3 = 0")  # v1: DV
    log_dir = os.path.join(root, "_delta_log")
    assert _log_versions(log_dir)[-1] == 1

    # hand-author v2: remove the (single) live file, dataChange=true,
    # NO cdc actions, NO re-add — a conformant pure delete commit
    acts = [
        json.loads(line)
        for line in open(os.path.join(log_dir, f"{1:020d}.json"))
        if line.strip()
    ]
    add = next(a["add"] for a in acts if "add" in a)
    assert add.get("deletionVector"), "fixture must carry a DV"
    v2 = [
        {"commitInfo": {"timestamp": 1, "operation": "DELETE"}},
        {
            "remove": {
                "path": add["path"],
                "deletionTimestamp": 1,
                "dataChange": True,
                "partitionValues": add.get("partitionValues") or {},
                "deletionVector": add["deletionVector"],
            }
        },
    ]
    with open(os.path.join(log_dir, f"{2:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in v2) + "\n")

    ch = read_delta_changes(spark, root, 2, 2)
    assert ch.select("_change_type").distinct().collect()[0][0] == "delete"
    got = sorted(r.n_nationkey for r in ch.collect())
    want = sorted(
        r.n_nationkey for r in nat.filter("n_nationkey % 3 <> 0").collect()
    )
    assert got == want  # live rows only — never the DV-dead ones


def test_noop_replayed_delete_reclaims_cdc_sidecars(
    spark, sf_dir, tmp_path
):
    """A replayed keyed DELETE whose every matched position is already
    dead skips the commit (no new version) AND reclaims its staged
    _change_data files — orphan cdc parquet would survive vacuum
    forever, and a phantom commit would double-report the deletes."""
    from incubator_gobblin_spark.sinks.delta_delete import delete_delta_rows
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_cdf import read_delta_changes
    from incubator_gobblin_spark.sources.delta_import import _log_versions

    root = str(tmp_path / "noop")
    nat = load_table(spark, sf_dir, "nation")
    write_delta_table(spark, nat, root, configuration=CDF_CONF)  # v0
    ids = nat.filter("n_nationkey % 4 = 1").select("n_nationkey")
    delete_delta_rows(spark, root, ids=ids, on=["n_nationkey"])  # v1
    log_dir = os.path.join(root, "_delta_log")
    assert _log_versions(log_dir)[-1] == 1

    def _cdc_files():
        cdir = os.path.join(root, "_change_data")
        if not os.path.isdir(cdir):
            return set()
        return {
            os.path.join(dp, f)
            for dp, _, fs in os.walk(cdir)
            for f in fs
        }

    before = _cdc_files()
    assert before, "the first keyed delete must stage cdc files"

    # the replay: identical keys, all already dead
    res = delete_delta_rows(spark, root, ids=ids, on=["n_nationkey"])
    assert res["rows_deleted"] == 0
    assert _log_versions(log_dir)[-1] == 1  # no new version
    assert _cdc_files() == before  # no orphan sidecars left behind
    # CDF over the whole history reports the delete exactly once
    ch = read_delta_changes(spark, root, 0)
    dels = ch.filter("_change_type = 'delete'")
    assert sorted(r.n_nationkey for r in dels.collect()) == sorted(
        r.n_nationkey for r in ids.collect()
    )


def _merge_pos_and_eq_into_one_snapshot(root: str) -> None:
    """Rewrite the table at ``root`` (s0=data, s1=pos deletes, s2=eq
    deletes) into (s0, s2') where s2' carries BOTH delete manifests in
    one snapshot — the Flink-CDC commit shape (same-checkpoint
    position + equality deletes)."""
    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf
    from incubator_gobblin_spark.sinks.iceberg_export import (
        _MANIFEST_LIST_AVRO,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        _decode_avro_rows,
        _local_path,
        current_metadata,
    )

    meta_dir = os.path.join(root, "metadata")
    meta = current_metadata(root)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    s0, s1, s2 = snaps

    def _mlist_rows(snap):
        p = _local_path(snap["manifest-list"])
        if not os.path.isabs(p):
            p = os.path.join(root, p)
        return _decode_avro_rows(p)

    rows2 = _mlist_rows(s2)
    pos_rows = [r for r in _mlist_rows(s1) if r.get("content") == 1]
    assert pos_rows, "s1 must carry a delete manifest"
    merged = rows2 + [
        r
        for r in pos_rows
        if r["manifest_path"]
        not in {x["manifest_path"] for x in rows2}
    ]
    mpath = os.path.join(meta_dir, "snap-merged-mixed.avro")
    with open(mpath, "wb") as fh:
        fh.write(
            encode_ocf(
                _MANIFEST_LIST_AVRO,
                merged,
                codec="null",
                extra_meta={"format-version": b"2"},
            )
        )
    s2m = dict(s2)
    s2m["manifest-list"] = mpath
    s2m["parent-snapshot-id"] = s0["snapshot-id"]
    v = max(
        int(f[1:].split(".")[0])
        for f in os.listdir(meta_dir)
        if f.endswith(".metadata.json")
    )
    raw = json.load(open(os.path.join(meta_dir, f"v{v}.metadata.json")))
    raw["snapshots"] = [
        s for s in raw["snapshots"]
        if s["snapshot-id"] in (s0["snapshot-id"], s2["snapshot-id"])
    ]
    for s in raw["snapshots"]:
        if s["snapshot-id"] == s2["snapshot-id"]:
            s["manifest-list"] = mpath
            s["parent-snapshot-id"] = s0["snapshot-id"]
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(raw, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(v + 1))


def test_changelog_mixed_pos_and_eq_deletes_one_snapshot(
    spark, sf_dir, tmp_path
):
    """ONE snapshot carrying BOTH a position-delete file and an
    equality-delete file (the Flink-CDC checkpoint shape), with
    overlapping hits: the changelog must emit each killed row exactly
    ONCE (coordinate dedupe across tombstone kinds), batch and stream
    agreeing with the snapshot reader's survivor set."""
    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sinks.iceberg_export import (
        append_equality_deletes,
        append_position_deletes,
    )
    from incubator_gobblin_spark.sources import iceberg_stream
    from incubator_gobblin_spark.sources.iceberg_changelog import (
        read_iceberg_changelog,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
        snapshot_files,
    )

    root = str(tmp_path / "mixed")
    sink = FileSink(
        path=root, commit_mode="manifest", table_type=TableType.APPEND_ONLY
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .coalesce(1)
    )
    sink.write_staging(docs, "base")
    sink.publish("base")
    sink.export_iceberg()  # s0

    meta = current_metadata(root)
    files = snapshot_files(meta, root, meta["current-snapshot-id"])
    assert len(files) == 1
    data_path = files[0]["path"]
    # positions are file row order = the written DataFrame order
    rows = docs.collect()
    pos_kill = [i for i, r in enumerate(rows) if r.doc_id % 6 == 1][:20]
    pos_ids = {rows[i].doc_id for i in pos_kill}
    eq_ids = {r.doc_id for r in rows if r.doc_id % 9 == 1}
    overlap = pos_ids & eq_ids
    assert overlap, "fixture needs rows hit by BOTH tombstone kinds"

    append_position_deletes(root, [(data_path, i) for i in pos_kill])  # s1
    append_equality_deletes(
        root, [{"doc_id": int(k)} for k in sorted(eq_ids)], ["doc_id"]
    )  # s2
    _merge_pos_and_eq_into_one_snapshot(root)  # (s0, s2'|mixed)

    killed = pos_ids | eq_ids
    survivors = [tuple(r) for r in rows if r.doc_id not in killed]
    assert sorted(
        map(tuple, read_iceberg(spark, root).collect())
    ) == sorted(survivors)

    meta = current_metadata(root)
    s0_id = next(
        s["snapshot-id"]
        for s in meta["snapshots"]
        if s.get("parent-snapshot-id") is None
    )
    ch = read_iceberg_changelog(spark, root, s0_id)
    assert (
        ch.select("_change_type").distinct().collect()[0][0] == "delete"
    )
    got = sorted(r.doc_id for r in ch.collect())
    assert got == sorted(killed), "each killed row exactly once"

    # the STREAM face agrees
    iceberg_stream.register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
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
    sdels = spark.read.parquet(out).filter("_change_type = 'delete'")
    assert sorted(r.doc_id for r in sdels.collect()) == sorted(killed)


def test_replicate_delete_then_reinsert_same_key_one_window(
    spark, sf_dir, tmp_path
):
    """Delete-then-reinsert of one key inside a single replication
    window: the net outcome is the REINSERTED row (never a deletion,
    never the old row) — both job directions."""
    from incubator_gobblin_spark.jobs.replicate import (
        replicate_delta_to_iceberg,
        replicate_iceberg_to_delta,
    )
    from incubator_gobblin_spark.sinks.delta_delete import delete_delta_rows
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sinks.iceberg_delete import (
        delete_iceberg_rows,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.delta_import import read_delta
    from incubator_gobblin_spark.sources.iceberg_import import read_iceberg

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    reborn = docs.filter("doc_id = 0").withColumn(
        "n_chars", F.col("n_chars") * 0 - 77
    )

    # Delta -> Iceberg
    src_d = str(tmp_path / "src_d")
    dst_i = str(tmp_path / "dst_i")
    write_delta_table(spark, docs, src_d, configuration=CDF_CONF)
    replicate_delta_to_iceberg(spark, src_d, dst_i, on="doc_id")
    delete_delta_rows(spark, src_d, "doc_id = 0")      # v1
    merge_delta_rows(spark, src_d, reborn, on="doc_id")  # v2
    replicate_delta_to_iceberg(spark, src_d, dst_i, on="doc_id")
    got = read_iceberg(spark, dst_i).filter("doc_id = 0").collect()
    assert len(got) == 1 and got[0].n_chars == -77
    assert sorted(map(tuple, read_iceberg(spark, dst_i).collect())) == \
        sorted(map(tuple, read_delta(spark, src_d).collect()))

    # Iceberg -> Delta
    src_i = str(tmp_path / "src_i")
    dst_d = str(tmp_path / "dst_d")
    write_iceberg_table(spark, docs, src_i)
    replicate_iceberg_to_delta(spark, src_i, dst_d, on="doc_id")
    delete_iceberg_rows(spark, src_i, "doc_id = 0")       # s1
    upsert_iceberg_rows(spark, src_i, reborn, on="doc_id")  # s2
    replicate_iceberg_to_delta(spark, src_i, dst_d, on="doc_id")
    got = read_delta(spark, dst_d).filter("doc_id = 0").collect()
    assert len(got) == 1 and got[0].n_chars == -77
    assert sorted(map(tuple, read_delta(spark, dst_d).collect())) == \
        sorted(map(tuple, read_iceberg(spark, src_i).collect()))
