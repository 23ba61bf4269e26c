"""Cross-format CDC replication (jobs/replicate.py): Iceberg -> Delta
via the changelog scan + txn-watermarked delete/merge, Delta -> Iceberg
via the change data feed + one atomic equality-delete/append commit
with the consumed version in the table properties. Each direction:
bootstrap, incremental window with updates AND deletes, no-op re-run,
and watermark monotonicity."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.jobs.replicate import (  # noqa: E402
    replicate_delta_to_iceberg,
    replicate_iceberg_to_delta,
)
from incubator_gobblin_spark.session import load_table  # noqa: E402

COLS = ["doc_id", "lang", "n_chars"]


def _rows(df, cols=COLS):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_replicate_iceberg_to_delta(spark, sf_dir, tmp_path):
    from incubator_gobblin_spark.sinks.iceberg_delete import (
        delete_iceberg_rows,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        last_txn_actions,
        read_delta,
    )
    from incubator_gobblin_spark.sources.iceberg_import import read_iceberg

    src = str(tmp_path / "src_iceberg")
    dst = str(tmp_path / "dst_delta")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_iceberg_table(spark, docs, src, partition_by=["lang"])

    r0 = replicate_iceberg_to_delta(spark, src, dst, on="doc_id")
    assert r0["bootstrapped"]
    assert _rows(read_delta(spark, dst)) == _rows(docs)

    # src moves: a predicate DELETE + a CDC upsert
    delete_iceberg_rows(spark, src, "doc_id % 6 = 3")
    live = docs.filter("doc_id % 6 <> 3")
    updates = live.filter("doc_id % 7 = 0").withColumn(
        "n_chars", F.col("n_chars") + 11
    )
    inserts = docs.filter("doc_id < 3").withColumn(
        "doc_id", F.col("doc_id") + 700000
    )
    upsert_iceberg_rows(
        spark, src, updates.unionByName(inserts), on="doc_id"
    )

    r1 = replicate_iceberg_to_delta(spark, src, dst, on="doc_id")
    assert not r1["bootstrapped"] and r1["keys_deleted"] > 0
    assert _rows(read_delta(spark, dst)) == _rows(read_iceberg(spark, src))
    app = f"iceberg-repl:{os.path.abspath(src)}"
    log_dir = os.path.join(dst, "_delta_log")
    wm1 = last_txn_actions(log_dir)[app]["version"]
    assert wm1 == r1["to_sequence"]

    # idle src: the run is a pure no-op (no new dst version)
    v = _log_versions(log_dir)[-1]
    r2 = replicate_iceberg_to_delta(spark, src, dst, on="doc_id")
    assert r2["to_sequence"] == r2["from_sequence"] == wm1
    assert _log_versions(log_dir)[-1] == v

    # a dst not bootstrapped by this replication refuses
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        write_delta_table,
    )

    alien = str(tmp_path / "alien")
    write_delta_table(spark, docs, alien)
    with pytest.raises(ValueError, match="bootstrapped"):
        replicate_iceberg_to_delta(spark, src, alien, on="doc_id")


def test_replicate_delta_to_iceberg(spark, sf_dir, tmp_path):
    from incubator_gobblin_spark.sinks.delta_delete import (
        delete_delta_rows,
    )
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_import import read_delta
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    src = str(tmp_path / "src_delta")
    dst = str(tmp_path / "dst_iceberg")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_delta_table(
        spark,
        docs,
        src,
        configuration={"delta.enableChangeDataFeed": "true"},
    )

    r0 = replicate_delta_to_iceberg(spark, src, dst, on="doc_id")
    assert r0["bootstrapped"]
    assert _rows(read_iceberg(spark, dst)) == _rows(docs)

    # src moves: MERGE (updates + inserts) then a DV DELETE
    updates = docs.filter("doc_id % 8 = 0").withColumn(
        "n_chars", F.col("n_chars") + 3
    )
    inserts = docs.filter("doc_id < 2").withColumn(
        "doc_id", F.col("doc_id") + 600000
    )
    merge_delta_rows(
        spark, src, updates.unionByName(inserts), on="doc_id"
    )
    delete_delta_rows(spark, src, "doc_id % 9 = 1")

    r1 = replicate_delta_to_iceberg(spark, src, dst, on="doc_id")
    assert not r1["bootstrapped"] and r1["to_version"] == 2
    assert _rows(read_iceberg(spark, dst)) == _rows(read_delta(spark, src))
    prop_key = f"replication.delta.version.{os.path.abspath(src)}"
    assert current_metadata(dst)["properties"][prop_key] == "2"

    # idle src: no-op, no new dst metadata version
    snap_before = current_metadata(dst)["current-snapshot-id"]
    r2 = replicate_delta_to_iceberg(spark, src, dst, on="doc_id")
    assert r2["from_version"] == r2["to_version"] == 2
    assert current_metadata(dst)["current-snapshot-id"] == snap_before

    # insert-then-delete window: the collapse nets to a DELETE of keys
    # dst never saw — the equality deletes match nothing, state is
    # unchanged, the watermark still advances atomically
    ghosts = docs.filter("doc_id < 2").withColumn(
        "doc_id", F.col("doc_id") + 880000
    )
    merge_delta_rows(spark, src, ghosts, on="doc_id")          # v3
    delete_delta_rows(spark, src, "doc_id >= 880000")           # v4
    r3 = replicate_delta_to_iceberg(spark, src, dst, on="doc_id")
    assert r3["to_version"] == 4 and r3["rows_upserted"] == 0
    assert current_metadata(dst)["properties"][prop_key] == "4"
    assert _rows(read_iceberg(spark, dst)) == _rows(read_delta(spark, src))

    # genuinely change-free window (OPTIMIZE only, dataChange=false):
    # the watermark advances via a properties-only version
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        compact_delta_files,
    )

    compact_delta_files(
        spark, src, target_file_bytes=1 << 30, small_file_bytes=1 << 30
    )  # v5
    snap_b4 = current_metadata(dst)["current-snapshot-id"]
    r4 = replicate_delta_to_iceberg(spark, src, dst, on="doc_id")
    assert r4["to_version"] == 5
    assert r4["rows_upserted"] == 0 and r4["keys_deleted"] == 0
    assert current_metadata(dst)["properties"][prop_key] == "5"
    # properties-only: the data snapshot did not move
    assert current_metadata(dst)["current-snapshot-id"] == snap_b4
    assert _rows(read_iceberg(spark, dst)) == _rows(read_delta(spark, src))


def test_replicate_iceberg_to_delta_crash_between_commits(
    spark, sf_dir, tmp_path, monkeypatch
):
    """A crash AFTER the delete commit but BEFORE the txn-stamped
    merge replays the whole window: the replayed deletes are
    zero-match (no commit), the merge runs once — state converges with
    no duplicates and the watermark lands exactly once."""
    import incubator_gobblin_spark.jobs.replicate as R
    from incubator_gobblin_spark.sinks.iceberg_delete import (
        delete_iceberg_rows,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        last_txn_actions,
        read_delta,
    )
    from incubator_gobblin_spark.sources.iceberg_import import read_iceberg

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    write_iceberg_table(spark, docs, src)
    replicate_iceberg_to_delta(spark, src, dst, on="doc_id")

    delete_iceberg_rows(spark, src, "doc_id % 4 = 1")
    ups = docs.filter("doc_id % 4 <> 1").filter("doc_id % 5 = 0").withColumn(
        "n_chars", F.col("n_chars") + 2
    )
    upsert_iceberg_rows(spark, src, ups, on="doc_id")

    # crash injection: the merge dies AFTER the window's deletes landed
    import incubator_gobblin_spark.sinks.delta_maintenance as DM

    real_merge = DM.merge_delta_rows
    boom = {"armed": True}

    def exploding_merge(*a, **kw):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated crash before the merge commit")
        return real_merge(*a, **kw)

    monkeypatch.setattr(R, "_net_outcome", R._net_outcome)  # no-op anchor
    monkeypatch.setattr(DM, "merge_delta_rows", exploding_merge)
    # replicate imports merge_delta_rows inside the function body, so
    # the patched module attribute is what it resolves
    with pytest.raises(RuntimeError, match="simulated crash"):
        replicate_iceberg_to_delta(spark, src, dst, on="doc_id")

    log_dir = os.path.join(dst, "_delta_log")
    app = f"iceberg-repl:{os.path.abspath(src)}"
    # the watermark did NOT advance (the dying merge owned the stamp)
    assert last_txn_actions(log_dir).get(app, {}).get("version") == 1

    # the re-run replays the window and converges
    v_before = _log_versions(log_dir)[-1]
    r = replicate_iceberg_to_delta(spark, src, dst, on="doc_id")
    assert r["to_sequence"] > 1
    got = _rows(read_delta(spark, dst))
    assert got == _rows(read_iceberg(spark, src))
    # the replayed deletes were zero-match: only the merge committed
    assert _log_versions(log_dir)[-1] == v_before + 1
    assert last_txn_actions(log_dir)[app]["version"] == r["to_sequence"]
