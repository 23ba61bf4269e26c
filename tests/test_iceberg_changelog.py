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
