"""Property-based CDC replay proofs (hypothesis): for RANDOM bounded
sequences of table operations, the change feed's net replay must
reconstruct the final snapshot exactly —

- Iceberg: {CDC upsert, predicate delete, compaction} → the batch
  changelog's last-change-per-key replay == read_iceberg;
- Delta: {MERGE, DV delete, OPTIMIZE} on a CDF table → the feed's
  net outcome == read_delta.

These catch composition bugs no single-shape fixture does: deletes of
already-updated keys, upserts resurrecting deleted keys, compaction
interleaved anywhere, repeated touches of the same key across
operations. Examples are few and small (bounded rows/ops) — this is a
correctness net, not a load test.
"""

import os
import shutil
import sys
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.session import load_table  # noqa: E402

import pytest

# Hypothesis replay proofs: correctness net, not per-commit gating — the slow
# marker keeps the default run inside the driver verify budget
# (run with -m slow; must stay green before every round)
pytestmark = pytest.mark.slow

COLS = ["doc_id", "lang", "n_chars"]

# each op: ("upsert", mod, shift) touches keys doc_id % 7 == mod,
# bumping n_chars and inserting shifted new keys; ("delete", mod)
# kills doc_id % 5 == mod; ("compact",) rewrites files (must be
# change-invisible)
_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.integers(0, 6),
            st.booleans(),  # also insert brand-new keys?
        ),
        st.tuples(st.just("delete"), st.integers(0, 4)),
        st.tuples(st.just("compact")),
    ),
    min_size=2,
    max_size=5,
)


def _rows(df):
    return sorted(map(tuple, df.select(*COLS).collect()))


def _net_replay(ch):
    """Last change per key decides (the replication collapse): ordered
    by ordinal, insert outranks its same-snapshot delete pair."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_change_ordinal").desc(),
        F.when(F.col("_change_type") == "insert", 1).otherwise(0).desc(),
    )
    return (
        ch.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter("_change_type = 'insert'")
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_iceberg_changelog_replay_reconstructs_any_op_sequence(
    spark, sf_dir, ops
):
    from incubator_gobblin_spark.sinks.iceberg_delete import (
        delete_iceberg_rows,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        rewrite_iceberg_data_files,
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.iceberg_changelog import (
        read_iceberg_changelog,
    )
    from incubator_gobblin_spark.sources.iceberg_import import read_iceberg

    root = tempfile.mkdtemp(prefix="cdc_prop_ice_")
    try:
        docs = (
            load_table(spark, sf_dir, "documents")
            .select(*COLS)
            .filter("doc_id < 60")
        )
        write_iceberg_table(spark, docs, root)
        for i, op in enumerate(ops):
            if op[0] == "upsert":
                _, mod, with_new = op
                live = read_iceberg(spark, root)
                src = live.filter(f"doc_id % 7 = {mod}").withColumn(
                    "n_chars", F.col("n_chars") + 10 + i
                )
                if with_new:
                    src = src.unionByName(
                        docs.limit(2).withColumn(
                            "doc_id",
                            F.col("doc_id") + 1000 * (i + 1),
                        )
                    )
                if src.isEmpty():
                    continue
                upsert_iceberg_rows(spark, root, src, on="doc_id")
            elif op[0] == "delete":
                delete_iceberg_rows(spark, root, f"doc_id % 5 = {op[1]}")
            else:
                rewrite_iceberg_data_files(spark, root)

        ch = read_iceberg_changelog(spark, root, None, max_snapshots=32)
        assert _rows(_net_replay(ch)) == _rows(read_iceberg(spark, root))
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_delta_cdf_replay_reconstructs_any_op_sequence(
    spark, sf_dir, ops
):
    from incubator_gobblin_spark.sinks.delta_delete import delete_delta_rows
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        compact_delta_files,
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_cdf import read_delta_changes
    from incubator_gobblin_spark.sources.delta_import import read_delta

    root = tempfile.mkdtemp(prefix="cdc_prop_delta_")
    try:
        docs = (
            load_table(spark, sf_dir, "documents")
            .select(*COLS)
            .filter("doc_id < 60")
        )
        write_delta_table(
            spark, docs, root,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        for i, op in enumerate(ops):
            if op[0] == "upsert":
                _, mod, with_new = op
                live = read_delta(spark, root)
                src = live.filter(f"doc_id % 7 = {mod}").withColumn(
                    "n_chars", F.col("n_chars") + 10 + i
                )
                if with_new:
                    src = src.unionByName(
                        docs.limit(2).withColumn(
                            "doc_id",
                            F.col("doc_id") + 1000 * (i + 1),
                        )
                    )
                if src.isEmpty():
                    continue
                merge_delta_rows(spark, root, src, on="doc_id")
            elif op[0] == "delete":
                delete_delta_rows(spark, root, f"doc_id % 5 = {op[1]}")
            else:
                compact_delta_files(
                    spark, root,
                    target_file_bytes=1 << 30, small_file_bytes=1 << 30,
                )

        ch = read_delta_changes(spark, root, 0, max_versions=32)
        w = Window.partitionBy("doc_id").orderBy(
            F.col("_commit_version").desc(),
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"), 1
            )
            .otherwise(0)
            .desc(),
        )
        survivors = (
            ch.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .filter("_change_type IN ('insert', 'update_postimage')")
        )
        assert _rows(survivors) == _rows(read_delta(spark, root))
    finally:
        shutil.rmtree(root, ignore_errors=True)
