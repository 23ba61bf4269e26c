"""Foreign-engine conformance for the lake interop exports: when a
REAL external reader is installed — pyiceberg for Iceberg metadata,
delta-rs (``deltalake``) for the Delta log — read this engine's exports
with it and value-compare against ``read_committed``. This is the check
the structural pins (spec-example parses, own-importer round trips,
DuckDB symlink reads) cannot give: a spec misread that is self-
consistent across our writer and reader would still fail here.

Reference analogue: gobblin-iceberg's IcebergMetadataWriterTest reads
its own metadata back through iceberg-core.

Activation (the libraries are absent in the offline container; every
test SKIPS until they are installed):

    pip install pyiceberg   && pytest tests/test_live_lake.py -m live_iceberg
    pip install deltalake   && pytest tests/test_live_lake.py -m live_delta
"""

import os

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.session import load_table
from incubator_gobblin_spark.sinks.files import FileSink, TableType

try:
    from pyiceberg.table import StaticTable  # type: ignore

    HAVE_PYICEBERG = True
except ImportError:
    HAVE_PYICEBERG = False

try:
    from deltalake import DeltaTable  # type: ignore

    HAVE_DELTARS = True
except ImportError:
    HAVE_DELTARS = False

live_iceberg = pytest.mark.live_iceberg
live_delta = pytest.mark.live_delta

needs_pyiceberg = pytest.mark.skipif(
    not HAVE_PYICEBERG, reason="pyiceberg not installed"
)
needs_deltars = pytest.mark.skipif(
    not HAVE_DELTARS, reason="deltalake (delta-rs) not installed"
)


def _sink(path, **kw):
    return FileSink(path=str(path), commit_mode="manifest", **kw)


def _sorted_rows(pdf, cols):
    return sorted(map(tuple, pdf[cols].itertuples(index=False, name=None)))


def _spark_rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _latest_metadata_path(root):
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = fh.read().strip()
    return os.path.join(meta_dir, f"v{v}.metadata.json")


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_full_snapshot(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    root = str(tmp_path / "icb")
    sink = _sink(root)
    sink.write_staging(df, "r1")
    sink.publish("r1")
    sink.export_iceberg()
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    pdf = t.scan().to_pandas()
    cols = sorted(df.columns)
    assert _sorted_rows(pdf, cols) == _spark_rows(
        sink.read_committed(spark), cols
    )


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_incremental_chain(spark, sf_dir, tmp_path):
    """The q127 shape: carried manifests + adds-only manifest across an
    incremental chain must resolve for pyiceberg, not just our reader."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    root = str(tmp_path / "icb-inc")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    for i, pred in enumerate(
        (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1)
    ):
        sink.write_staging(docs.filter(pred), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_iceberg()
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    pdf = t.scan().to_pandas()
    cols = sorted(docs.columns)
    assert _sorted_rows(pdf, cols) == _spark_rows(docs, cols)
    # file-skipping metadata is readable too: a filtered scan stays exact
    filtered = t.scan(row_filter="doc_id < 100").to_pandas()
    assert _sorted_rows(filtered, cols) == _spark_rows(
        docs.filter(F.col("doc_id") < 100), cols
    )


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_after_snapshot_expiry(spark, sf_dir, tmp_path):
    from incubator_gobblin_spark.sinks.iceberg_export import (
        expire_iceberg_snapshots,
    )

    df = load_table(spark, sf_dir, "region")
    root = str(tmp_path / "icb-exp")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    for i in range(3):
        sink.write_staging(df.filter(F.col("r_regionkey") % 3 == i), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_iceberg()
    expire_iceberg_snapshots(sink, keep_last=1)
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    cols = sorted(df.columns)
    assert _sorted_rows(t.scan().to_pandas(), cols) == _spark_rows(df, cols)


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_position_deletes(spark, sf_dir, tmp_path):
    """A foreign reader must apply the delete snapshots this engine's
    append_position_deletes writes — proving the delete manifest /
    delete file shapes are spec-true, not merely self-consistent."""
    from incubator_gobblin_spark.sinks.iceberg_export import (
        append_position_deletes,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        snapshot_files,
    )

    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    root = str(tmp_path / "icb-del")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    sink.write_staging(df, "r0")
    sink.publish("r0")
    sink.export_iceberg()
    files, _ = snapshot_files(
        current_metadata(root), root, collect_deletes=True
    )
    coords = [
        (r[0], r[1])
        for r in spark.read.parquet(*[f["path"] for f in files])
        .withColumn("_fp", F.col("_metadata.file_path"))
        .withColumn("_pos", F.col("_metadata.row_index"))
        .filter(F.col("n_nationkey") % 3 == 0)
        .select("_fp", "_pos")
        .collect()
    ]
    append_position_deletes(root, coords)
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    pdf = t.scan().to_pandas()
    cols = sorted(df.columns)
    assert _sorted_rows(pdf, cols) == _spark_rows(
        df.filter(F.col("n_nationkey") % 3 != 0), cols
    )


@live_delta
@needs_deltars
def test_deltars_reads_export_and_time_travel(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "region")
    root = str(tmp_path / "dl")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    for i in range(2):
        sink.write_staging(df.filter(F.col("r_regionkey") % 2 == i), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_delta_log()
    dt = DeltaTable(root)
    cols = sorted(df.columns)
    assert _sorted_rows(dt.to_pandas(), cols) == _spark_rows(df, cols)
    # time travel to version 0 sees only the first commit
    dt0 = DeltaTable(root, version=0)
    assert _sorted_rows(dt0.to_pandas(), cols) == _spark_rows(
        df.filter(F.col("r_regionkey") % 2 == 0), cols
    )


@live_delta
@needs_deltars
def test_deltars_reads_checkpointed_and_expired_log(spark, sf_dir, tmp_path):
    """After multi-part checkpointing + expire_delta_log, delta-rs must
    resolve the table from the checkpoint (the surviving-chain read)."""
    df = load_table(spark, sf_dir, "region")
    root = str(tmp_path / "dl-exp")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    for i in range(4):
        sink.write_staging(df.filter(F.col("r_regionkey") % 4 == i), f"r{i}")
        sink.publish(f"r{i}")
        sink.export_delta_log(checkpoint_interval=2)
    assert sink.expire_delta_log() > 0
    dt = DeltaTable(root)
    cols = sorted(df.columns)
    assert _sorted_rows(dt.to_pandas(), cols) == _spark_rows(df, cols)


@live_delta
@needs_deltars
def test_deltars_file_stats_prune_consistently(spark, sf_dir, tmp_path):
    """The exported add.stats must be usable by delta-rs' pushdown —
    a filtered read stays exact (non-conservative stats would drop
    rows here)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = str(tmp_path / "dl-stats")
    sink = _sink(root, cluster_by=["o_orderkey"], max_records_per_file=500)
    sink.write_staging(orders, "base")
    sink.publish("base")
    sink.export_delta_log()
    dt = DeltaTable(root)
    got = dt.to_pyarrow_table(filters=[("o_orderkey", "<", 100)]).to_pandas()
    cols = ["o_orderkey", "o_totalprice"]
    assert _sorted_rows(got, cols) == _spark_rows(
        orders.filter(F.col("o_orderkey") < 100), cols
    )


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_equality_deletes(spark, sf_dir, tmp_path):
    """A foreign reader must apply the equality-delete snapshots this
    engine's append_equality_deletes writes (content=2 + equality_ids
    field 135 + sequence ordering)."""
    from incubator_gobblin_spark.sinks.iceberg_export import (
        append_equality_deletes,
    )

    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    root = str(tmp_path / "icb-eqdel")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    sink.write_staging(df, "r0")
    sink.publish("r0")
    sink.export_iceberg()
    append_equality_deletes(root, [{"n_nationkey": 3}], ["n_nationkey"])
    # re-insert after the delete: sequence ordering must preserve it
    sink.write_staging(df.filter(F.col("n_nationkey") == 3), "r1")
    sink.publish("r1")
    sink.export_iceberg()
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    pdf = t.scan().to_pandas()
    cols = sorted(df.columns)
    assert _sorted_rows(pdf, cols) == _spark_rows(df, cols)


@live_delta
@needs_deltars
def test_deltars_reads_deletion_vector_table(spark, sf_dir, tmp_path):
    """delta-rs must apply the deletion vectors this engine's DV writer
    authors (z85 UUID storage, CRC framing, portable roaring bitmaps) —
    proving the codec is spec-true, not merely self-consistent."""
    from incubator_gobblin_spark.formats.deletion_vectors import write_dv_file
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        _replay_state,
    )
    import json
    from urllib.parse import unquote

    df = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    root = str(tmp_path / "dl-dv")
    sink = _sink(root, table_type=TableType.APPEND_ONLY)
    sink.write_staging(df, "r0")
    sink.publish("r0")
    sink.export_delta_log()
    log_dir = os.path.join(root, "_delta_log")
    live, _, _ = _replay_state(log_dir, None)
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}}
    ]
    for rel, a in sorted(live.items()):
        fp = os.path.join(root, unquote(rel))
        import pyarrow.parquet as pq

        pdf = pq.read_table(fp).to_pandas()
        positions = [
            int(i) for i, v in enumerate(pdf["n_nationkey"]) if v % 3 == 0
        ]
        if not positions:
            continue
        dv = write_dv_file(root, positions, storage="u")
        actions.append({"remove": {"path": rel, "dataChange": True,
                                   "deletionTimestamp": 0}})
        actions.append({"add": {**a, "deletionVector": dv}})
    v = _log_versions(log_dir)[-1] + 1
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as fh:
        for act in actions:
            fh.write(json.dumps(act) + "\n")
    dt = DeltaTable(root)
    cols = sorted(df.columns)
    assert _sorted_rows(dt.to_pandas(), cols) == _spark_rows(
        df.filter(F.col("n_nationkey") % 3 != 0), cols
    )


@live_delta
@needs_deltars
def test_deltars_reads_standalone_lifecycle(spark, sf_dir, tmp_path):
    """The round-10 write surface against a REAL foreign reader:
    delta-rs must see the exact surviving rows after write -> DV
    DELETE -> MERGE -> OPTIMIZE -> VACUUM -> checkpoint+expire ->
    RESTORE, at every stage."""
    from incubator_gobblin_spark.sinks.delta_delete import delete_delta_rows
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        checkpoint_delta_table,
        compact_delta_files,
        expire_delta_log,
        merge_delta_rows,
        restore_delta_table,
        vacuum_delta,
        write_delta_table,
    )

    nat = load_table(spark, sf_dir, "nation")
    root = str(tmp_path / "dl-solo")
    cols = sorted(nat.columns)

    def foreign():
        return _sorted_rows(DeltaTable(root).to_pandas(), cols)

    write_delta_table(spark, nat, root, partition_by=["n_regionkey"])
    assert foreign() == _spark_rows(nat, cols)

    delete_delta_rows(spark, root, "n_nationkey % 3 = 0")
    after_del = nat.filter(F.col("n_nationkey") % 3 != 0)
    assert foreign() == _spark_rows(after_del, cols)

    source = nat.filter("n_nationkey % 3 = 1").withColumn(
        "n_name", F.concat(F.lit("M_"), F.col("n_name"))
    )
    merge_delta_rows(spark, root, source, on="n_nationkey")
    expect = after_del.filter("n_nationkey % 3 <> 1").unionByName(source)
    assert foreign() == _spark_rows(expect, cols)

    compact_delta_files(
        spark, root, target_file_bytes=1 << 30, small_file_bytes=1 << 30
    )
    vacuum_delta(root, retention_hours=0, allow_short_retention=True)
    assert foreign() == _spark_rows(expect, cols)

    checkpoint_delta_table(root)
    expire_delta_log(root)
    assert foreign() == _spark_rows(expect, cols)

    restore_delta_table(spark, root, 1)  # back to the post-DELETE state
    assert foreign() == _spark_rows(after_del, cols)


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_standalone_lifecycle(spark, sf_dir, tmp_path):
    """write_iceberg_table -> position DELETE -> RewriteDataFiles ->
    equality UPSERT -> rollback, each state read by pyiceberg."""
    from incubator_gobblin_spark.sinks.iceberg_delete import (
        delete_iceberg_rows,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        rewrite_iceberg_data_files,
        rollback_iceberg_table,
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    root = str(tmp_path / "icb-solo")
    cols = ["doc_id", "lang", "n_chars"]

    def foreign():
        t = StaticTable.from_metadata(_latest_metadata_path(root))
        return _sorted_rows(t.scan().to_pandas(), cols)

    write_iceberg_table(spark, docs, root, partition_by=["lang"])
    assert foreign() == _spark_rows(docs, cols)
    pre_delete_sid = current_metadata(root)["current-snapshot-id"]

    delete_iceberg_rows(spark, root, "doc_id % 4 = 2")
    after_del = docs.filter("doc_id % 4 <> 2")
    assert foreign() == _spark_rows(after_del, cols)

    rewrite_iceberg_data_files(spark, root)
    assert foreign() == _spark_rows(after_del, cols)

    ups = docs.filter("doc_id % 10 = 1").withColumn(
        "n_chars", (F.col("n_chars") + 7).cast("long")
    )
    upsert_iceberg_rows(spark, root, ups, on="doc_id")
    expect = after_del.filter("doc_id % 10 <> 1").unionByName(
        ups.select(*after_del.columns)
    )
    assert foreign() == _spark_rows(expect, cols)

    rollback_iceberg_table(root, pre_delete_sid)
    assert foreign() == _spark_rows(docs, cols)


@live_iceberg
@needs_pyiceberg
def test_pyiceberg_reads_transform_partitioned_standalone(
    spark, sf_dir, tmp_path
):
    """Hidden partitioning authored by write_iceberg_table: pyiceberg
    must resolve the transform spec and plan a filtered scan."""
    from incubator_gobblin_spark.functions.iceberg_transforms import (
        transform_expr,
    )
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        write_iceberg_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    derived = docs.withColumn(
        "b", transform_expr("truncate[1000]", F.col("doc_id"), "long")
    )
    root = str(tmp_path / "icb-hidden")
    write_iceberg_table(
        spark,
        derived,
        root,
        partition_by=["b"],
        transform_spec=[
            {"name": "b", "transform": "truncate[1000]", "source": "doc_id"}
        ],
    )
    t = StaticTable.from_metadata(_latest_metadata_path(root))
    cols = ["doc_id", "lang", "n_chars"]
    assert _sorted_rows(t.scan().to_pandas(), cols) == _spark_rows(docs, cols)
    filtered = t.scan(row_filter="doc_id < 1000").to_pandas()
    assert _sorted_rows(filtered, cols) == _spark_rows(
        docs.filter("doc_id < 1000"), cols
    )


@live_delta
@needs_deltars
def test_deltars_reads_change_data_feed(spark, sf_dir, tmp_path):
    """delta-rs ``load_cdf`` over a CDF table THIS engine authored
    (write with enableChangeDataFeed, MERGE + DV DELETE writing
    _change_data) — updates AND deletes change-for-change, the check
    our own CDF reader cannot give."""
    from incubator_gobblin_spark.sinks.delta_delete import (
        delete_delta_rows,
    )
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_cdf import (
        read_delta_changes,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    root = str(tmp_path / "cdf-live")
    write_delta_table(
        spark,
        docs,
        root,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    updates = docs.filter("doc_id % 9 = 0").withColumn(
        "n_chars", (F.col("n_chars") + 5).cast("long")
    )
    merge_delta_rows(spark, root, updates, on="doc_id")
    delete_delta_rows(spark, root, "doc_id % 10 = 4")

    dt = DeltaTable(root)
    cols = ["doc_id", "lang", "n_chars", "_change_type", "_commit_version"]
    foreign = dt.load_cdf(starting_version=0).read_all().to_pandas()
    got = _sorted_rows(foreign, cols)
    ours = read_delta_changes(spark, root, 0)
    assert got == _spark_rows(ours, cols)
    # the delete set delta-rs reports excludes rows the merge's DVs
    # already killed — the spec's net-change contract
    dels = foreign[foreign["_change_type"] == "delete"]
    assert (dels["doc_id"] % 10 == 4).all()


@live_delta
@needs_deltars
def test_deltars_honors_txn_and_tombstone_retention(
    spark, sf_dir, tmp_path
):
    """delta-rs parses our txn/SetTransaction actions (idempotent
    streaming epochs) and our checkpoints that carry them."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        checkpoint_delta_table,
        expire_delta_log,
        merge_delta_rows,
        write_delta_table,
    )

    nat = load_table(spark, sf_dir, "nation")
    root = str(tmp_path / "txn-live")
    write_delta_table(spark, nat, root)
    src = nat.filter("n_nationkey < 2").withColumn("n_name", F.lit("X"))
    merge_delta_rows(spark, root, src, on="n_nationkey", txn=("app-z", 9))
    checkpoint_delta_table(root)
    expire_delta_log(root)
    dt = DeltaTable(root)
    # delta-rs exposes per-app transaction versions
    assert dt.transaction_version("app-z") == 9
    cols = ["n_nationkey", "n_name"]
    expect = nat.filter("n_nationkey >= 2").unionByName(src)
    assert _sorted_rows(dt.to_pandas(), cols) == _spark_rows(expect, cols)
