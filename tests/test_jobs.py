"""Lifecycle jobs: compaction dedup, retention deletion, GDPR purge,
dataset copy."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.jobs import compaction, copy, purge, retention
from incubator_gobblin_spark.session import load_table


def test_compaction_argmax_dedup(spark, sf_dir, tmp_path):
    src_path = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events")
    # inject duplicates: same key, older delta -> must lose
    dup = events.withColumn("ts", F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    events.unionByName(dup).write.parquet(src_path)

    res = compaction.compact(
        spark,
        src_path,
        out_path,
        keys=["event_id"],
        delta=["ts"],
        tie_breakers=["user_id"],
    )
    assert res.input_rows == 2 * events.count()
    assert res.output_rows == events.count()
    assert res.duplicates_removed == events.count()
    # winners are the newer copies
    out = spark.read.parquet(out_path)
    joined = out.alias("o").join(events.alias("e"), "event_id")
    assert joined.filter(F.col("o.ts") != F.col("e.ts")).count() == 0


def test_compaction_exact_dedup_small_files(spark, sf_dir, tmp_path):
    src_path = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    nation = load_table(spark, sf_dir, "nation")
    # 8 duplicate copies scattered across many small files
    nation.unionByName(nation).unionByName(nation).unionByName(nation).repartition(
        16
    ).write.parquet(src_path)
    res = compaction.compact(spark, src_path, out_path, keys=None)
    assert res.output_rows == 25
    assert res.duplicates_removed == res.input_rows - 25


def test_retention_newest_k_and_older_than(spark, tmp_path):
    root = tmp_path / "lake"
    for ds in ["a", "b"]:
        for day in ["2026/08/01", "2026/08/02", "2026/08/03", "2026/08/04"]:
            d = root / ds / day
            d.mkdir(parents=True)
            (d / "part-0.parquet").write_bytes(b"x" * 10)
    versions = retention.find_versions_datetime(spark, str(root))
    assert versions.count() == 8

    res = retention.apply_newest_k(versions, k=3, dry_run=True)
    assert len(res.deleted) == 2  # one per dataset
    assert all("2026/08/01" in p for p in res.deleted)

    res2 = retention.apply_older_than(
        versions, datetime(2026, 8, 3), dry_run=False
    )
    assert len(res2.deleted) == 4
    versions_after = retention.find_versions_datetime(spark, str(root))
    assert versions_after.count() == 4


def test_version_finder_glob_modtime(spark, tmp_path):
    """GlobModTimeDatasetVersionFinder: version ts = mtime of the
    glob-matched path."""
    import os as _os
    import time as _time

    root = tmp_path / "lake"
    ages = {"v_old": 3000, "v_mid": 2000, "v_new": 1000}
    for name, age in ages.items():
        d = root / "ds1" / name
        d.mkdir(parents=True)
        (d / "data.bin").write_bytes(b"x" * 5)
        when = _time.time() - age
        _os.utime(d, (when, when))
    # non-matching dir ignored by the glob
    (root / "ds1" / "tmp_scratch").mkdir()

    versions = retention.find_versions_glob_modtime(spark, str(root), "v_*")
    rows = {r.version_path.split("/")[-1]: r for r in versions.collect()}
    assert set(rows) == {"v_old", "v_mid", "v_new"}
    assert rows["v_new"].version_ts > rows["v_mid"].version_ts > rows["v_old"].version_ts
    assert all(r.size_bytes == 5 for r in rows.values())

    res = retention.apply_newest_k(versions, k=1, dry_run=True)
    deleted = {p.split("/")[-1] for p in res.deleted}
    assert deleted == {"v_old", "v_mid"}


def test_version_finder_watermark_string_sort(spark, tmp_path):
    """WatermarkDatasetVersionFinder: watermark = subdir name (or regex
    group 1), STRING ordering; unmatched candidates skipped."""
    root = tmp_path / "snaps"
    for name in ["1436223009-snapshot", "1436234210-snapshot", "not-a-snap"]:
        (root / "db" / name).mkdir(parents=True)
        (root / "db" / name / "dump").write_bytes(b"y")

    plain = retention.find_versions_watermark(spark, str(root))
    assert plain.count() == 3  # no regex: every subdir name is a watermark

    versions = retention.find_versions_watermark(
        spark, str(root), regex=r"^(\d+)-snapshot$"
    )
    rows = sorted(versions.collect(), key=lambda r: r.watermark)
    assert [r.watermark for r in rows] == ["1436223009", "1436234210"]

    from incubator_gobblin_spark.operators import retention as R

    deletable = R.newest_k(
        versions,
        group_by=["dataset"],
        version_col="watermark",
        k=1,
        keep=False,
        tie_breakers=["version_path"],
    )
    assert [r.watermark for r in deletable.collect()] == ["1436223009"]


def test_version_finder_unix_timestamp(spark, tmp_path):
    """UnixTimestampVersionFinder: watermark parsed as epoch millis ->
    timestamp; unparsable versions skipped."""
    root = tmp_path / "snaps"
    for name in ["1436223009000-snap", "1436234210000-snap", "garbage-snap"]:
        (root / "db" / name).mkdir(parents=True)
        (root / "db" / name / "dump").write_bytes(b"y")

    versions = retention.find_versions_unix_timestamp(
        spark, str(root), regex=r"^(\w+)-snap$"
    )
    rows = sorted(versions.collect(), key=lambda r: r.version_ts)
    assert len(rows) == 2  # garbage skipped
    assert rows[0].version_ts == datetime.utcfromtimestamp(1436223009)
    res = retention.apply_older_than(
        versions, datetime.utcfromtimestamp(1436230000), dry_run=True
    )
    assert [p.split("/")[-1] for p in res.deleted] == ["1436223009000-snap"]


def test_purge_partitioned(spark, sf_dir, tmp_path):
    data_path = str(tmp_path / "users")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.date_format("o_orderdate", "yyyy")
    )
    orders.write.partitionBy("year").parquet(data_path)
    n = orders.count()

    ids = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    n_purged_expected = (
        orders.join(ids, "o_custkey", "left_semi").count()
    )
    res = purge.purge(
        spark, data_path, ids, on="o_custkey", partition_by=["year"]
    )
    assert res.rows_purged == n_purged_expected
    after = spark.read.parquet(data_path)
    assert after.count() == n - n_purged_expected
    assert after.join(ids, "o_custkey", "left_semi").count() == 0
    # partition layout preserved
    assert after.select("year").distinct().count() == orders.select(
        "year"
    ).distinct().count()


def test_copy_incremental(spark, tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("bravo")

    r1 = copy.copy_dataset(spark, str(src), str(dst))
    assert r1.files_copied == 2
    assert (dst / "sub" / "b.txt").read_text() == "bravo"

    # unchanged -> nothing copied
    r2 = copy.copy_dataset(spark, str(src), str(dst))
    assert r2.files_copied == 0

    # changed file -> recopied
    (src / "a.txt").write_text("alpha-v2")
    r3 = copy.copy_dataset(spark, str(src), str(dst))
    assert r3.files_copied == 1
    assert (dst / "a.txt").read_text() == "alpha-v2"


def test_copy_many_files_promote(spark, tmp_path):
    """The staging->final promote fans out on a thread pool: a copy of
    thousands of small files across many directories must land complete
    and correct (the content check is the real assertion; wall-time
    scaling is the design property documented in copy_dataset)."""
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    n_dirs, per_dir = 40, 50  # 2000 files
    for d in range(n_dirs):
        sub = src / f"d{d:03d}"
        sub.mkdir(parents=True)
        for i in range(per_dir):
            (sub / f"f{i:03d}.txt").write_text(f"{d}:{i}")
    r = copy.copy_dataset(spark, str(src), str(dst))
    assert r.files_copied == n_dirs * per_dir
    # no staging remnants, every file promoted with its content
    assert not (dst / "_staging_copy").exists()
    assert (dst / "d000" / "f000.txt").read_text() == "0:0"
    assert (dst / "d039" / "f049.txt").read_text() == "39:49"
    n_found = sum(len(fs) for _, _, fs in __import__("os").walk(dst))
    assert n_found == n_dirs * per_dir
    # idempotent second run copies nothing
    assert copy.copy_dataset(spark, str(src), str(dst)).files_copied == 0


def test_flow_dag_ordering_and_skip():
    from incubator_gobblin_spark.plans.flow import (
        FlowNode,
        NodeStatus,
        compile_order,
        run_flow,
    )

    ran = []
    nodes = [
        FlowNode("publish", lambda: ran.append("publish"), depends_on=["ingest"]),
        FlowNode("ingest", lambda: ran.append("ingest")),
        FlowNode("compact", lambda: ran.append("compact"), depends_on=["publish"]),
        FlowNode("unrelated", lambda: ran.append("unrelated")),
    ]
    order = compile_order(nodes)
    assert order.index("ingest") < order.index("publish") < order.index("compact")
    res = run_flow(nodes)
    assert res.succeeded and set(ran) == {"ingest", "publish", "compact", "unrelated"}

    # a failing node skips its descendants, unrelated branches still run
    def boom():
        raise RuntimeError("publish failed")

    nodes2 = [
        FlowNode("ingest", lambda: "ok"),
        FlowNode("publish", boom, depends_on=["ingest"]),
        FlowNode("compact", lambda: "never", depends_on=["publish"]),
        FlowNode("unrelated", lambda: "ok2"),
    ]
    res2 = run_flow(nodes2)
    assert res2.status["ingest"] is NodeStatus.SUCCEEDED
    assert res2.status["publish"] is NodeStatus.FAILED
    assert res2.status["compact"] is NodeStatus.SKIPPED
    assert res2.status["unrelated"] is NodeStatus.SUCCEEDED
    assert not res2.succeeded and "publish" in res2.errors

    # cycles and unknown deps are compile-time errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cycle"):
        compile_order([
            FlowNode("a", lambda: None, depends_on=["b"]),
            FlowNode("b", lambda: None, depends_on=["a"]),
        ])
    with _pytest.raises(ValueError, match="unknown"):
        compile_order([FlowNode("a", lambda: None, depends_on=["zzz"])])


def _mk_fuzzy_sinks(tmp_path):
    from incubator_gobblin_spark.sinks.files import FileSink, TableType

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
    return corpus, index


_BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long familiar tune about rivers and mountains in the evening"
)


def test_fuzzy_ingest_admits_and_drops_across_batches(spark, tmp_path):
    """Batch 1: a within-batch near-dup pair collapses to one admit.
    Batch 2: a near-dup of a COMMITTED doc drops via the index join +
    Jaccard verify; genuinely new docs admit; an unrelated doc that
    merely shares no bucket admits untouched."""
    from incubator_gobblin_spark.jobs.fuzzy_ingest import ingest_batch_fuzzy

    corpus, index = _mk_fuzzy_sinks(tmp_path)
    b1 = spark.createDataFrame(
        [
            (1, _BASE),
            (2, _BASE + " extra"),        # near-dup of 1 (within batch)
            (3, "completely different words " * 8),
        ],
        "doc_id long, text string",
    )
    r1 = ingest_batch_fuzzy(spark, b1, corpus, index, run_id="b1")
    assert r1["admitted"] == 2 and r1["dropped_within"] == 1
    got1 = {r["doc_id"] for r in corpus.read_committed(spark).collect()}
    assert got1 == {1, 3}

    b2 = spark.createDataFrame(
        [
            (10, _BASE + " trailing"),    # near-dup of committed doc 1
            (11, "fresh content nobody has seen before " * 6),
        ],
        "doc_id long, text string",
    )
    r2 = ingest_batch_fuzzy(spark, b2, corpus, index, run_id="b2")
    assert r2["dropped_vs_committed"] == 1 and r2["admitted"] == 1
    got2 = {r["doc_id"] for r in corpus.read_committed(spark).collect()}
    assert got2 == {1, 3, 11}
    # the index carries keys for every committed doc and nothing else
    idx_ids = {r["doc_id"] for r in index.read_committed(spark).collect()}
    assert idx_ids == {1, 3, 11}


def test_fuzzy_ingest_bucket_collision_alone_never_drops(spark, tmp_path):
    """The Jaccard verify is load-bearing: force a tiny band count so
    bucket collisions are likely, and check a low-similarity doc still
    admits (LSH false positives must not lose data)."""
    from incubator_gobblin_spark.jobs.fuzzy_ingest import ingest_batch_fuzzy

    corpus, index = _mk_fuzzy_sinks(tmp_path)
    b1 = spark.createDataFrame([(1, _BASE)], "doc_id long, text string")
    ingest_batch_fuzzy(spark, b1, corpus, index, run_id="b1")
    # shares SOME vocabulary (may collide in a band) but is far below
    # the 0.7 Jaccard bar
    b2 = spark.createDataFrame(
        [(2, "the quick brown fox went somewhere else entirely today "
             "and nothing else matches this sentence at all")],
        "doc_id long, text string",
    )
    r2 = ingest_batch_fuzzy(spark, b2, corpus, index, run_id="b2")
    assert r2["admitted"] == 1 and r2["dropped_vs_committed"] == 0


def test_fuzzy_ingest_crash_replay_idempotent(spark, tmp_path):
    """Crash between the corpus commit and the index commit: replaying
    the SAME run id converges — no duplicate corpus rows, index catches
    up, and admission decisions are unchanged (admission consults only
    the index, which the crashed run never updated)."""
    from incubator_gobblin_spark.jobs import fuzzy_ingest as FI

    corpus, index = _mk_fuzzy_sinks(tmp_path)
    b1 = spark.createDataFrame(
        [(1, _BASE), (2, "something else entirely " * 6)],
        "doc_id long, text string",
    )
    # simulate the crash: run the job body with an index sink whose
    # publish dies on first call
    class _CrashOnce:
        def __init__(self, inner):
            self.inner = inner
            self.crashed = False

        def __getattr__(self, name):
            if name == "publish" and not self.crashed:
                self.crashed = True

                def _boom(rid):
                    raise RuntimeError("injected crash before index commit")

                return _boom
            return getattr(self.inner, name)

    crashy = _CrashOnce(index)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        FI.ingest_batch_fuzzy(spark, b1, corpus, crashy, run_id="b1")
    # corpus committed, index did not
    assert {r["doc_id"] for r in corpus.read_committed(spark).collect()} == {1, 2}
    with _pytest.raises(FileNotFoundError):
        index.read_committed(spark)

    # replay with the same run id: converges, no duplicates
    r = FI.ingest_batch_fuzzy(spark, b1, corpus, index, run_id="b1")
    assert r["admitted"] == 2
    rows = corpus.read_committed(spark).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]  # no doubling
    assert {r["doc_id"] for r in index.read_committed(spark).collect()} == {1, 2}

    # and the next batch behaves normally
    b2 = spark.createDataFrame(
        [(3, _BASE + " coda")], "doc_id long, text string"
    )
    r2 = FI.ingest_batch_fuzzy(spark, b2, corpus, index, run_id="b2")
    assert r2["dropped_vs_committed"] == 1 and r2["admitted"] == 0


def test_fuzzy_ingest_composes_with_lake_lifecycle(spark, tmp_path):
    """After several admission rounds the index lake is many small
    runs; compact_runs + vacuum must preserve the committed state AND
    subsequent admission decisions (the index is an ordinary manifest
    lake, so the whole lifecycle toolbox applies)."""
    from incubator_gobblin_spark.jobs.fuzzy_ingest import ingest_batch_fuzzy

    corpus, index = _mk_fuzzy_sinks(tmp_path)
    for i, text in enumerate(
        [_BASE, "second body of text " * 6, "third subject matter " * 6]
    ):
        b = spark.createDataFrame([(i, text)], "doc_id long, text string")
        ingest_batch_fuzzy(spark, b, corpus, index, run_id=f"b{i}")
    before = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in index.read_committed(spark).collect()
    }
    index.compact_runs(spark, run_id="compact1")
    index.vacuum(keep_last=1, grace_seconds=0)
    after = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in index.read_committed(spark).collect()
    }
    assert after == before

    # admission still drops near-dups of docs committed BEFORE compaction
    b = spark.createDataFrame(
        [(99, _BASE + " postfix")], "doc_id long, text string"
    )
    r = ingest_batch_fuzzy(spark, b, corpus, index, run_id="b99")
    assert r["dropped_vs_committed"] == 1 and r["admitted"] == 0


# ---------------------------------------------------------------------------
# Multi-hop path finding (BFSPathFinder.java:54 behaviors)
# ---------------------------------------------------------------------------


def _edges():
    from incubator_gobblin_spark.plans.flow import ANY, FlowEdge

    return [
        # src -> hdfs1: avro passthrough
        FlowEdge("e1", "src", "hdfs1", {"format": ANY}, {"format": ANY}),
        # hdfs1 -> hdfs2: avro->orc conversion
        FlowEdge("e2", "hdfs1", "hdfs2", {"format": "avro"}, {"format": "orc"}),
        # hdfs1 -> hdfs2: passthrough (parallel edge: multigraph)
        FlowEdge("e3", "hdfs1", "hdfs2", {"format": ANY}, {"format": ANY}),
        # hdfs2 -> dest: passthrough
        FlowEdge("e4", "hdfs2", "dest", {"format": ANY}, {"format": ANY}),
        # a cycle back to src — termination must not depend on acyclicity
        FlowEdge("e5", "hdfs2", "src", {"format": ANY}, {"format": ANY}),
    ]


def test_find_path_shortest_with_transformation_near_source():
    """avro at src -> orc at dest: BFS finds the 3-hop path and places
    the avro->orc conversion at the FIRST opportunity (the reference's
    prioritizedEdgeList: transformations closest to the source)."""
    from incubator_gobblin_spark.plans.flow import find_path

    path = find_path(
        _edges(), "src", "dest", {"format": "avro"}, {"format": "orc"}
    )
    assert path is not None
    assert [c.edge.edge_id for c in path] == ["e1", "e2", "e4"]
    # descriptor state threads through the hops
    assert dict(path[0].output_descriptor)["format"] == "avro"
    assert dict(path[1].output_descriptor)["format"] == "orc"
    assert dict(path[2].output_descriptor)["format"] == "orc"


def test_find_path_base_conditions_and_unreachable():
    from incubator_gobblin_spark.plans.flow import ANY, FlowEdge, find_path

    edges = _edges()
    # already at target with a compatible descriptor: empty path
    assert find_path(edges, "src", "src", {"format": "avro"}, {"format": ANY}) == []
    # inactive destination: no path (base condition 1)
    assert find_path(
        edges, "src", "dest", {"format": "avro"}, {"format": ANY},
        inactive_nodes={"dest"},
    ) is None
    # no edge chain produces parquet: unreachable
    assert find_path(
        edges, "src", "dest", {"format": "avro"}, {"format": "parquet"}
    ) is None
    # inactive EDGE is skipped: with e4 inactive dest is unreachable
    edges2 = [
        FlowEdge("e4x", e.src, e.dest, e.input_descriptor,
                 e.output_descriptor, active=False)
        if e.edge_id == "e4" else e
        for e in edges
    ]
    assert find_path(
        edges2, "src", "dest", {"format": "avro"}, {"format": ANY}
    ) is None


def test_find_path_respects_edge_input_descriptors():
    """An edge whose input descriptor rejects the flowing dataset is
    not taken: json input cannot ride the avro-only conversion, so the
    passthrough parallel edge carries it (multigraph behavior)."""
    from incubator_gobblin_spark.plans.flow import ANY, find_path

    path = find_path(
        _edges(), "src", "dest", {"format": "json"}, {"format": ANY}
    )
    assert path is not None
    assert [c.edge.edge_id for c in path] == ["e1", "e3", "e4"]


def test_flow_from_path_runs_hops_in_order():
    """The found path compiles into the linear FlowNode chain run_flow
    executes, one job per edge, ordered."""
    from incubator_gobblin_spark.plans.flow import (
        ANY,
        find_path,
        flow_from_path,
        run_flow,
    )

    path = find_path(
        _edges(), "src", "dest", {"format": "avro"}, {"format": "orc"}
    )
    ran = []
    nodes = flow_from_path(
        path, lambda ctx: (lambda: ran.append(ctx.edge.edge_id))
    )
    result = run_flow(nodes)
    assert result.succeeded
    assert ran == ["e1", "e2", "e4"]


def test_purge_lake_delta_commits_dv_not_rewrite(spark, sf_dir, tmp_path):
    """GDPR purge onto a Delta-exported lake commits DELETION VECTORS:
    the data file set is untouched (no rewrite), the new log version
    re-adds touched files with DV descriptors, and the separate
    compliance validation pass over read_delta counts zero survivors."""
    import json as _json

    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        read_delta,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    root = str(tmp_path / "pl_delta")
    sink = FileSink(
        path=root,
        commit_mode="manifest",
        table_type=TableType.APPEND_ONLY,
        partition_by=["lang"],
    )
    sink.write_staging(docs, "r0")
    sink.publish("r0")
    sink.export_delta_log()
    ids = docs.filter("doc_id % 17 = 2").select("doc_id")
    n_ids = ids.count()

    import glob as _glob

    data_before = sorted(
        p for p in _glob.glob(os.path.join(root, "**", "*.parquet"),
                              recursive=True)
        if "_delta_log" not in p
    )
    res = purge.purge_lake(spark, root, ids, on="doc_id")
    assert res.table_format == "delta"
    assert res.rows_purged == n_ids
    assert res.delete_files + res.files_removed > 0
    # NOT a rewrite: exactly the same physical data files afterward
    data_after = sorted(
        p for p in _glob.glob(os.path.join(root, "**", "*.parquet"),
                              recursive=True)
        if "_delta_log" not in p
    )
    assert data_after == data_before
    # the commit is a DELETE carrying deletionVector adds
    log_dir = os.path.join(root, "_delta_log")
    head = _log_versions(log_dir)[-1]
    with open(os.path.join(log_dir, f"{head:020d}.json")) as fh:
        actions = [_json.loads(line) for line in fh if line.strip()]
    assert any(
        a.get("commitInfo", {}).get("operation") == "DELETE"
        for a in actions
    )
    assert any("deletionVector" in (a.get("add") or {}) for a in actions)
    assert purge.verify_purge_lake(spark, root, ids, on="doc_id") == 0
    kept = read_delta(spark, root)
    assert kept.count() == docs.count() - n_ids


def test_purge_lake_iceberg_commits_delete_manifest(
    spark, sf_dir, tmp_path
):
    """GDPR purge onto an Iceberg-exported lake commits a content=1
    position-delete manifest: data files untouched, operation=delete
    snapshot at the head, zero survivors via the lake read path."""
    import glob as _glob

    from incubator_gobblin_spark.sinks.files import FileSink, TableType
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    root = str(tmp_path / "pl_ice")
    sink = FileSink(
        path=root,
        commit_mode="manifest",
        table_type=TableType.APPEND_ONLY,
        partition_by=["lang"],
    )
    sink.write_staging(docs, "r0")
    sink.publish("r0")
    sink.export_iceberg()
    ids = docs.filter("doc_id % 19 = 7").select("doc_id")
    n_ids = ids.count()

    data_before = sorted(
        p for p in _glob.glob(os.path.join(root, "**", "*.parquet"),
                              recursive=True)
        if "_deletes" not in p
    )
    res = purge.purge_lake(spark, root, ids, on="doc_id")
    assert res.table_format == "iceberg"
    assert res.rows_purged == n_ids and res.delete_files >= 1
    data_after = sorted(
        p for p in _glob.glob(os.path.join(root, "**", "*.parquet"),
                              recursive=True)
        if "_deletes" not in p
    )
    assert data_after == data_before  # tombstones, not a rewrite
    meta = current_metadata(root)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert snap["summary"]["operation"] == "delete"
    assert purge.verify_purge_lake(spark, root, ids, on="doc_id") == 0
    kept = read_iceberg(spark, root)
    assert kept.count() == docs.count() - n_ids


def test_purge_lake_plain_dataset_refuses(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    root = str(tmp_path / "plain")
    docs.write.parquet(root)
    with pytest.raises(ValueError, match="neither a Delta log nor"):
        purge.purge_lake(
            spark, root, docs.select("doc_id"), on="doc_id"
        )
