"""Row-level DELETE on a Delta table via deletion vectors (no rewrite).

``delete_delta_rows`` commits the delta-io PROTOCOL.md §Deletion
Vectors shape: every data file with matching rows is *kept* and
re-``add``-ed with a deletion-vector descriptor marking the deleted row
indexes (the old ``add`` is ``remove``-d in the same commit), so a
DELETE touches O(matched rows) of bitmap bytes instead of rewriting
O(file) of data. A file whose every row dies is removed outright. The
engine's own :func:`~incubator_gobblin_spark.sources.delta_import.read_delta`
reads the result back (it decodes and anti-joins DVs), as would
delta-spark / delta-rs.

This is the write half of the DV surface — the read half landed with
``formats/deletion_vectors.py``. Reference parity: the reference's
row-level deletes rewrite whole files through the compaction/retention
jobs (gobblin-data-management
``.../retention/dataset/CleanableDatasetBase.java``,
``gobblin-compaction/.../mapreduce/MRCompactor.java``); a
metadata-plus-bitmap delete is the lake-native equivalent this engine
offers on its Delta interop surface.

Scale shape: the predicate runs inside one parquet scan (filter
pushdown applies), only the MATCHED (file, row_index) coordinates
shuffle (one exchange keyed on file path), each touched file's bitmap
is built and written by an executor task (``applyInPandas`` — the
driver never holds O(deleted rows)), and the driver collects one
descriptor row per touched file before appending a single put-if-absent
commit JSON, exactly like ``export_delta_log``.
"""

from __future__ import annotations

import json
import os
import time as _time
from urllib.parse import unquote

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from incubator_gobblin_spark.sources.delta_import import (
    _cm_phys,
    _fieldid_type,
    _logical_expr,
    _log_versions,
    _mapped_below,
    _physicalize_type,
    _replay_state,
    assemble_snapshot,
    check_reader_protocol,
    decoded_file_path,
)


class DeltaConcurrentModificationError(RuntimeError):
    """The table changed between the snapshot this DELETE scanned and
    its commit attempt — re-run against the new state (the delete was
    NOT applied)."""


#: writer features whose obligations a delete-only DV commit cannot
#: violate (deletes add no rows, change no values, keep row positions).
#: Features that DO obligate a deleting writer are gated on their
#: enabling table property below; anything not listed refuses loudly —
#: PROTOCOL.md's writer contract is "implement every writerFeature or
#: don't write".
_DELETE_SAFE_WRITER_FEATURES = {
    "appendOnly",  # gated on delta.appendOnly below
    "invariants",
    "checkConstraints",
    "generatedColumns",
    "identityColumns",
    "changeDataFeed",  # gated on delta.enableChangeDataFeed below
    "columnMapping",
    "deletionVectors",
    "timestampNtz",
    "v2Checkpoint",
    "domainMetadata",
    # row ids survive a DV delete untouched: the re-add copies the old
    # add action verbatim (baseRowId and all) and row positions within
    # the file never move
    "rowTracking",
    "icebergCompatV1",  # gated on delta.enableIcebergCompatV1 below
    "icebergCompatV2",  # gated on delta.enableIcebergCompatV2 below
}

#: legacy protocol versions imply feature sets; an upgrade to the
#: table-features form (3, 7) must carry them forward explicitly
#: (PROTOCOL.md §Table Features — upgraded tables list every feature
#: the old version numbers enabled implicitly)
_LEGACY_WRITER_FEATURES = {
    2: ["appendOnly", "invariants"],
    3: ["checkConstraints"],
    4: ["changeDataFeed", "generatedColumns"],
    5: ["columnMapping"],
    6: ["identityColumns"],
}
_LEGACY_READER_FEATURES = {2: ["columnMapping"]}


def _check_delete_writable(proto: dict, meta: dict) -> None:
    """Refuse tables a DV delete commit would corrupt or whose declared
    writer obligations this engine does not honor."""
    conf = (meta or {}).get("configuration") or {}

    def _on(key: str) -> bool:
        return str(conf.get(key, "")).lower() == "true"

    if _on("delta.appendOnly"):
        raise ValueError(
            "delete_delta_rows: table sets delta.appendOnly=true — "
            "deletes are forbidden on this table"
        )
    if _on("delta.enableChangeDataFeed") and (
        conf.get("delta.columnMapping.mode", "none") != "none"
    ):
        raise ValueError(
            "delete_delta_rows: changeDataFeed + column mapping — "
            "_change_data files would need physical names/ids this "
            "writer does not author; refusing to break CDF readers"
        )
    for v in ("V1", "V2"):
        if _on(f"delta.enableIcebergCompat{v}"):
            raise ValueError(
                f"delete_delta_rows: delta.enableIcebergCompat{v}=true "
                "forbids deletion vectors — refusing"
            )
    mwv = int((proto or {}).get("minWriterVersion", 2))
    if mwv > 7:
        raise ValueError(
            f"delete_delta_rows: protocol minWriterVersion={mwv} is "
            "newer than this writer understands — refusing to write"
        )
    if mwv == 7:
        unknown = set(proto.get("writerFeatures") or []) - (
            _DELETE_SAFE_WRITER_FEATURES
        )
        if unknown:
            raise ValueError(
                "delete_delta_rows: table requires writer features "
                f"{sorted(unknown)} this engine does not implement — "
                "refusing to write a commit that may violate them"
            )


def _upgraded_protocol(proto: dict) -> dict | None:
    """The protocol action a DV-introducing commit must carry, or None
    when the table already declares deletionVectors both sides."""
    mrv = int((proto or {}).get("minReaderVersion", 1))
    mwv = int((proto or {}).get("minWriterVersion", 2))
    rfeats = set(proto.get("readerFeatures") or [])
    wfeats = set(proto.get("writerFeatures") or [])
    if mrv >= 3 and mwv >= 7 and "deletionVectors" in rfeats & wfeats:
        return None
    # carry the legacy-implied features into the table-features form —
    # ONLY when upgrading FROM a legacy version (PROTOCOL.md: at
    # version 7/3 the feature lists are already EXPLICIT; force-adding
    # every legacy feature to an explicit list would obligate readers
    # and writers to features the table never declared)
    if mwv < 7:
        for v, feats in _LEGACY_WRITER_FEATURES.items():
            if mwv >= v:
                wfeats.update(feats)
    if mrv < 3:
        for v, feats in _LEGACY_READER_FEATURES.items():
            if mrv >= v:
                rfeats.update(feats)
    rfeats.add("deletionVectors")
    wfeats.add("deletionVectors")
    return {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(rfeats),
        "writerFeatures": sorted(wfeats),
    }


def _stats_num_records(add: dict) -> int | None:
    """Physical row count from add.stats when the writer recorded it;
    None defers to a footer read executor-side (touched files only —
    a foreign table without stats must not cost the driver O(#files)
    footer reads for a one-file delete)."""
    stats = add.get("stats")
    if stats:
        try:
            n = json.loads(stats).get("numRecords")
            if n is not None:
                return int(n)
        except (ValueError, TypeError):
            pass
    return None


def _loosened_stats(add: dict) -> str | None:
    """add.stats with ``tightBounds: false`` — after a DV the min/max
    still bound the SURVIVING rows (loosely), numRecords stays the
    physical count (PROTOCOL.md §Per-file Statistics with DVs)."""
    stats = add.get("stats")
    if not stats:
        return None
    try:
        d = json.loads(stats)
    except (ValueError, TypeError):
        return stats
    d["tightBounds"] = False
    return json.dumps(d)


def _stage_cdf_deletes(
    spark,
    path: str,
    filtered,
    live: dict,
    meta: dict,
    schema_json: dict,
    logical_part_cols: list[str],
    ts: int,
) -> list[dict]:
    """PROTOCOL.md §Add CDC File: a DV delete's commit mixes a remove
    and a re-add of the SAME path, which is NOT derivable from
    add/remove actions — CDF writers must author the deleted rows as
    _change_data files. The change set is the matched rows MINUS
    positions already dead under a standing DV (they were reported
    deleted by the commit that killed them; emitting them again would
    double-count). Returns the staged ``{"cdc": ...}`` actions."""
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        stage_cdc_files,
    )

    changes = filtered
    dv_pairs = [
        (
            os.path.abspath(os.path.join(path, unquote(rel))),
            json.dumps(a["deletionVector"]),
        )
        for rel, a in live.items()
        if a.get("deletionVector")
    ]
    if dv_pairs:
        changes = _anti_join_existing_dvs(
            spark, changes, os.path.abspath(path), dv_pairs
        )
    logical_cols = [f["name"] for f in schema_json["fields"]]
    changes = changes.select(*logical_cols).withColumn(
        "_change_type", F.lit("delete")
    )
    return [
        {"cdc": c}
        for c in stage_cdc_files(changes, path, logical_part_cols, ts)
    ]


def build_dv_descriptors(spark, matched, path: str, live: dict) -> list:
    """Executor-side bitmap build shared by DELETE and MERGE: per
    touched file, union the newly matched positions with the file's
    existing DV (replace-descriptor semantics) and write the vector —
    unless the union covers every physical row, in which case no
    vector is written and the file is flagged for outright removal.
    ``matched`` is a DataFrame of (``_path`` decoded-abs string,
    ``_pos`` long); returns collected rows of (``_path``, ``_dv`` JSON
    or None, ``_card``). One exchange keyed on file path; the driver
    receives one descriptor row per touched file, never positions."""
    table_root = os.path.abspath(path)
    file_info = {
        os.path.abspath(os.path.join(path, unquote(rel))): (
            json.dumps(a["deletionVector"]) if a.get("deletionVector") else None,
            _stats_num_records(a),
        )
        for rel, a in live.items()
    }
    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(spark)
    # explicit broadcast: the per-file map is metadata-scale but a
    # closure pickle re-ships it with EVERY task — broadcast ships it
    # once per executor
    info_bc = spark.sparkContext.broadcast(file_info)

    def _build(pdf):
        import json as _json

        import pandas as _pd

        from incubator_gobblin_spark.formats.deletion_vectors import (
            read_dv_positions,
            write_dv_file,
        )

        fp = pdf["_path"].iloc[0]
        old_dv, nrec = info_bc.value[fp]
        if nrec is None:  # no stats: one footer read, touched files only
            import pyarrow.parquet as _pq

            nrec = _pq.read_metadata(fp).num_rows
        positions = set(int(p) for p in pdf["_pos"])
        if old_dv is not None:
            positions.update(read_dv_positions(table_root, _json.loads(old_dv)))
        if len(positions) >= nrec:
            return _pd.DataFrame(
                {"_path": [fp], "_dv": [None], "_card": [nrec]}
            )
        dv = write_dv_file(table_root, sorted(positions), storage="u")
        return _pd.DataFrame(
            {"_path": [fp], "_dv": [_json.dumps(dv)], "_card": [len(positions)]}
        )

    return (
        matched.groupBy("_path")
        .applyInPandas(_build, "_path string, _dv string, _card long")
        .collect()
    )


def _anti_join_existing_dvs(
    spark: SparkSession,
    df: DataFrame,
    table_root: str,
    dv_pairs: list[tuple[str, str]],
) -> DataFrame:
    """Drop from ``df`` (already carrying ``_file_path``/``_row_index``
    scan coordinates) the positions dead under the standing deletion
    vectors ``dv_pairs`` [(abs file path, descriptor json)]. Bitmaps
    decode executor-side, one task per vector (the read_delta shape)."""
    from incubator_gobblin_spark.sources.delta_import import (
        decoded_file_path,
    )
    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(spark)
    desc_df = spark.createDataFrame(
        dv_pairs, "_del_path string, _dv string"
    ).repartition(min(len(dv_pairs), 64))

    def expand(batches):
        import json as _json

        import pandas as pd

        from incubator_gobblin_spark.formats.deletion_vectors import (
            read_dv_positions,
        )

        for pdf in batches:
            for p, dv in zip(pdf["_del_path"], pdf["_dv"]):
                poss = read_dv_positions(table_root, _json.loads(dv))
                if poss:
                    yield pd.DataFrame(
                        {
                            "_del_path": p,
                            "_del_pos": pd.Series(poss, dtype="int64"),
                        }
                    )

    from incubator_gobblin_spark.sources.delta_import import (
        materialize_small,
    )

    # decode once: a semi/anti pushdown below the scan's partition
    # union would otherwise re-run the Python DV decode per union arm
    tombs = F.broadcast(
        materialize_small(
            desc_df.mapInPandas(expand, "_del_path string, _del_pos long")
        )
    )
    return df.withColumn(
        "_norm_path_cdc", decoded_file_path(F.col("_file_path"))
    ).join(
        tombs,
        (F.col("_norm_path_cdc") == F.col("_del_path"))
        & (F.col("_row_index") == F.col("_del_pos")),
        "left_anti",
    )


def delete_delta_rows(
    spark: SparkSession,
    path: str,
    condition=None,
    *,
    ids=None,
    on=None,
    union_threshold: int = 16,
    txn: tuple[str, int] | None = None,
) -> dict:
    """DELETE FROM the Delta table at ``path`` WHERE ``condition`` —
    committed as deletion vectors (PROTOCOL.md §Deletion Vectors), not
    file rewrites. ``condition`` is a Column or SQL string over the
    table's LOGICAL column names (column-mapped tables included, both
    modes; partition columns usable — they're restored before the
    filter).

    Returns ``{"version", "rows_deleted", "dv_files",
    "files_removed"}``; a zero-match delete commits nothing. Deleting
    from a file that already carries a DV unions the positions into a
    fresh vector (the protocol's replace-descriptor semantics); a file
    whose every physical row is now deleted is removed outright, no
    vector written.

    Purge form: pass ``ids`` (a DataFrame of keys) + ``on`` (the key
    column names) INSTEAD of ``condition`` — matching rows are found by
    a broadcast left-semi join (the GDPR-purge shape,
    ``jobs.purge.purge_lake``; reference
    HivePurgerQueryTemplate.java:82-89 is the same MAPJOIN with a
    whole-partition rewrite where this commits bitmaps). Exactly one
    of ``condition`` / ``ids`` must be given.

    Concurrency: the commit is the same put-if-absent ``os.link``
    publish as ``export_delta_log``. Losing the race re-replays — if
    the live state changed at all, the delete raises
    :class:`DeltaConcurrentModificationError` instead of committing
    positions computed against a stale snapshot.
    """
    if (condition is None) == (ids is None):
        raise ValueError(
            "delete_delta_rows: pass exactly one of condition / ids"
        )
    if ids is not None and not on:
        raise ValueError("delete_delta_rows: ids requires on=<key cols>")
    log_dir = os.path.join(path, "_delta_log")
    # pin the version FIRST, then replay exactly it: listing after the
    # replay would let a racer's commit land in between — versions[-1]
    # would equal current_v while the scanned state is stale, and the
    # commit-loop's re-replay guard would never fire (the Iceberg
    # writers' pin-then-load discipline)
    current_v = _log_versions(log_dir)[-1]
    live, meta, proto = _replay_state(log_dir, current_v)
    check_reader_protocol(proto, meta, live, allow_column_mapping=True)
    _check_delete_writable(proto, meta)
    if not live:
        return {
            "version": current_v,
            "rows_deleted": 0,
            "dv_files": 0,
            "files_removed": 0,
        }

    schema_json = json.loads(meta["schemaString"])
    logical_part_cols = list(meta.get("partitionColumns") or [])
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    phys_of = {
        f["name"]: (_cm_phys(f) if mode in ("name", "id") else f["name"])
        for f in schema_json.get("fields", [])
    }
    if mode == "name":
        schema = StructType.fromJson(_physicalize_type(schema_json))
        part_cols = [phys_of[c] for c in logical_part_cols]
        pv_keys = part_cols

        def _logicalize(df):
            if not _mapped_below(schema_json):
                return df
            return df.select(
                *[
                    _logical_expr(F.col(_cm_phys(f)), f["type"]).alias(
                        f["name"]
                    )
                    for f in schema_json["fields"]
                ],
                "_file_path",
                "_row_index",
            )

    elif mode == "id":
        schema = StructType.fromJson(_fieldid_type(schema_json))
        from incubator_gobblin_spark.session import ensure_field_id_read

        ensure_field_id_read(spark)
        part_cols = list(logical_part_cols)
        pv_keys = [phys_of[c] for c in logical_part_cols]

        def _logicalize(df):
            return df

    else:
        schema = StructType.fromJson(schema_json)
        part_cols = list(logical_part_cols)
        pv_keys = part_cols

        def _logicalize(df):
            return df

    table_root = os.path.abspath(path)
    groups: dict[tuple, list[str]] = {}
    by_abs: dict[str, str] = {}  # decoded abspath -> rel key in `live`
    for rel, a in live.items():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(k) for k in pv_keys)
        fp = os.path.join(path, unquote(rel))
        groups.setdefault(key, []).append(fp)
        by_abs[os.path.abspath(fp)] = rel

    df = assemble_snapshot(
        spark, groups, schema, part_cols, union_threshold,
        with_positions=True,
    )
    logical = _logicalize(df)
    if ids is not None:
        on_cols = [on] if isinstance(on, str) else list(on)
        filtered = logical.join(F.broadcast(ids), on=on_cols, how="left_semi")
    else:
        cond = (
            condition if isinstance(condition, Column) else F.expr(condition)
        )
        filtered = logical.filter(cond)
    cdf_on = (
        str(
            ((meta or {}).get("configuration") or {}).get(
                "delta.enableChangeDataFeed", ""
            )
        ).lower()
        == "true"
    )
    if cdf_on:
        # the matched set is consumed TWICE on CDF tables (bitmap
        # build + cdc staging) — cache it once instead of re-running
        # the full scan + predicate per consumer
        filtered = filtered.persist()
    matched = (
        filtered
        .select(
            decoded_file_path(F.col("_file_path")).alias("_path"),
            F.col("_row_index").alias("_pos"),
        )
    )

    try:
        desc_rows = build_dv_descriptors(spark, matched, path, live)
        if not desc_rows:
            return {
                "version": current_v,
                "rows_deleted": 0,
                "dv_files": 0,
                "files_removed": 0,
            }

        ts = int(_time.time() * 1000)
        cdc_actions = _stage_cdf_deletes(
            spark, path, filtered, live, meta, schema_json,
            logical_part_cols, ts,
        ) if cdf_on else []
    finally:
        if cdf_on:
            filtered.unpersist()
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": ts,
                "operation": "DELETE",
                "engineInfo": "incubator-gobblin-spark dv delete",
            }
        }
    ]
    if txn is not None:
        # PROTOCOL.md §Transaction Identifiers — the idempotent-writer
        # stamp (replication/streaming epochs); rides the same commit
        actions.append(
            {
                "txn": {
                    "appId": str(txn[0]),
                    "version": int(txn[1]),
                    "lastUpdated": ts,
                }
            }
        )
    actions.extend(cdc_actions)
    upgrade = _upgraded_protocol(proto)
    if upgrade is not None:
        actions.append({"protocol": upgrade})
    rows_deleted = 0
    dv_files = 0
    files_removed = 0
    for r in sorted(desc_rows, key=lambda x: x._path):
        rel = by_abs[r._path]
        old = live[rel]
        old_card = int(
            (old.get("deletionVector") or {}).get("cardinality") or 0
        )
        rows_deleted += int(r._card) - old_card
        remove = {
            "path": rel,
            "deletionTimestamp": ts,
            "dataChange": True,
            "extendedFileMetadata": True,
            "partitionValues": old.get("partitionValues") or {},
            "size": old.get("size"),
        }
        if old.get("deletionVector"):
            # vacuum needs the superseded vector's location to clean it
            remove["deletionVector"] = old["deletionVector"]
        actions.append({"remove": remove})
        if r._dv is None:
            files_removed += 1
            continue
        add = {**old, "deletionVector": json.loads(r._dv), "dataChange": True}
        loosened = _loosened_stats(old)
        if loosened is not None:
            add["stats"] = loosened
        actions.append({"add": add})
        dv_files += 1

    if rows_deleted == 0 and files_removed == 0:
        # every matched position was ALREADY dead (a replayed window's
        # keyed delete, the jobs.replicate crash-recovery path): the
        # new bitmaps equal the standing ones, so committing would add
        # a pure no-op version — skip it, like delta-spark's
        # zero-affected-rows DELETE. The freshly staged vectors are
        # orphans; reclaim them now.
        from incubator_gobblin_spark.formats.deletion_vectors import (
            dv_file_path,
        )

        for r in desc_rows:
            if r._dv is None:
                continue
            fp = dv_file_path(os.path.abspath(path), json.loads(r._dv))
            if fp:
                try:
                    os.remove(fp)
                except OSError:
                    pass
        for c in cdc_actions:
            try:
                os.remove(os.path.join(path, unquote(c["cdc"]["path"])))
            except OSError:
                pass
        return {
            "version": current_v,
            "rows_deleted": 0,
            "dv_files": 0,
            "files_removed": 0,
        }

    def _reclaim_staged() -> None:
        """An aborted DELETE's staged artifacts are orphans: the cdc
        sidecars AND the freshly written deletion-vector bitmaps (the
        no-op path above reclaims both; the abort paths must too, or
        every lost race on a contended table permanently accumulates
        unreferenced bitmap files for vacuum to sweep)."""
        from incubator_gobblin_spark.formats.deletion_vectors import (
            dv_file_path,
        )

        for c in cdc_actions:
            try:
                os.remove(os.path.join(path, unquote(c["cdc"]["path"])))
            except OSError:
                pass
        for r in desc_rows:
            if r._dv is None:
                continue
            fp = dv_file_path(os.path.abspath(path), json.loads(r._dv))
            if fp:
                try:
                    os.remove(fp)
                except OSError:
                    pass

    # put-if-absent publish; a racer invalidates the scanned snapshot
    for attempt in range(8):
        versions = _log_versions(log_dir)
        if versions[-1] != current_v:
            # a racer got in: re-replay and compare ALL of (live files,
            # metadata, protocol) — not just the file state. A
            # metadata-only racer can change obligations this DELETE
            # already validated against (enable appendOnly/CDF, add a
            # writer feature we don't implement), and committing our
            # protocol action computed from the OLD protocol would
            # silently drop the racer's upgraded feature list.
            now_live, now_meta, now_proto = _replay_state(log_dir, None)
            if now_live != live or now_meta != meta or now_proto != proto:
                _reclaim_staged()
                raise DeltaConcurrentModificationError(
                    f"delete_delta_rows: {path} advanced from version "
                    f"{current_v} to {versions[-1]} with state, "
                    "metadata, or protocol changes while this DELETE "
                    "was computing — re-run it"
                )
        version = versions[-1] + 1
        fname = os.path.join(log_dir, f"{version:020d}.json")
        tmp_f = f"{fname}.tmp-{os.getpid()}-{attempt}"
        with open(tmp_f, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        try:
            os.link(tmp_f, fname)
        except FileExistsError:
            os.remove(tmp_f)
            continue
        os.remove(tmp_f)
        return {
            "version": version,
            "rows_deleted": rows_deleted,
            "dv_files": dv_files,
            "files_removed": files_removed,
        }
    _reclaim_staged()
    raise DeltaConcurrentModificationError(
        f"delete_delta_rows: lost the commit race 8 times under {log_dir}"
    )
