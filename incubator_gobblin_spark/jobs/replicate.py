"""Cross-format CDC replication: keep a Delta table in sync with an
Iceberg table (and vice versa) by replaying row-level changes — the
reference's replication flows (gobblin-data-management copy/replication
configs, CopySource + the kafka-common CDC consumption shape) at ROW
granularity instead of file granularity, built on this engine's
changelog/CDF readers and CDC writers.

Both directions are incremental batch loops (run them on a schedule —
``jobs.spec.ScheduleDriver`` — or after each upstream commit) with an
exactly-once watermark stored IN the destination table, so a crash
anywhere replans the identical window from the last committed state:

- Iceberg -> Delta: the consumed snapshot SEQUENCE NUMBER (monotonic
  per the Iceberg spec) rides the destination's ``txn`` /
  SetTransaction action (PROTOCOL.md §Transaction Identifiers) on the
  FINAL commit of each window. A window applies as (a) a keyed
  DV-DELETE of the net-deleted keys, then (b) one merge-on-read MERGE
  of the net-upserted rows carrying the txn stamp; a crash between the
  two replays a window whose deletes are already dead (zero-match: no
  commit) and whose merge is idempotent by key.
- Delta -> Iceberg: the consumed Delta VERSION (monotonic by
  construction) rides the Iceberg table properties on the SAME atomic
  metadata commit as the data (the ``jobs.kafka_ingest`` trick):
  net-deleted keys and net-upserted keys become ONE equality-delete
  manifest, the upserted rows one same-sequence data manifest — one
  commit, exactly-once, with a monotonic max-merge against racers.

The window reduction is the standard CDC collapse: the LAST change per
key decides (insert/update_postimage = survive with that row,
delete/update_preimage = gone), computed with one window function over
the change feed.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SURVIVES = ("insert", "update_postimage")


def _net_outcome(
    changes: DataFrame, on: Sequence[str], order_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Collapse a change feed to its net outcome per key: (upsert rows
    in table-column shape, deleted key rows). ``order_cols`` sequence
    the feed (commit version / change ordinal); within one commit a
    surviving change outranks its paired preimage/delete."""
    on = list(on)
    w = Window.partitionBy(*on).orderBy(
        *[F.col(c).desc() for c in order_cols],
        F.when(F.col("_change_type").isin(*_SURVIVES), 1)
        .otherwise(0)
        .desc(),
    )
    last = changes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    drop = ["_rn", "_change_type", *order_cols]
    upserts = last.filter(F.col("_change_type").isin(*_SURVIVES)).drop(*drop)
    deleted = (
        last.filter(~F.col("_change_type").isin(*_SURVIVES))
        .select(*on)
        .distinct()
    )
    return upserts, deleted


def replicate_iceberg_to_delta(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    on,
    max_snapshots_per_window: int | None = None,
) -> dict:
    """One incremental replication run: apply the src Iceberg table's
    changelog since the last consumed snapshot to the dst Delta table.
    First run bootstraps dst from the src snapshot. A backlog deeper
    than ``max_snapshots_per_window`` (default: the changelog reader's
    ``MAX_SNAPSHOTS_PER_CALL``) is consumed in CHUNKS, each chunk one
    atomic apply carrying its own consumed-watermark txn stamp — a
    crash mid-backlog resumes at the last committed chunk. Returns
    ``{"bootstrapped", "from_sequence", "to_sequence",
    "rows_upserted", "keys_deleted"}``."""
    from incubator_gobblin_spark.sinks.delta_delete import (
        delete_delta_rows,
    )
    from incubator_gobblin_spark.sinks.delta_maintenance import (
        merge_delta_rows,
        write_delta_table,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        last_txn_actions,
    )
    from incubator_gobblin_spark.sources.iceberg_changelog import (
        MAX_SNAPSHOTS_PER_CALL,
        _lineage,
        read_iceberg_changelog,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    window_cap = (
        MAX_SNAPSHOTS_PER_CALL
        if max_snapshots_per_window is None
        else int(max_snapshots_per_window)
    )
    if window_cap <= 0:
        raise ValueError(
            "replicate_iceberg_to_delta: max_snapshots_per_window must "
            f"be positive, got {window_cap}"
        )

    on_cols = [on] if isinstance(on, str) else list(on)
    app = f"iceberg-repl:{os.path.abspath(src_path)}"
    meta = current_metadata(src_path)
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    cur_id = meta.get("current-snapshot-id")
    if cur_id is None or cur_id not in by_id:
        raise FileNotFoundError(
            f"replicate_iceberg_to_delta: {src_path} has no current snapshot"
        )
    if "sequence-number" not in by_id[cur_id]:
        # a v1 table's snapshots carry no sequence numbers: the
        # watermark would default to 0 on every run and the loop would
        # silently never replicate another commit — refuse instead
        raise ValueError(
            "replicate_iceberg_to_delta: the source table's snapshots "
            "carry no sequence-number (Iceberg format v1) — the "
            "monotonic consumed-sequence watermark requires format v2"
        )
    cur_seq = int(by_id[cur_id]["sequence-number"])

    log_dir = os.path.join(dst_path, "_delta_log")
    exists = os.path.isdir(log_dir) and _log_versions(log_dir)
    if not exists:
        # bootstrap: the pinned src snapshot becomes dst version 0,
        # the consumed watermark rides an empty txn-stamped MERGE
        snap = read_iceberg(spark, src_path, snapshot_id=cur_id)
        write_delta_table(spark, snap, dst_path)
        merge_delta_rows(
            spark, dst_path, snap.limit(0), on=on_cols, txn=(app, cur_seq)
        )
        return {
            "bootstrapped": True,
            "from_sequence": None,
            "to_sequence": cur_seq,
            "rows_upserted": 0,
            "keys_deleted": 0,
        }

    last_seq = int(
        last_txn_actions(log_dir).get(app, {}).get("version", -1)
    )
    if last_seq < 0:
        raise ValueError(
            f"replicate_iceberg_to_delta: {dst_path} exists but carries "
            f"no consumed watermark for {app} — it was not bootstrapped "
            "by this replication; refusing to guess a starting snapshot"
        )
    if cur_seq <= last_seq:
        return {
            "bootstrapped": False,
            "from_sequence": last_seq,
            "to_sequence": last_seq,
            "rows_upserted": 0,
            "keys_deleted": 0,
        }
    from_id = next(
        (
            s["snapshot-id"]
            for s in meta["snapshots"]
            if int(s.get("sequence-number", -1)) == last_seq
        ),
        None,
    )
    if from_id is None:
        raise ValueError(
            f"replicate_iceberg_to_delta: the consumed snapshot "
            f"(sequence {last_seq}) was expired from {src_path} — "
            "re-bootstrap the destination"
        )

    chain = _lineage(meta, from_id, cur_id)
    # v1-to-v2 upgraded tables: the CURRENT snapshot carries a
    # sequence-number (checked above) but pre-upgrade snapshots in the
    # chain may not. Defaulting a chunk watermark to 0 would regress
    # last_seq below already-consumed sequences (or strand the resume
    # lookup on a sequence no snapshot reports) — refuse the whole run
    # up front, before any chunk commits, with the same v2-required
    # error the all-v1 case gets.
    no_seq = [s["snapshot-id"] for s in chain if "sequence-number" not in s]
    if no_seq:
        raise ValueError(
            "replicate_iceberg_to_delta: snapshot(s) "
            f"{no_seq} in the replication chain carry no "
            "sequence-number (written under Iceberg format v1 before "
            "an upgrade) — the monotonic consumed-sequence watermark "
            "requires format v2 history; re-bootstrap the destination "
            "from the current snapshot instead"
        )
    total_up = total_del = 0
    start_id = from_id
    for i in range(0, len(chain), window_cap):
        window = chain[i : i + window_cap]
        to_id_w = window[-1]["snapshot-id"]
        to_seq_w = int(window[-1]["sequence-number"])
        ch = read_iceberg_changelog(
            spark, src_path, start_id, to_id_w, max_snapshots=window_cap
        )
        upserts, deleted = _net_outcome(
            ch.drop("_commit_snapshot_id"), on_cols, ["_change_ordinal"]
        )
        # the collapse re-executes the multi-arm changelog scan on
        # every action (count, delete, merge) — cache it once per
        # window instead of re-reading every changed file 3×
        upserts = upserts.persist()
        deleted = deleted.persist()
        try:
            n_del = deleted.count()
            if n_del:
                # dead keys first; the txn stamp rides the FINAL
                # commit of the chunk so a crash between the two
                # replays the chunk (idempotently)
                delete_delta_rows(
                    spark, dst_path, ids=deleted, on=on_cols
                )
            res = merge_delta_rows(
                spark, dst_path, upserts, on=on_cols, txn=(app, to_seq_w)
            )
        finally:
            upserts.unpersist()
            deleted.unpersist()
        total_up += res["rows_inserted"]
        total_del += n_del
        start_id = to_id_w
    return {
        "bootstrapped": False,
        "from_sequence": last_seq,
        "to_sequence": cur_seq,
        "rows_upserted": total_up,
        "keys_deleted": total_del,
    }


def replicate_delta_to_iceberg(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    on,
    max_versions_per_window: int | None = None,
) -> dict:
    """One incremental replication run: apply the src Delta table's
    change data feed since the last consumed version to the dst
    Iceberg table as ONE atomic commit per window (equality deletes
    for net deletions + upserted keys, same-sequence append of the
    upserted rows, consumed-version watermark in the table
    properties). First run bootstraps dst from the src snapshot. A
    backlog deeper than ``max_versions_per_window`` (default: the CDF
    reader's ``MAX_VERSIONS_PER_CALL``) is consumed in CHUNKS, each
    chunk's watermark riding its own atomic commit — a crash
    mid-backlog resumes at the last committed chunk. The src table
    must have ``delta.enableChangeDataFeed`` for the replicated
    window. Returns ``{"bootstrapped", "from_version", "to_version",
    "rows_upserted", "keys_deleted"}``."""
    from incubator_gobblin_spark.sinks.iceberg_maintenance import (
        set_iceberg_table_properties,
        upsert_iceberg_rows,
        write_iceberg_table,
    )
    from incubator_gobblin_spark.sources.delta_cdf import (
        MAX_VERSIONS_PER_CALL,
        read_delta_changes,
    )
    from incubator_gobblin_spark.sources.delta_import import (
        _log_versions,
        read_delta,
    )
    from incubator_gobblin_spark.sources.iceberg_import import (
        current_metadata,
        read_iceberg,
    )

    window_cap = (
        MAX_VERSIONS_PER_CALL
        if max_versions_per_window is None
        else int(max_versions_per_window)
    )
    if window_cap <= 0:
        # a negative cap would make the chunk loop below DECREASE
        # start_v and never exit, committing metadata versions forever
        raise ValueError(
            "replicate_delta_to_iceberg: max_versions_per_window must "
            f"be positive, got {window_cap}"
        )
    on_cols = [on] if isinstance(on, str) else list(on)
    prop_key = f"replication.delta.version.{os.path.abspath(src_path)}"
    src_log = os.path.join(src_path, "_delta_log")
    cur_v = _log_versions(src_log)[-1]

    def _watermark_to(v: int):
        def _wm(cur_props: dict) -> dict:
            stored = int((cur_props or {}).get(prop_key, -1))
            return {prop_key: str(max(stored, v))}

        return _wm

    _watermark = _watermark_to(cur_v)

    try:
        dst_meta = current_metadata(dst_path)
    except FileNotFoundError:
        dst_meta = None
    if dst_meta is None:
        snap = read_delta(spark, src_path, version=cur_v)
        write_iceberg_table(spark, snap, dst_path)
        set_iceberg_table_properties(dst_path, _watermark)
        return {
            "bootstrapped": True,
            "from_version": None,
            "to_version": cur_v,
            "rows_upserted": 0,
            "keys_deleted": 0,
        }

    raw = (dst_meta.get("properties") or {}).get(prop_key)
    if raw is None:
        raise ValueError(
            f"replicate_delta_to_iceberg: {dst_path} exists but carries "
            f"no consumed watermark ({prop_key}) — it was not "
            "bootstrapped by this replication; refusing to guess a "
            "starting version"
        )
    last_v = int(raw)
    if cur_v <= last_v:
        return {
            "bootstrapped": False,
            "from_version": last_v,
            "to_version": last_v,
            "rows_upserted": 0,
            "keys_deleted": 0,
        }

    total_up = total_del = 0
    start_v = last_v + 1
    while start_v <= cur_v:
        end_v = min(start_v + window_cap - 1, cur_v)
        wm = _watermark_to(end_v)
        ch = read_delta_changes(
            spark, src_path, start_v, end_v, max_versions=window_cap
        )
        upserts, deleted = _net_outcome(
            ch.drop("_commit_timestamp"), on_cols, ["_commit_version"]
        )
        # cache the collapse: isEmpty + the apply each re-execute the
        # per-commit union scan otherwise
        upserts = upserts.persist()
        deleted = deleted.persist()
        try:
            if deleted.isEmpty() and upserts.isEmpty():
                # net-empty chunk (e.g. insert-then-delete): advance
                # the watermark through a properties-only version
                set_iceberg_table_properties(dst_path, wm)
            else:
                res = upsert_iceberg_rows(
                    spark,
                    dst_path,
                    upserts,
                    on=on_cols,
                    extra_delete_keys=deleted,
                    table_properties=wm,
                )
                if res["rows_inserted"] == 0 and res["delete_files"] == 0:
                    set_iceberg_table_properties(dst_path, wm)
                total_up += res["rows_inserted"]
                total_del += (
                    res["keys_deleted"] - res["rows_inserted"]
                    if res["keys_deleted"] >= res["rows_inserted"]
                    else 0
                )
        finally:
            upserts.unpersist()
            deleted.unpersist()
        start_v = end_v + 1
    return {
        "bootstrapped": False,
        "from_version": last_v,
        "to_version": cur_v,
        "rows_upserted": total_up,
        "keys_deleted": total_del,
    }
