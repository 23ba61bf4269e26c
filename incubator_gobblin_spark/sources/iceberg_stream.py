"""Streaming source over an external Apache Iceberg table's snapshots.

``spark.readStream.format("icebergstream").option("path", table_root)``
tails the table by SNAPSHOT: each micro-batch delivers the rows of the
data files ADDED by the snapshots that landed since the last
checkpointed offset — the streaming face of
``sources.iceberg_import.read_iceberg_incremental`` (iceberg-core
IncrementalAppendScan; iceberg-spark's own streaming read), and the
Iceberg sibling of ``sources.delta_stream``. The offset is the
consumed snapshot's SEQUENCE NUMBER (monotonic per the v2 spec, so it
survives ``expire_iceberg_snapshots`` history pruning, which a
list-position offset would not).

Contract (mirrors both delta_stream and the upstream scan): the
stream is append-only — a snapshot whose summary operation is not
``append`` fails the batch loudly (delete/overwrite/replace cannot be
expressed as an append stream), EXCEPT the first surviving snapshot
served to a fresh earliest-stream, which IS the initial table state
(operation ``overwrite`` is how this exporter self-contains snapshot
1 and how ``mode="full"`` compaction restarts a chain). ``option(
"skipchangecommits", "true")`` (delta-spark's name; iceberg-spark
spells it ``streaming-skip-overwrite-snapshots``) instead SKIPS
non-append snapshots entirely — zero duplicates, safe when the
rewrite preserves row content (this engine's ``mode="full"``
compaction), silently LOSSY for rewrites that change rows. Row-level
delete manifests refuse in served snapshots, and a checkpointed
offset that predates the surviving chain (expiry dropped unconsumed
snapshots) fails loudly rather than silently skipping rows.

Scale shape: snapshot replay is driver-side metadata (the range
manifests only); every added data file is one executor-side pyarrow
partition; identity partition values restore from the manifest's
typed partition struct.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _AddedFile(InputPartition):
    def __init__(self, path: str, partition_values: dict):
        self.path = path
        self.partition_values = partition_values


def _metadata(path: str) -> dict:
    from incubator_gobblin_spark.sources.iceberg_import import current_metadata

    return current_metadata(path)


def _field_id_map(path: str) -> dict[str, int]:
    """Top-level logical column name -> Iceberg field id (the spec's
    resolution key: data files written before a rename carry the OLD
    parquet name, so the stream reader matches by embedded field id
    when the file has ids, by name otherwise)."""
    md = _metadata(path)
    schema_json = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    return {f["name"]: int(f["id"]) for f in schema_json["fields"]}


def _table_schema(path: str):
    from pyspark.sql.types import StructField, StructType

    from incubator_gobblin_spark.sources.iceberg_import import _spark_type

    md = _metadata(path)
    schema_json = next(
        s for s in md["schemas"] if s["schema-id"] == md["current-schema-id"]
    )
    schema = StructType(
        [
            StructField(
                f["name"], _spark_type(f["type"]), not f.get("required")
            )
            for f in schema_json["fields"]
        ]
    )
    spec = next(
        s
        for s in md["partition-specs"]
        if s["spec-id"] == md["default-spec-id"]
    )
    fname = {f["id"]: f["name"] for f in schema_json["fields"]}
    part_cols = [
        fname[f["source-id"]]
        for f in spec["fields"]
        if f["transform"] == "identity"
    ]
    ftype = {f["name"]: f["type"] for f in schema_json["fields"]}
    return schema, part_cols, ftype


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema, part_cols, part_types):
        self.root = options["path"]
        self.start_opt = options.get("startingposition", "earliest").lower()
        self.skip_change_commits = (
            options.get("skipchangecommits", "false") == "true"
        )
        self.fields = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]
        self.part_cols = part_cols
        self.part_types = part_types
        # logical name -> Iceberg field id, resolved driver-side and
        # shipped with the (picklable) reader: executor tasks match
        # parquet columns by embedded field id when the file carries
        # ids — a column renamed after the file was written still
        # streams its values instead of nulls (top level; nested
        # members stream under the file's names, same caveat as the
        # delta stream)
        try:
            self.field_ids = _field_id_map(self.root)
        except Exception:
            self.field_ids = {}

    def _snaps(self) -> list[dict]:
        try:
            snaps = list(_metadata(self.root).get("snapshots", []))
        except FileNotFoundError:
            return []
        return sorted(snaps, key=self._seq_of)

    @staticmethod
    def _seq_of(snap: dict) -> int:
        # sequence-number is spec-required in v2; fall back to the
        # (also monotonic in this exporter) snapshot id defensively
        return int(snap.get("sequence-number", snap["snapshot-id"]))

    def initialOffset(self) -> dict:
        if self.start_opt == "latest":
            return self.latestOffset()
        return {"seq": 0}

    def latestOffset(self) -> dict:
        snaps = self._snaps()
        return {"seq": self._seq_of(snaps[-1]) if snaps else 0}

    def partitions(self, start: dict, end: dict):
        from incubator_gobblin_spark.sources.iceberg_import import (
            _decode_avro_rows,
            _local_path,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        snaps = self._snaps()
        in_range = [s for s in snaps if lo < self._seq_of(s) <= hi]
        # truncation guard (the delta_stream discipline): a previously
        # CHECKPOINTED offset that predates the surviving chain means
        # expire_iceberg_snapshots dropped unconsumed snapshots —
        # their rows are only reachable through a full re-read
        if (
            lo > 0
            and snaps
            and self._seq_of(snaps[0]) > lo + 1
            and in_range
        ):
            raise ValueError(
                f"icebergstream: snapshots ({lo}, "
                f"{self._seq_of(snaps[0])}) were expired; the stream's "
                "checkpointed offset predates the surviving history — "
                "restart from a fresh checkpoint"
            )
        def _op(s: dict) -> str:
            return s.get("summary", {}).get("operation", "append")

        parts: list[_AddedFile] = []

        def _emit(snap: dict, full_state: bool) -> None:
            """Append one snapshot's files: its ADDED entries, or —
            for the fresh stream's initial batch — its entire live
            state (carried manifests included)."""
            sid = snap["snapshot-id"]
            mlist = _local_path(snap["manifest-list"])
            if not os.path.isabs(mlist):
                mlist = os.path.join(self.root, mlist)
            for mf in _decode_avro_rows(mlist):
                if mf.get("content", 0) != 0:
                    if self.skip_change_commits and not full_state:
                        # the delete manifest belongs to a skipped
                        # change snapshot and is carried by reference —
                        # ignored like the snapshot itself (lossy for
                        # genuine row deletes, per the option's
                        # documented contract)
                        continue
                    raise ValueError(
                        "icebergstream: snapshot carries row-level "
                        "delete manifests — deletes cannot stream as "
                        "appends; use read_iceberg for the batch view"
                    )
                if (
                    not full_state
                    and int(mf.get("added_snapshot_id") or -1) != sid
                ):
                    continue  # carried by reference: already streamed
                mpath = _local_path(mf["manifest_path"])
                if not os.path.isabs(mpath):
                    mpath = os.path.join(self.root, mpath)
                for entry in _decode_avro_rows(mpath):
                    if full_state:
                        if entry["status"] == 2:  # DELETED
                            continue
                    else:
                        if entry["status"] != 1:  # ADDED only
                            continue
                        if (
                            entry.get("snapshot_id") is not None
                            and int(entry["snapshot_id"]) != sid
                        ):
                            continue
                    df_ = entry["data_file"]
                    fp = _local_path(df_["file_path"])
                    if not os.path.isabs(fp):
                        fp = os.path.join(self.root, fp)
                    parts.append(
                        _AddedFile(fp, dict(df_.get("partition") or {}))
                    )

        if lo == 0 and in_range:
            # fresh earliest-stream: batch 0 is the LAST full-state
            # snapshot in range (the chain start, a full-mode
            # compaction, or the first snapshot surviving expiry) as
            # the initial table state, then every append after it —
            # the delta_stream checkpoint-snapshot discipline
            non_append = [s for s in in_range if _op(s) != "append"]
            init_snap = non_append[-1] if non_append else in_range[0]
            _emit(init_snap, full_state=True)
            for snap in in_range[in_range.index(init_snap) + 1 :]:
                _emit(snap, full_state=False)  # appends by construction
        else:
            for snap in in_range:
                if _op(snap) != "append":
                    if self.skip_change_commits:
                        # skip the rewrite snapshot ENTIRELY — its
                        # files' rows were already streamed if the
                        # rewrite preserved content (mode="full"
                        # compaction); later appends carry its
                        # manifests by reference, which _emit's
                        # added_snapshot_id filter ignores
                        continue
                    raise ValueError(
                        f"icebergstream: snapshot {snap['snapshot-id']} "
                        f"is operation={_op(snap)!r} — not an append; "
                        "set skipChangeCommits to skip rewrite "
                        "snapshots whose rows were already served, or "
                        "restart the stream from a fresh checkpoint "
                        "after the rewrite"
                    )
                _emit(snap, full_state=False)
        return parts or [_AddedFile("", {})]

    def _cast_part(self, ddl_type: str, v):
        if v is None:
            return None
        if ddl_type in ("bigint", "int", "smallint", "tinyint"):
            return int(v)
        if ddl_type in ("double", "float"):
            return float(v)
        if ddl_type == "string":
            return str(v)
        if ddl_type == "date":
            import datetime

            return (
                v
                if isinstance(v, datetime.date)
                else datetime.date.fromisoformat(str(v))
            )
        raise ValueError(
            f"icebergstream: unsupported partition column type {ddl_type}"
        )

    def read(self, part: _AddedFile):
        if not part.path:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(part.path)
        n = table.num_rows
        # field-id index of THIS file's columns (empty when the file
        # carries no ids — this engine's own exports match by name)
        by_id: dict[int, str] = {}
        for f in table.schema:
            m = (f.metadata or {}).get(b"PARQUET:field_id")
            if m is not None:
                try:
                    by_id[int(m)] = f.name
                except ValueError:
                    pass
        cols = {}
        for name, ddl in self.fields:
            fid = self.field_ids.get(name)
            # Spec: id-carrying files resolve by id ONLY — after a
            # rename-then-re-add (old "a" -> "b", new "a" added), a
            # name fallback would misread the OLD column's values into
            # the new column. A missing id in an id-carrying file
            # yields null; name matching applies only to id-less files
            # (identity name-mapping).
            if by_id and fid is not None:
                src = by_id.get(fid)
            else:
                src = name
            if name in self.part_cols:
                cols[name] = [
                    self._cast_part(ddl, part.partition_values.get(name))
                ] * n
            elif src is not None and src in table.column_names:
                cols[name] = table.column(src).to_pylist()
            else:
                cols[name] = [None] * n
        for i in range(n):
            yield tuple(cols[name][i] for name, _ in self.fields)

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("icebergstream").option("path", root)``."""

    def __init__(self, options):
        super().__init__(options)
        self.options = {k.lower(): v for k, v in options.items()}

    @classmethod
    def name(cls):
        return "icebergstream"

    def schema(self):
        schema, _, _ = _table_schema(self.options["path"])
        return schema

    def streamReader(self, schema):
        _, part_cols, part_types = _table_schema(self.options["path"])
        return IcebergStreamReader(
            self.options, schema, part_cols, part_types
        )


def register(spark) -> None:
    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(spark)
    spark.dataSource.register(IcebergStreamDataSource)
