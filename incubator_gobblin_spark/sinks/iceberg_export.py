"""Export the committed manifest-lake snapshot as Apache Iceberg table
metadata — the third interop surface next to ``export_delta_log`` and
``export_symlink_manifest``, closing the reference's Iceberg metadata
path (gobblin-iceberg ``.../writer/GobblinMCEWriter.java:81``, which
emits Iceberg metadata change events for committed Gobblin datasets).

The Iceberg table spec is public (iceberg.apache.org/spec/): a table is
a ``metadata/`` directory holding

- ``vN.metadata.json`` — format-version 2 table metadata: schema with
  stable field ids, identity partition spec, the snapshot list, and the
  current snapshot pointer;
- ``version-hint.text`` — the filesystem-catalog pointer to the latest
  metadata version (HadoopCatalog/StaticTable layout);
- one Avro *manifest list* per snapshot (``snap-<id>-...avro``) whose
  rows describe manifest files;
- Avro *manifest files* whose rows describe the live data files
  (status, path, format, partition values, record count, size).

Both Avro layers are written with the in-repo OCF codec
(``formats/avro_ocf.py``) carrying the spec's field-id annotations and
required header metadata ("schema", "partition-spec", "format-version",
"content"), so an Iceberg reader (pyiceberg StaticTable, Spark+Iceberg,
Trino) pointed at the lake root sees exactly the committed files.

Export semantics mirror ``export_delta_log``: each call appends ONE
snapshot reflecting the current committed manifest; a no-change export
writes nothing (detected via a state fingerprint in the snapshot
summary); metadata versions are published put-if-absent (``os.link``)
so concurrent exporters — legal, because the lake's commit CAS allows
concurrent committers — serialize by losing the race and re-reading.
Every snapshot is self-contained: one fresh manifest listing ALL live
files as ADDED (operation "overwrite"), which is spec-valid and keeps
the export a pure, stateless projection of the manifest — at the cost
of rewriting one metadata Avro per export (driver-side metadata,
O(files), no data read or Spark job).

Offline caveat (stated for honesty): no Iceberg engine exists in this
environment, so conformance is pinned structurally — replay-equals-
snapshot round trips through ``sources.iceberg_import.read_iceberg``,
spec-required fields asserted, plus a hand-authored spec-example parse
test — rather than by a foreign engine end-to-end.
"""

from __future__ import annotations

import json
import os
import time
import uuid

_INITIAL_PARTITION_FIELD_ID = 1000  # iceberg spec: partition field ids start here


def _iceberg_type(t, next_id) -> object:
    """pyarrow type -> Iceberg schema type (JSON shape). ``next_id`` is
    a callable allocating nested field ids. Unmapped physical types
    raise loudly rather than emitting metadata a reader would
    misparse."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "boolean"
    if (
        pa.types.is_int8(t)
        or pa.types.is_int16(t)
        or pa.types.is_int32(t)
    ):
        return "int"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # our lake writes UTC-session Spark timestamps -> with zone
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        eid = next_id()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(t.value_type, next_id),
            "element-required": False,
        }
    if pa.types.is_struct(t):
        fields = []
        for i in range(t.num_fields):
            f = t.field(i)
            fid = next_id()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": False,
                    "type": _iceberg_type(f.type, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    if pa.types.is_map(t):
        kid, vid = next_id(), next_id()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(t.key_type, next_id),
            "value-id": vid,
            "value": _iceberg_type(t.item_type, next_id),
            "value-required": False,
        }
    raise ValueError(f"export_iceberg: unmapped parquet type {t!r}")


def _iceberg_schema(
    parquet_file: str,
    partition_cols: list[str],
    partition_values: list[dict],
) -> tuple[dict, int, dict[str, str]]:
    """Iceberg schema JSON from one committed parquet footer + the
    manifest's partition evidence (Hive-partitioned data files don't
    store partition columns; all-integer path values export as ``long``,
    anything else as ``string`` — the same inference Spark's partition
    discovery applies). Returns (schema, last_column_id,
    partition col -> iceberg type)."""
    import pyarrow.parquet as pq

    counter = {"id": 0}

    def next_id() -> int:
        counter["id"] += 1
        return counter["id"]

    fields = []
    arrow = pq.read_schema(parquet_file)
    for name in arrow.names:
        fid = next_id()
        fields.append(
            {
                "id": fid,
                "name": name,
                "required": False,
                "type": _iceberg_type(arrow.field(name).type, next_id),
            }
        )
    part_types: dict[str, str] = {}
    for c in partition_cols:
        vals = [pv.get(c) for pv in partition_values]

        def _is_int(v) -> bool:
            try:
                int(v)
                return True
            except (TypeError, ValueError):
                return False

        t = (
            "long"
            if vals and all(v is None or _is_int(v) for v in vals)
            and any(v is not None for v in vals)
            else "string"
        )
        part_types[c] = t
        fields.append(
            {"id": next_id(), "name": c, "required": False, "type": t}
        )
    schema = {"type": "struct", "schema-id": 0, "fields": fields}
    return schema, counter["id"], part_types


def _partition_struct_avro(
    partition_cols: list[str], part_types: dict[str, str]
) -> dict:
    """Avro schema of the manifest's data_file.partition struct (r102):
    one nullable field per identity partition column, field-ids from
    the spec's partition range."""
    avro_of = {"long": "long", "string": "string"}
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": c,
                "type": ["null", avro_of[part_types[c]]],
                "default": None,
                "field-id": _INITIAL_PARTITION_FIELD_ID + i,
            }
            for i, c in enumerate(partition_cols)
        ],
    }


def _manifest_entry_avro(partition_struct: dict) -> dict:
    """Avro schema for manifest-file rows (spec: manifest_entry, v2)."""
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "type": partition_struct,
                            "field-id": 102,
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                    ],
                },
            },
        ],
    }


_MANIFEST_LIST_AVRO = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _metadata_versions(meta_dir: str) -> list[int]:
    out = []
    for f in os.listdir(meta_dir):
        if f.startswith("v") and f.endswith(".metadata.json"):
            stem = f[1 : -len(".metadata.json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _typed_partition_value(v, iceberg_type: str):
    if v is None:
        return None
    return int(v) if iceberg_type == "long" else str(v)


def export_iceberg(sink, as_of_run: str | None = None) -> str:
    """Append one Iceberg snapshot reflecting ``sink``'s committed
    manifest (see module docstring). Returns the ``metadata/`` dir."""
    from urllib.parse import unquote

    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf

    if sink.fmt != "parquet":
        raise ValueError("export_iceberg requires a parquet lake")
    manifest = sink.current_manifest(as_of_run, materialize=False)
    if manifest is None:
        raise FileNotFoundError(f"no committed manifest under {sink.path}")
    if "groups" in manifest:
        entries = [
            e for g in manifest["groups"] for e in sink._load_group(g)
        ]
    else:
        entries = manifest["entries"]

    location = os.path.abspath(sink.path)
    meta_dir = os.path.join(location, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    part_cols = list(sink.partition_by)

    files: list[dict] = []
    for e in sorted(entries, key=lambda x: x["file"]):
        fp = os.path.join(location, e["file"])
        pvals: dict[str, str] = {}
        if e.get("partition"):
            for seg in e["partition"].replace(os.sep, "/").split("/"):
                k, _, v = seg.partition("=")
                pvals[k] = unquote(v)
        rows = e.get("rows")
        if rows is None:
            import pyarrow.parquet as pq

            rows = pq.ParquetFile(fp).metadata.num_rows
        files.append(
            {
                "path": fp,
                "partition": pvals,
                "rows": int(rows),
                "size": os.path.getsize(fp),
            }
        )

    import hashlib

    fingerprint = hashlib.sha256(
        json.dumps(
            [(f["path"], f["size"]) for f in files], sort_keys=True
        ).encode()
    ).hexdigest()

    if files:
        schema, last_column_id, part_types = _iceberg_schema(
            files[0]["path"], part_cols, [f["partition"] for f in files]
        )
    else:
        # empty committed manifest (e.g. after a full purge): no footer
        # to infer from, but the spec fields and partition struct still
        # need typed columns — default each partition column to string
        # so an empty snapshot exports instead of raising KeyError
        schema = {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": i + 1, "name": c, "required": False, "type": "string"}
                for i, c in enumerate(part_cols)
            ],
        }
        last_column_id = len(part_cols)
        part_types = {c: "string" for c in part_cols}
    field_id = {f["name"]: f["id"] for f in schema["fields"]}
    spec = {
        "spec-id": 0,
        "fields": [
            {
                "name": c,
                "transform": "identity",
                "source-id": field_id[c],
                "field-id": _INITIAL_PARTITION_FIELD_ID + i,
            }
            for i, c in enumerate(part_cols)
        ],
    }

    # Put-if-absent loop, the export_delta_log discipline: each attempt
    # reads the latest metadata version, skips if the state fingerprint
    # already matches, and publishes vN+1 via os.link (atomic appear,
    # EEXIST on a lost race -> re-read and retry at the next version).
    for attempt in range(64):
        versions = _metadata_versions(meta_dir)
        prev = None
        if versions:
            with open(
                os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")
            ) as fh:
                prev = json.load(fh)
        snapshots = list(prev["snapshots"]) if prev else []
        if snapshots and snapshots[-1]["summary"].get(
            "engine.state-fingerprint"
        ) == fingerprint:
            return meta_dir  # snapshot unchanged: no empty commit

        version = (versions[-1] if versions else 0) + 1
        sid = len(snapshots) + 1  # deterministic, monotonic snapshot id
        seq = sid
        ts = int(time.time() * 1000)
        commit_uuid = str(
            uuid.uuid5(uuid.NAMESPACE_URL, f"{location}#{sid}#{fingerprint}")
        )

        # --- manifest file (all live files ADDED in this snapshot) ---
        part_struct = _partition_struct_avro(part_cols, part_types)
        entry_schema = _manifest_entry_avro(part_struct)
        manifest_rows = [
            {
                "status": 1,  # ADDED
                "snapshot_id": sid,
                "sequence_number": seq,
                "file_sequence_number": seq,
                "data_file": {
                    "content": 0,  # DATA
                    # file:// URI per the Iceberg spec (foreign engines
                    # resolve URIs, not bare POSIX paths)
                    "file_path": "file://" + f["path"],
                    "file_format": "PARQUET",
                    "partition": {
                        c: _typed_partition_value(
                            f["partition"].get(c), part_types[c]
                        )
                        for c in part_cols
                    },
                    "record_count": f["rows"],
                    "file_size_in_bytes": f["size"],
                },
            }
            for f in files
        ]
        manifest_name = f"{commit_uuid}-m0.avro"
        manifest_path = os.path.join(meta_dir, manifest_name)
        manifest_bytes = encode_ocf(
            entry_schema,
            manifest_rows,
            codec="null",
            extra_meta={
                "schema": json.dumps(schema).encode(),
                "partition-spec": json.dumps(spec["fields"]).encode(),
                "partition-spec-id": b"0",
                "format-version": b"2",
                "content": b"data",
            },
        )
        tmp = f"{manifest_path}.tmp-{os.getpid()}-{attempt}"
        with open(tmp, "wb") as fh:
            fh.write(manifest_bytes)
        os.replace(tmp, manifest_path)

        # --- manifest list ---
        snap_name = f"snap-{sid}-1-{commit_uuid}.avro"
        snap_path = os.path.join(meta_dir, snap_name)
        list_bytes = encode_ocf(
            _MANIFEST_LIST_AVRO,
            [
                {
                    "manifest_path": "file://" + manifest_path,
                    "manifest_length": len(manifest_bytes),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": sid,
                    "added_files_count": len(files),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(f["rows"] for f in files),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            ],
            codec="null",
            extra_meta={"format-version": b"2"},
        )
        tmp = f"{snap_path}.tmp-{os.getpid()}-{attempt}"
        with open(tmp, "wb") as fh:
            fh.write(list_bytes)
        os.replace(tmp, snap_path)

        # --- table metadata ---
        snapshot = {
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": ts,
            "summary": {
                "operation": "overwrite",
                "engine.state-fingerprint": fingerprint,
            },
            "manifest-list": "file://" + snap_path,
            "schema-id": 0,
        }
        if snapshots:
            snapshot["parent-snapshot-id"] = snapshots[-1]["snapshot-id"]
        metadata = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
            "location": location,
            "last-sequence-number": seq,
            "last-updated-ms": ts,
            "last-column-id": last_column_id,
            "current-schema-id": 0,
            "schemas": [schema],
            "default-spec-id": 0,
            "partition-specs": [spec],
            "last-partition-id": _INITIAL_PARTITION_FIELD_ID
            - 1
            + len(part_cols),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": sid,
            "snapshots": snapshots + [snapshot],
            "snapshot-log": (prev or {}).get("snapshot-log", [])
            + [{"timestamp-ms": ts, "snapshot-id": sid}],
            "metadata-log": [],
        }
        meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
        tmp = f"{meta_path}.tmp-{os.getpid()}-{attempt}"
        with open(tmp, "w") as fh:
            json.dump(metadata, fh, indent=1)
        try:
            os.link(tmp, meta_path)  # put-if-absent publish
        except FileExistsError:
            os.remove(tmp)
            # Lost the race: unlink this attempt's Avro files or they
            # orphan in metadata/ forever (including when the retry then
            # hits the fingerprint no-change skip). EXCEPT when the
            # winner published the same (sid, fingerprint) state — the
            # deterministic commit uuid then makes our names the
            # winner's names, and deleting them would break the
            # winner's snapshot; keep exactly those.
            try:
                with open(meta_path) as fh:
                    winner = json.load(fh)
                referenced = {
                    os.path.basename(s["manifest-list"])
                    for s in winner.get("snapshots", [])
                }
            except (OSError, ValueError, KeyError):
                referenced = {snap_name}  # unreadable: keep, never break
            if snap_name not in referenced:
                for orphan in (manifest_path, snap_path):
                    try:
                        os.remove(orphan)
                    except OSError:
                        pass
            continue  # re-read, retry at next version
        os.remove(tmp)

        # version-hint is a HINT (HadoopCatalog semantics): last writer
        # wins, and a stale hint only costs readers a re-list
        hint_tmp = os.path.join(meta_dir, f".hint.tmp-{os.getpid()}")
        with open(hint_tmp, "w") as fh:
            fh.write(str(version))
        os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
        return meta_dir
    raise RuntimeError(
        f"export_iceberg: lost the metadata-version race 64 times under "
        f"{meta_dir} — a runaway concurrent exporter is appending "
        f"versions faster than this one can re-read"
    )
