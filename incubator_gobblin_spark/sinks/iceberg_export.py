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
The FIRST snapshot is self-contained (one manifest, all live files
ADDED, operation "overwrite"); subsequent exports append INCREMENTALLY
(the Delta exporter's diff economics): previous manifests carry by
reference in the new manifest list, one new manifest holds only the
added files, and manifests containing removed files are rewritten with
those entries DELETED (survivors EXISTING, lineage kept). Per-export
metadata WRITES are O(added + entries of touched manifests) and the
diff READ is O(live entries) — all driver-side metadata, no data read,
no Spark job; ``mode="full"`` forces a self-contained snapshot to
compact the manifest chain.

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
            # plain ASCII digits only (optional sign) — Python's
            # int() also accepts underscore/whitespace forms
            # ("2024_01" -> 202401) that Spark's partition discovery
            # (the behavioral reference) treats as strings; exporting
            # them as long would fabricate values
            s = str(v)
            if s.startswith("-"):
                s = s[1:]
            return s.isascii() and s.isdigit()

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


def _name_mapping(schema: dict) -> list:
    """The spec's name-mapping (iceberg spec §Name Mapping
    Serialization) for this schema: JSON entries mapping column NAMES
    to field IDS, recursively (list elements as ["element"], map
    entries as ["key"]/["value"]). This engine's data files are plain
    Spark parquet WITHOUT embedded field ids, and spec-conformant
    readers resolve columns by id — without
    ``schema.name-mapping.default`` they would fall back to
    position-assigned ids, which MISALIGN on partitioned tables
    (partition columns sit in the schema but not in the files). The
    property makes our exports exactly readable by iceberg-java /
    pyiceberg / Trino."""

    def field_entry(f: dict) -> dict:
        entry = {"field-id": f["id"], "names": [f["name"]]}
        nested = type_fields(f["type"])
        if nested:
            entry["fields"] = nested
        return entry

    def type_fields(t) -> list | None:
        if isinstance(t, dict):
            if t["type"] == "struct":
                return [field_entry(f) for f in t["fields"]]
            if t["type"] == "list":
                e = {"field-id": t["element-id"], "names": ["element"]}
                nested = type_fields(t["element"])
                if nested:
                    e["fields"] = nested
                return [e]
            if t["type"] == "map":
                k = {"field-id": t["key-id"], "names": ["key"]}
                v = {"field-id": t["value-id"], "names": ["value"]}
                nested = type_fields(t["value"])
                if nested:
                    v["fields"] = nested
                return [k, v]
        return None

    return [field_entry(f) for f in schema["fields"]]


def _partition_struct_avro(
    partition_cols: list[str],
    part_types: dict[str, str],
    field_ids: dict[str, int] | None = None,
) -> dict:
    """Avro schema of the manifest's data_file.partition struct (r102):
    one nullable field per identity partition column. ``field_ids``
    carries the spec's ACTUAL partition field ids (an evolved or
    foreign spec's ids need not be consecutive from 1000 — positional
    assignment would make id-resolving readers miss the values);
    omitted, ids assign positionally from the initial partition range
    (correct for specs this engine authors)."""
    avro_of = {"long": "long", "string": "string", "int": "int",
               "double": "double", "float": "float", "boolean": "boolean"}
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": c,
                "type": ["null", avro_of[part_types[c]]],
                "default": None,
                "field-id": (field_ids or {}).get(
                    c, _INITIAL_PARTITION_FIELD_ID + i
                ),
            }
            for i, c in enumerate(partition_cols)
        ],
    }


def _unpartitioned_spec(metadata: dict) -> tuple[int, list[dict]]:
    """Return ``(spec_id, partition-specs)`` where ``spec_id`` names an
    UNPARTITIONED spec (``{"fields": []}``), appending a fresh one when
    the table has none.

    Per the Iceberg spec (Scan Planning), a delete file applies
    globally ONLY when written under an unpartitioned spec; under a
    partitioned spec its partition tuple is a scope VALUE, so an
    all-null tuple means "the null partition" to conformant readers
    (Spark/Trino/PyIceberg) — which would silently skip the deletes
    for every real partition. Global delete manifests must therefore
    reference the spec id this returns, with an empty partition struct.
    """
    specs = [dict(s) for s in metadata.get("partition-specs", [])]
    for s in specs:
        if not s.get("fields"):
            return int(s["spec-id"]), specs
    new_id = max((int(s["spec-id"]) for s in specs), default=-1) + 1
    specs.append({"spec-id": new_id, "fields": []})
    return new_id, specs


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
                        {
                            "name": "value_counts",
                            "field-id": 109,
                            "default": None,
                            "type": ["null", _counts_map_avro("k119_v120", 119, 120)],
                        },
                        {
                            "name": "null_value_counts",
                            "field-id": 110,
                            "default": None,
                            "type": ["null", _counts_map_avro("k121_v122", 121, 122)],
                        },
                        {
                            "name": "lower_bounds",
                            "field-id": 125,
                            "default": None,
                            "type": ["null", _bounds_map_avro("k126_v127", 126, 127)],
                        },
                        {
                            "name": "upper_bounds",
                            "field-id": 128,
                            "default": None,
                            "type": ["null", _bounds_map_avro("k129_v130", 129, 130)],
                        },
                        {
                            # spec field 135 (elements 136): the schema
                            # field ids an EQUALITY delete file keys on
                            "name": "equality_ids",
                            "field-id": 135,
                            "default": None,
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "items": "int",
                                    "element-id": 136,
                                },
                            ],
                        },
                    ],
                },
            },
        ],
    }


def _bounds_map_avro(name: str, key_id: int, value_id: int) -> dict:
    """Iceberg's non-string-key map encoding in Avro manifests: an
    array of key/value records with ``logicalType: map`` (spec Appendix
    A) — Avro maps proper only allow string keys, bounds key on the
    column's FIELD ID."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "bytes", "field-id": value_id},
            ],
        },
    }


def _counts_map_avro(name: str, key_id: int, value_id: int) -> dict:
    """Field-id keyed long-valued map (value_counts/null_value_counts
    shape) in the array-of-kv-records encoding."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "long", "field-id": value_id},
            ],
        },
    }


def _encode_bound(value, iceberg_type: str) -> bytes | None:
    """Single-value binary serialization (spec Appendix D): the bytes a
    foreign engine compares row-group bounds against. None for types or
    values this exporter does not serialize — a missing bound only
    costs the reader a scan, never correctness."""
    import struct as _struct
    from datetime import date as _date
    from datetime import datetime as _datetime
    from datetime import timezone as _timezone

    try:
        if iceberg_type == "long":
            return _struct.pack("<q", int(value))
        if iceberg_type == "int":
            return _struct.pack("<i", int(value))
        if iceberg_type == "double":
            return _struct.pack("<d", float(value))
        if iceberg_type == "float":
            return _struct.pack("<f", float(value))
        if iceberg_type == "string":
            return str(value).encode("utf-8")
        if iceberg_type in ("timestamp", "timestamptz"):
            if isinstance(value, str):
                value = _datetime.fromisoformat(value.replace("T", " "))
            if isinstance(value, _datetime):
                if value.tzinfo is None:
                    value = value.replace(tzinfo=_timezone.utc)
                return _struct.pack("<q", int(value.timestamp() * 1_000_000))
            return None
        if iceberg_type == "date":
            if isinstance(value, str):
                value = _date.fromisoformat(value[:10])
            if isinstance(value, _date):
                return _struct.pack("<i", (value - _date(1970, 1, 1)).days)
            return None
        if iceberg_type == "boolean":
            return b"\x01" if value else b"\x00"
    except (ValueError, TypeError, OverflowError):
        return None
    return None


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
    return int(v) if iceberg_type in ("long", "int") else str(v)


def _decode_manifest_list(snap: dict, location: str) -> list[dict]:
    """Previous snapshot's manifest-list rows (local paths resolved)."""
    from incubator_gobblin_spark.sources.iceberg_import import (
        _decode_avro_rows,
        _local_path,
    )

    mlist = _local_path(snap["manifest-list"])
    if not os.path.isabs(mlist):
        mlist = os.path.join(location, mlist)
    return _decode_avro_rows(mlist)


def _decode_manifest(row: dict, location: str) -> list[dict]:
    from incubator_gobblin_spark.sources.iceberg_import import (
        _decode_avro_rows,
        _local_path,
    )

    mpath = _local_path(row["manifest_path"])
    if not os.path.isabs(mpath):
        mpath = os.path.join(location, mpath)
    return _decode_avro_rows(mpath)


def export_iceberg(
    sink,
    as_of_run: str | None = None,
    mode: str = "auto",
    transform_spec: list[dict] | None = None,
) -> str:
    """Append one Iceberg snapshot reflecting ``sink``'s committed
    manifest (see module docstring). Returns the ``metadata/`` dir.

    ``mode`` controls the snapshot's manifest shape:

    - ``"auto"`` (default): the first export writes a full snapshot
      (one manifest, all live files ADDED); subsequent exports are
      INCREMENTAL — previous manifests are carried by reference in the
      new manifest list, a new manifest holds only files added since
      the last export, and manifests containing removed files are
      rewritten with those entries marked DELETED (survivors EXISTING,
      original sequence numbers kept). Metadata WRITES per call are
      O(added + entries of touched manifests) — history and write
      amplification stop growing by a full re-add per export; the
      metadata READ (diffing the lake manifest against the previous
      snapshot's decoded manifests) stays O(live entries), the same
      floor the lake-side entry materialization already sets.
    - ``"full"``: force a self-contained snapshot (all live files
      re-added in one fresh manifest) — metadata compaction: the next
      incremental chain restarts from it. Also the automatic fallback
      when the current partition-type inference disagrees with the
      previous export's schema (mixed partition types across carried
      manifests would make typed restore ambiguous).

    ``transform_spec`` declares HIDDEN partitioning (spec §Partition
    Transforms): entries ``{"name", "transform", "source"}`` where
    ``name`` is one of ``sink.partition_by``'s physical directory keys
    — the caller derives that column with
    ``functions.iceberg_transforms.transform_expr`` before
    ``write_staging`` (Spark's ``partitionBy`` then drops the derived
    column from the data files while keeping the SOURCE column, which
    is exactly the spec's hidden-partition file layout) — ``transform``
    is ``bucket[N]``/``truncate[W]``/``year``/``month``/``day``/
    ``hour``, and ``source`` is the schema column it derives from. The
    export writes the spec field under the transform with the
    transform's result type, keeps the source column in the table
    schema, and leaves the derived name OUT of it (it is metadata, not
    data). ``partition_by`` entries not named in ``transform_spec``
    stay identity-partitioned as before. Foreign scoped deletes and
    this engine's own transform pruning (``prune_files``) then work
    against the authored spec.
    """
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
    transforms_by_name: dict[str, dict] = {}
    for t in transform_spec or []:
        if t["name"] not in part_cols:
            raise ValueError(
                f"export_iceberg: transform_spec names {t['name']!r} "
                "which is not a physical partition key of this sink — "
                "derive the column with iceberg_transforms."
                "transform_expr and include it in partition_by"
            )
        if t["transform"] == "identity":
            raise ValueError(
                "export_iceberg: identity entries are implicit — list "
                "only transform-derived partition fields"
            )
        transforms_by_name[t["name"]] = t
    identity_cols = [c for c in part_cols if c not in transforms_by_name]

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
                "stats": e.get("stats") or {},
                "nulls": e.get("nulls") or {},
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
            files[0]["path"], identity_cols, [f["partition"] for f in files]
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
                for i, c in enumerate(identity_cols)
            ],
        }
        last_column_id = len(identity_cols)
        part_types = {c: "string" for c in identity_cols}
    field_id = {f["name"]: f["id"] for f in schema["fields"]}
    field_type = {f["name"]: f["type"] for f in schema["fields"]}
    # transform-derived partition fields: source column stays in the
    # schema, the spec field carries the transform + its result type
    for name, t in transforms_by_name.items():
        src = t["source"]
        if src not in field_id:
            raise ValueError(
                f"export_iceberg: transform_spec source {src!r} for "
                f"partition field {name!r} is not a column of the "
                "committed data files"
            )
        src_t = field_type[src]
        if not isinstance(src_t, str):
            raise ValueError(
                f"export_iceberg: transform source {src!r} is a "
                "nested column — unsupported"
            )
        part_types[name] = _transform_result_type(t["transform"], src_t)
    spec = {
        "spec-id": 0,
        "fields": [
            {
                "name": c,
                "transform": transforms_by_name.get(c, {}).get(
                    "transform", "identity"
                ),
                "source-id": field_id[
                    transforms_by_name.get(c, {}).get("source", c)
                ],
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
            # snapshot unchanged: no empty commit — but an explicit
            # mode="full" is a compaction request, honored unless the
            # chain is already one self-contained manifest
            if mode != "full" or (
                len(_decode_manifest_list(snapshots[-1], location)) == 1
                and snapshots[-1]["summary"].get("operation") == "overwrite"
            ):
                return meta_dir

        version = (versions[-1] if versions else 0) + 1
        # deterministic, monotonic snapshot id — monotonic against BOTH
        # the live snapshot ids and the last sequence number, so ids
        # and sequence numbers never regress after expire_iceberg_
        # snapshots prunes the history (len(snapshots)+1 would)
        sid = (
            max(
                max((s["snapshot-id"] for s in snapshots), default=0),
                int(prev.get("last-sequence-number", 0)) if prev else 0,
            )
            + 1
        )
        seq = sid
        ts = int(time.time() * 1000)
        commit_uuid = str(
            uuid.uuid5(uuid.NAMESPACE_URL, f"{location}#{sid}#{fingerprint}")
        )

        # --- manifests (full: one manifest, all live files ADDED;
        # incremental: carry prev manifests, add/rewrite the diff) ---
        part_struct = _partition_struct_avro(part_cols, part_types)
        entry_schema = _manifest_entry_avro(part_struct)
        manifest_meta = {
            "schema": json.dumps(schema).encode(),
            "partition-spec": json.dumps(spec["fields"]).encode(),
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        }
        incremental = mode != "full" and prev is not None and bool(snapshots)
        if incremental:
            # partition-type gate: inference drift (long <-> string)
            # across carried manifests would make typed restore
            # ambiguous — fall back to a full self-contained snapshot
            prev_schema = next(
                (
                    s
                    for s in prev.get("schemas", [])
                    if s["schema-id"] == prev.get("current-schema-id", 0)
                ),
                None,
            )
            prev_types = {
                f["name"]: f["type"]
                for f in (prev_schema or {}).get("fields", [])
            }
            if any(
                prev_types.get(c) != part_types[c] for c in identity_cols
            ):
                incremental = False
            # transform fields are not schema columns; their result
            # types are deterministic from the spec — a spec change
            # (fields/transforms/sources) forces a full snapshot
            prev_spec = next(
                (
                    sp
                    for sp in prev.get("partition-specs", [])
                    if sp["spec-id"] == prev.get("default-spec-id", 0)
                ),
                None,
            )
            if (prev_spec or {}).get("fields") != spec["fields"]:
                incremental = False
            # data-schema gate: if the committed files' column set /
            # order / types changed since the previous export,
            # _iceberg_schema reassigns field ids while CARRIED
            # manifests keep value_counts/null_counts/bounds keyed by
            # the old ids — foreign readers would file-skip
            # non-conservatively. Any drift in (id, name, type)
            # forces a full self-contained snapshot, like the
            # partition-type gate above.
            if (
                prev_schema is None
                or prev_schema.get("fields", []) != schema["fields"]
            ):
                incremental = False

        # A full (non-incremental) export rebuilds the manifest list
        # from engine state alone; only the incremental branch carries
        # foreign delete manifests (content!=0) by reference. If the
        # previous snapshot carries any — e.g. a foreign engine's
        # position/equality deletes — a full rebuild would silently
        # DROP them and resurrect the deleted rows for foreign readers
        # of the new snapshot. Loud-fail instead, matching the
        # equality-delete refusal discipline elsewhere.
        if not incremental and prev is not None and snapshots:
            n_foreign = sum(
                1
                for row in _decode_manifest_list(snapshots[-1], location)
                if row.get("content", 0) != 0
            )
            if n_foreign:
                raise ValueError(
                    "export_iceberg: a full re-export would drop "
                    f"{n_foreign} foreign delete manifest(s) carried by "
                    "the previous snapshot, resurrecting their deleted "
                    "rows for foreign readers — refusing. Export "
                    "incrementally, or rewrite/compact the foreign "
                    "deletes in the foreign engine first."
                )

        m_idx = 0
        written_files: list[str] = []  # this attempt's Avro publishes

        def _write_manifest(rows: list[dict]) -> tuple[str, int]:
            nonlocal m_idx
            path = os.path.join(meta_dir, f"{commit_uuid}-m{m_idx}.avro")
            m_idx += 1
            data = encode_ocf(
                entry_schema, rows, codec="null", extra_meta=manifest_meta
            )
            tmpp = f"{path}.tmp-{os.getpid()}-{attempt}"
            with open(tmpp, "wb") as fh:
                fh.write(data)
            os.replace(tmpp, path)
            written_files.append(path)
            return path, len(data)

        col_info = {f["name"]: (f["id"], f["type"]) for f in schema["fields"]}

        def _bounds(f: dict) -> tuple[list | None, list | None]:
            """lower/upper bounds as field-id keyed k/v lists from the
            manifest's per-file column stats — the metadata a foreign
            Iceberg reader file-skips on. Best-effort per column."""
            lo_out, hi_out = [], []
            for c, pair in sorted((f.get("stats") or {}).items()):
                info = col_info.get(c)
                if info is None or not isinstance(info[1], str):
                    continue  # nested/unknown column: skip
                fid, typ = info
                lo = _encode_bound(pair[0], typ)
                hi = _encode_bound(pair[1], typ)
                if lo is None or hi is None:
                    continue
                lo_out.append({"key": fid, "value": lo})
                hi_out.append({"key": fid, "value": hi})
            return (lo_out or None, hi_out or None)

        def _value_counts(f: dict) -> list | None:
            # top-level scalar fields carry exactly one value (possibly
            # null) per row, so value_counts = record_count for each —
            # with null_value_counts this lets readers prove all-null
            out = [
                {"key": fid, "value": int(f["rows"])}
                for name, (fid, typ) in sorted(col_info.items())
                if isinstance(typ, str)
            ]
            return out or None

        def _null_counts(f: dict) -> list | None:
            out = [
                {"key": col_info[c][0], "value": int(n)}
                for c, n in sorted((f.get("nulls") or {}).items())
                if c in col_info
            ]
            return out or None

        def _data_file(f: dict) -> dict:
            lo, hi = _bounds(f)
            return {
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
                "value_counts": _value_counts(f),
                "null_value_counts": _null_counts(f),
                "lower_bounds": lo,
                "upper_bounds": hi,
            }

        list_rows: list[dict] = []
        removed_count = 0
        added = files
        if incremental:
            from incubator_gobblin_spark.sources.iceberg_import import (
                _local_path,
            )

            cur_by_path = {f["path"]: f for f in files}

            def _unchanged(p: str, e: dict) -> bool:
                # same path AND same size: a path rewritten in place
                # (not a lake operation, but cheap to defend) must not
                # carry stale record counts — treat as remove + add
                f = cur_by_path.get(p)
                return (
                    f is not None
                    and f["size"] == e["data_file"]["file_size_in_bytes"]
                )

            seen_prev: set[str] = set()
            for row in _decode_manifest_list(snapshots[-1], location):
                if row.get("content", 0) != 0:
                    # delete manifest (content=1, e.g. a foreign
                    # engine's position deletes appended to this
                    # table): carry by reference — dropping it would
                    # silently resurrect the deleted rows for foreign
                    # readers; tombstones for files this commit
                    # removes become no-ops
                    list_rows.append(dict(row))
                    continue
                live = [
                    e
                    for e in _decode_manifest(row, location)
                    if e["status"] != 2
                ]
                if not live:
                    continue  # fully-deleted manifest: drop from the chain
                by_path = [
                    (_local_path(e["data_file"]["file_path"]), e)
                    for e in live
                ]
                seen_prev.update(p for p, e in by_path if _unchanged(p, e))
                gone = [e for p, e in by_path if not _unchanged(p, e)]
                if not gone:
                    list_rows.append(dict(row))  # carry by reference
                    continue
                # rewrite: survivors EXISTING (original lineage kept),
                # removed DELETED by THIS snapshot
                removed_count += len(gone)
                survivors = [e for p, e in by_path if _unchanged(p, e)]
                rewritten = [
                    {
                        "status": 0,  # EXISTING
                        "snapshot_id": e.get("snapshot_id"),
                        "sequence_number": e.get("sequence_number"),
                        "file_sequence_number": e.get("file_sequence_number"),
                        "data_file": e["data_file"],
                    }
                    for e in survivors
                ] + [
                    {
                        "status": 2,  # DELETED
                        "snapshot_id": sid,
                        "sequence_number": e.get("sequence_number"),
                        "file_sequence_number": e.get("file_sequence_number"),
                        "data_file": e["data_file"],
                    }
                    for e in gone
                ]
                mp, mlen = _write_manifest(rewritten)
                list_rows.append(
                    {
                        "manifest_path": "file://" + mp,
                        "manifest_length": mlen,
                        "partition_spec_id": 0,
                        "content": 0,
                        "sequence_number": seq,
                        "min_sequence_number": row.get(
                            "min_sequence_number", 0
                        ),
                        "added_snapshot_id": sid,
                        "added_files_count": 0,
                        "existing_files_count": len(survivors),
                        "deleted_files_count": len(gone),
                        "added_rows_count": 0,
                        "existing_rows_count": sum(
                            e["data_file"]["record_count"] for e in survivors
                        ),
                        "deleted_rows_count": sum(
                            e["data_file"]["record_count"] for e in gone
                        ),
                    }
                )
            added = [f for f in files if f["path"] not in seen_prev]

        if added or not list_rows:
            mp, mlen = _write_manifest(
                [
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": sid,
                        "sequence_number": seq,
                        "file_sequence_number": seq,
                        "data_file": _data_file(f),
                    }
                    for f in added
                ]
            )
            list_rows.append(
                {
                    "manifest_path": "file://" + mp,
                    "manifest_length": mlen,
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": sid,
                    "added_files_count": len(added),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(f["rows"] for f in added),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            )

        # --- manifest list ---
        snap_name = f"snap-{sid}-1-{commit_uuid}.avro"
        snap_path = os.path.join(meta_dir, snap_name)
        list_bytes = encode_ocf(
            _MANIFEST_LIST_AVRO,
            list_rows,
            codec="null",
            extra_meta={"format-version": b"2"},
        )
        tmp = f"{snap_path}.tmp-{os.getpid()}-{attempt}"
        with open(tmp, "wb") as fh:
            fh.write(list_bytes)
        os.replace(tmp, snap_path)
        written_files.append(snap_path)

        # --- table metadata ---
        if not incremental:
            op = "overwrite"  # self-contained re-add of the world
        elif removed_count == 0:
            op = "append"
        elif not added:
            op = "delete"
        else:
            op = "overwrite"
        snapshot = {
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": ts,
            "summary": {
                "operation": op,
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
            "properties": {
                "write.format.default": "parquet",
                # our data files carry no embedded field ids; this is
                # the spec's mechanism for id resolution by name (see
                # _name_mapping — without it foreign readers position-
                # assign ids and misalign on partitioned tables)
                "schema.name-mapping.default": json.dumps(
                    _name_mapping(schema)
                ),
            },
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
                for orphan in written_files:
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


def append_position_deletes(
    table_path: str, deletes: list[tuple[str, int]]
) -> str:
    """Append a v2 POSITION-delete snapshot to an exported Iceberg
    table, exactly the way a foreign engine (Spark+Iceberg, Flink CDC,
    Trino) row-level-deletes from it: one position-delete parquet of
    (``file_path``, ``pos``) per the spec's §Position Delete Files, a
    ``content=1`` delete manifest, and a new metadata version whose
    snapshot carries the previous manifests by reference plus the
    delete manifest.

    This engine's OWN lake deletes stay copy-on-write (publish /
    merge_into) — this writer exists so ``read_iceberg``'s delete
    application and the interop tests can prove conformance against a
    hand-authored spec-example table (reference analogue:
    gobblin-iceberg's IcebergMetadataWriterTest building tables by
    hand). ``deletes`` holds (data-file path, 0-based row position);
    plain local paths are normalized to the manifest's file:// form.
    Returns the metadata dir."""
    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf

    location = os.path.abspath(table_path)
    meta_dir = os.path.join(location, "metadata")
    versions = _metadata_versions(meta_dir)
    if not versions:
        raise FileNotFoundError(f"no Iceberg metadata under {meta_dir}")
    with open(
        os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")
    ) as fh:
        prev = json.load(fh)
    snapshots = list(prev["snapshots"])
    cur = next(
        s
        for s in snapshots
        if s["snapshot-id"] == prev["current-snapshot-id"]
    )
    schema = next(
        s
        for s in prev["schemas"]
        if s["schema-id"] == prev["current-schema-id"]
    )
    spec = next(
        s
        for s in prev["partition-specs"]
        if s["spec-id"] == prev["default-spec-id"]
    )
    # position deletes here are GLOBAL (no partition scope parameter):
    # per the spec they must ride an UNPARTITIONED spec — under the
    # table's partitioned spec an all-null tuple means "the null
    # partition" to conformant readers (Spark/Trino/PyIceberg), which
    # would skip the deletes for every real partition. This also
    # sidesteps transform-partitioned struct derivation entirely.
    unpart_id, all_specs = _unpartitioned_spec(prev)
    sid = (
        max(
            max((s["snapshot-id"] for s in snapshots), default=0),
            int(prev.get("last-sequence-number", 0)),
        )
        + 1
    )
    seq = sid
    ts = int(time.time() * 1000)

    # --- the delete file itself (parquet of file_path, pos) ---
    import pyarrow as pa
    import pyarrow.parquet as pq

    del_dir = os.path.join(location, "_deletes")
    os.makedirs(del_dir, exist_ok=True)
    dpath = os.path.join(del_dir, f"pos-delete-{sid}.parquet")
    def _to_file_uri(p) -> str:
        # accept plain paths, file:/x, file://x, file:///x (Spark's
        # _metadata.file_path uses the single-slash form) — emit the
        # manifest's canonical file://<abs> form. Spark URIs are
        # percent-encoded while manifest data-file paths are raw;
        # decode, or a path with a space/'%' would never string-match
        # the data entry for a foreign reader (unquote leaves '+'
        # alone — a '+' in a URI path segment is a literal plus)
        s = str(p)
        if s.startswith("file:"):
            from urllib.parse import unquote

            s = unquote("/" + s.split(":", 1)[1].lstrip("/"))
        return "file://" + os.path.abspath(s)

    rows = sorted((_to_file_uri(p), int(pos)) for p, pos in deletes)
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([r[0] for r in rows], pa.string()),
                "pos": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        dpath,
    )

    # --- content=1 delete manifest under the UNPARTITIONED spec ---
    part_struct = _partition_struct_avro([], {})
    entry_schema = _manifest_entry_avro(part_struct)
    manifest_meta = {
        "schema": json.dumps(schema).encode(),
        "partition-spec": json.dumps([]).encode(),
        "partition-spec-id": str(unpart_id).encode(),
        "format-version": b"2",
        "content": b"deletes",
    }
    entry = {
        "status": 1,  # ADDED
        "snapshot_id": sid,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 1,  # POSITION_DELETES
            "file_path": "file://" + dpath,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(dpath),
            "value_counts": None,
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
        },
    }
    mdata = encode_ocf(
        entry_schema, [entry], codec="null", extra_meta=manifest_meta
    )
    mpath = os.path.join(meta_dir, f"del-{sid}-m0.avro")
    with open(mpath, "wb") as fh:
        fh.write(mdata)

    # --- manifest list: previous manifests by reference + the delete ---
    list_rows = [dict(r) for r in _decode_manifest_list(cur, location)] + [
        {
            "manifest_path": "file://" + mpath,
            "manifest_length": len(mdata),
            "partition_spec_id": unpart_id,
            "content": 1,  # DELETES
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": sid,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(rows),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    snap_path = os.path.join(
        meta_dir, f"snap-{sid}-1-{uuid.uuid5(uuid.NAMESPACE_URL, dpath)}.avro"
    )
    with open(snap_path, "wb") as fh:
        fh.write(
            encode_ocf(
                _MANIFEST_LIST_AVRO,
                list_rows,
                codec="null",
                extra_meta={"format-version": b"2"},
            )
        )

    # --- new metadata version (operation=delete; the data-file state
    # fingerprint is UNCHANGED, so a later export_iceberg no-ops
    # instead of wiping the tombstones) ---
    snapshot = {
        "snapshot-id": sid,
        "sequence-number": seq,
        "timestamp-ms": ts,
        "summary": {
            "operation": "delete",
            "engine.state-fingerprint": cur["summary"].get(
                "engine.state-fingerprint", ""
            ),
        },
        "manifest-list": "file://" + snap_path,
        "schema-id": schema.get("schema-id", 0),
        "parent-snapshot-id": cur["snapshot-id"],
    }
    metadata = dict(prev)
    metadata["partition-specs"] = all_specs  # incl. the unpartitioned
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = ts
    metadata["current-snapshot-id"] = sid
    metadata["snapshots"] = snapshots + [snapshot]
    metadata["snapshot-log"] = list(prev.get("snapshot-log", [])) + [
        {"timestamp-ms": ts, "snapshot-id": sid}
    ]
    version = versions[-1] + 1
    meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1)
    os.link(tmp, meta_path)  # put-if-absent publish
    os.remove(tmp)
    hint_tmp = os.path.join(meta_dir, f".hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return meta_dir


def _transform_result_type(transform: str, source_type: str | None) -> str:
    """The Iceberg type a partition transform produces (spec
    §Partition Transforms): bucket and the time transforms yield int,
    identity/truncate keep the source type."""
    if transform.startswith("bucket[") or transform in (
        "year", "years", "month", "months", "day", "days", "hour", "hours"
    ):
        return "int"
    return source_type or "string"


def append_equality_deletes(
    table_path: str,
    rows: list[dict],
    equality_cols: list[str],
    partition_scope: dict | None = None,
) -> str:
    """Append a v2 EQUALITY-delete snapshot the way a foreign CDC
    writer (Flink upsert sink, Trino MERGE) would: a parquet file of
    the ``equality_cols`` values, a content=2 delete manifest whose
    entry carries the columns' schema field ids as ``equality_ids``
    (spec §Equality Delete Files, field 135), and a new metadata
    version. Every ``rows`` dict maps equality column -> value; a
    row deletes ALL data rows equal on those columns whose data
    sequence number is strictly less than this snapshot's. See
    :func:`append_position_deletes` for the position variant and the
    why-this-exists note. ``partition_scope`` (partition FIELD name ->
    value; for non-identity fields the TRANSFORMED value, e.g. the
    bucket number) writes the delete file's manifest partition struct,
    scoping it to ONE partition the way a partitioned-spec foreign
    writer would — rows in other partitions must survive."""
    location = os.path.abspath(table_path)
    meta_dir = os.path.join(location, "metadata")
    versions = _metadata_versions(meta_dir)
    if not versions:
        raise FileNotFoundError(f"no Iceberg metadata under {meta_dir}")
    with open(
        os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")
    ) as fh:
        prev = json.load(fh)
    snapshots = list(prev["snapshots"])
    cur = next(
        s
        for s in snapshots
        if s["snapshot-id"] == prev["current-snapshot-id"]
    )
    schema = next(
        s
        for s in prev["schemas"]
        if s["schema-id"] == prev["current-schema-id"]
    )
    spec = next(
        s
        for s in prev["partition-specs"]
        if s["spec-id"] == prev["default-spec-id"]
    )
    by_name = {f["name"]: f for f in schema["fields"]}
    missing = [c for c in equality_cols if c not in by_name]
    if missing:
        raise ValueError(f"equality columns not in schema: {missing}")
    equality_ids = [by_name[c]["id"] for c in equality_cols]
    fname = {f["id"]: f["name"] for f in schema["fields"]}
    ftype = {f["name"]: f["type"] for f in schema["fields"]}
    # SCOPED deletes ride the table's partitioned spec: the manifest's
    # partition struct is keyed by partition FIELD name (== source
    # name for identity transforms), typed by the TRANSFORM's result
    # (spec §Partition Transforms), and carries the spec's ACTUAL
    # field ids (an evolved spec's ids need not start at 1000 — an
    # id-resolving reader would otherwise miss the scope values). A
    # GLOBAL delete (partition_scope=None) must instead ride an
    # UNPARTITIONED spec: an all-null tuple under the partitioned spec
    # means "the null partition" to conformant readers, which would
    # skip the delete for every real partition.
    if partition_scope is None:
        manifest_spec_id, all_specs = _unpartitioned_spec(prev)
        manifest_spec_fields: list = []
        part_cols = []
        part_types = {}
        part_fids: dict = {}
    else:
        manifest_spec_id = spec["spec-id"]
        manifest_spec_fields = spec["fields"]
        all_specs = prev.get("partition-specs", [])
        part_cols = [
            f.get("name") or fname[f["source-id"]] for f in spec["fields"]
        ]
        part_types = {
            (f.get("name") or fname[f["source-id"]]): (
                _transform_result_type(
                    f["transform"], ftype.get(fname.get(f["source-id"]))
                )
            )
            for f in spec["fields"]
        }
        part_fids = {
            (f.get("name") or fname[f["source-id"]]): f["field-id"]
            for f in spec["fields"]
            if f.get("field-id") is not None
        }
    sid = (
        max(
            max((s["snapshot-id"] for s in snapshots), default=0),
            int(prev.get("last-sequence-number", 0)),
        )
        + 1
    )
    seq = sid
    ts = int(time.time() * 1000)

    import pyarrow as pa
    import pyarrow.parquet as pq

    del_dir = os.path.join(location, "_deletes")
    os.makedirs(del_dir, exist_ok=True)
    dpath = os.path.join(del_dir, f"eq-delete-{sid}.parquet")
    _PA_OF = {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
    }
    arrays = {}
    for c in equality_cols:
        t = by_name[c]["type"]
        pat = _PA_OF.get(t) if isinstance(t, str) else None
        vals = [r.get(c) for r in rows]
        arrays[c] = pa.array(vals, pat) if pat else pa.array(vals)
    pq.write_table(pa.table(arrays), dpath)

    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf

    part_struct = _partition_struct_avro(part_cols, part_types, part_fids)
    entry_schema = _manifest_entry_avro(part_struct)
    entry = {
        "status": 1,
        "snapshot_id": sid,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 2,  # EQUALITY_DELETES
            "file_path": "file://" + dpath,
            "file_format": "PARQUET",
            "partition": {
                c: (partition_scope or {}).get(c) for c in part_cols
            },
            "record_count": len(rows),
            "file_size_in_bytes": os.path.getsize(dpath),
            "value_counts": None,
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": equality_ids,
        },
    }
    mdata = encode_ocf(
        entry_schema,
        [entry],
        codec="null",
        extra_meta={
            "schema": json.dumps(schema).encode(),
            "partition-spec": json.dumps(manifest_spec_fields).encode(),
            "partition-spec-id": str(manifest_spec_id).encode(),
            "format-version": b"2",
            "content": b"deletes",
        },
    )
    mpath = os.path.join(meta_dir, f"del-{sid}-m0.avro")
    with open(mpath, "wb") as fh:
        fh.write(mdata)
    list_rows = [dict(r) for r in _decode_manifest_list(cur, location)] + [
        {
            "manifest_path": "file://" + mpath,
            "manifest_length": len(mdata),
            "partition_spec_id": manifest_spec_id,
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": sid,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(rows),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    snap_path = os.path.join(
        meta_dir, f"snap-{sid}-1-{uuid.uuid5(uuid.NAMESPACE_URL, dpath)}.avro"
    )
    with open(snap_path, "wb") as fh:
        fh.write(
            encode_ocf(
                _MANIFEST_LIST_AVRO,
                list_rows,
                codec="null",
                extra_meta={"format-version": b"2"},
            )
        )
    snapshot = {
        "snapshot-id": sid,
        "sequence-number": seq,
        "timestamp-ms": ts,
        "summary": {
            "operation": "delete",
            "engine.state-fingerprint": cur["summary"].get(
                "engine.state-fingerprint", ""
            ),
        },
        "manifest-list": "file://" + snap_path,
        "schema-id": schema.get("schema-id", 0),
        "parent-snapshot-id": cur["snapshot-id"],
    }
    metadata = dict(prev)
    metadata["partition-specs"] = all_specs  # incl. unpartitioned when global
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = ts
    metadata["current-snapshot-id"] = sid
    metadata["snapshots"] = snapshots + [snapshot]
    metadata["snapshot-log"] = list(prev.get("snapshot-log", [])) + [
        {"timestamp-ms": ts, "snapshot-id": sid}
    ]
    version = versions[-1] + 1
    meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    tmp = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1)
    os.link(tmp, meta_path)
    os.remove(tmp)
    hint_tmp = os.path.join(meta_dir, f".hint.tmp-{os.getpid()}")
    with open(hint_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return meta_dir


def append_equality_deletes_stub(table_path: str) -> str:
    """Author a MALFORMED equality-delete manifest: content=2 with NO
    equality_ids — used only to prove read_iceberg fails loudly on a
    delete it cannot apply rather than resurrecting rows. The real
    writer is :func:`append_equality_deletes`."""
    meta_dir = append_position_deletes(table_path, [])
    # rewrite the just-written manifest's entry to content=2
    versions = _metadata_versions(meta_dir)
    with open(
        os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")
    ) as fh:
        meta = json.load(fh)
    location = os.path.dirname(meta_dir)
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    rows = _decode_manifest_list(cur, location)
    target = next(r for r in rows if r.get("content", 0) == 1)
    entries = _decode_manifest(target, location)
    from incubator_gobblin_spark.formats.avro_ocf import encode_ocf

    mlocal = target["manifest_path"]
    if mlocal.startswith("file://"):
        from incubator_gobblin_spark.sources.iceberg_import import _local_path

        mlocal = _local_path(mlocal)
    for e in entries:
        e["data_file"]["content"] = 2  # EQUALITY_DELETES
    schema = next(
        s
        for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    spec = next(
        s
        for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    fname = {f["id"]: f["name"] for f in schema["fields"]}
    ftype = {f["name"]: f["type"] for f in schema["fields"]}
    part_cols = [fname[f["source-id"]] for f in spec["fields"]]
    part_types = {c: ftype[c] for c in part_cols}
    entry_schema = _manifest_entry_avro(
        _partition_struct_avro(part_cols, part_types)
    )
    with open(mlocal, "wb") as fh:
        fh.write(
            encode_ocf(
                entry_schema,
                entries,
                codec="null",
                extra_meta={
                    "schema": json.dumps(schema).encode(),
                    "partition-spec": json.dumps(spec["fields"]).encode(),
                    "partition-spec-id": b"0",
                    "format-version": b"2",
                    "content": b"deletes",
                },
            )
        )
    return meta_dir


def expire_iceberg_snapshots(
    sink_or_path, keep_last: int = 1
) -> str:
    """Prune Iceberg snapshot history — the ExpireSnapshots maintenance
    op (iceberg-core ``RemoveSnapshots``): keep the newest ``keep_last``
    snapshots, publish a metadata version without the expired ones, and
    unlink manifest-list/manifest Avro files referenced ONLY by expired
    snapshots. Without this, the incremental exporter's history grows
    one snapshot + one manifest per export forever.

    Scope boundary, stated plainly: DATA files are never touched — the
    manifest lake's own ``vacuum`` owns data-file lifetime (an expired
    Iceberg snapshot's files may still be live lake state or covered by
    lake time travel). This prunes the METADATA chain only.

    Published with the exporter's put-if-absent discipline (os.link on
    vN+1); a lost race re-reads and retries, so expiration composes
    with concurrent exports."""
    path = sink_or_path if isinstance(sink_or_path, str) else sink_or_path.path
    location = os.path.abspath(path)
    meta_dir = os.path.join(location, "metadata")
    if keep_last < 1:
        raise ValueError("expire_iceberg_snapshots: keep_last must be >= 1")

    from incubator_gobblin_spark.sources.iceberg_import import _local_path

    def _referenced(snaps: list[dict]) -> set[str]:
        out: set[str] = set()
        for s in snaps:
            ml = _local_path(s["manifest-list"])
            if not os.path.isabs(ml):
                ml = os.path.join(location, ml)
            out.add(ml)
            if os.path.exists(ml):
                for row in _decode_manifest_list(s, location):
                    mp = _local_path(row["manifest_path"])
                    if not os.path.isabs(mp):
                        mp = os.path.join(location, mp)
                    out.add(mp)
        return out

    for attempt in range(64):
        versions = _metadata_versions(meta_dir)
        if not versions:
            raise FileNotFoundError(f"no Iceberg metadata under {meta_dir}")
        with open(
            os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")
        ) as fh:
            prev = json.load(fh)
        snapshots = list(prev.get("snapshots", []))
        if len(snapshots) <= keep_last:
            return meta_dir  # nothing to expire
        # refs are retention ROOTS (iceberg-core RemoveSnapshots):
        # a snapshot a branch/tag points at survives expiry no matter
        # how old — expiring it would break the ref for every reader
        ref_ids = {
            int(r["snapshot-id"])
            for r in (prev.get("refs") or {}).values()
            if r.get("snapshot-id") is not None
        }
        tail_ids = {s["snapshot-id"] for s in snapshots[-keep_last:]}
        kept = [
            s
            for s in snapshots
            if s["snapshot-id"] in tail_ids or s["snapshot-id"] in ref_ids
        ]
        kept_ids = {s["snapshot-id"] for s in kept}
        expired = [s for s in snapshots if s["snapshot-id"] not in kept_ids]
        if not expired:
            return meta_dir  # every old snapshot is ref-pinned
        # this exporter always points current at the newest snapshot,
        # but a foreign or rolled-back table may not — REFUSE rather
        # than expire the snapshot readers are on (iceberg-core
        # RemoveSnapshots never removes the current snapshot)
        if prev.get("current-snapshot-id") not in kept_ids:
            raise ValueError(
                "expire_iceberg_snapshots: keep_last="
                f"{keep_last} would expire the CURRENT snapshot "
                f"{prev.get('current-snapshot-id')} (a rollback points "
                "current at an older snapshot); raise keep_last"
            )

        metadata = dict(prev)
        # any kept snapshot whose parent expired loses the pointer
        # (ref-pinned islands included, not just the oldest)
        metadata["snapshots"] = [
            (
                {k: v for k, v in s.items() if k != "parent-snapshot-id"}
                if s.get("parent-snapshot-id") not in kept_ids
                else s
            )
            for s in kept
        ]
        metadata["snapshot-log"] = [
            e
            for e in prev.get("snapshot-log", [])
            if e.get("snapshot-id") in kept_ids
        ]
        metadata["last-updated-ms"] = int(time.time() * 1000)

        version = versions[-1] + 1
        meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
        tmp = f"{meta_path}.tmp-{os.getpid()}-{attempt}"
        with open(tmp, "w") as fh:
            json.dump(metadata, fh, indent=1)
        try:
            os.link(tmp, meta_path)
        except FileExistsError:
            os.remove(tmp)
            continue  # lost to a concurrent export: re-read, retry
        os.remove(tmp)

        hint_tmp = os.path.join(meta_dir, f".hint.tmp-{os.getpid()}")
        with open(hint_tmp, "w") as fh:
            fh.write(str(version))
        os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))

        # physical cleanup AFTER the publish: files referenced only by
        # expired snapshots (set difference, so a manifest carried into
        # a kept snapshot's list survives)
        drop = _referenced(expired) - _referenced(kept)
        for p in drop:
            try:
                os.remove(p)
            except OSError:
                pass
        # old metadata versions still reference dropped files; Iceberg
        # keeps them (metadata-log) — readers use the newest version
        return meta_dir
    raise RuntimeError(
        f"expire_iceberg_snapshots: lost the metadata-version race 64 "
        f"times under {meta_dir}"
    )
