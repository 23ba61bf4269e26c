"""Schema lattice: the reference's JSON-intermediate schema <-> StructType.

Reference: Gobblin's canonical "JSON intermediate" schema is a JsonArray
of ``{columnName, dataType: {type, ...}}`` entries
(gobblin-core .../converter/json/JsonStringToJsonIntermediateConverter.java:48),
with the scalar+complex type enum and dispatch in
JsonElementConversionFactory (gobblin-core
.../converter/avro/JsonElementConversionFactory.java:66-84, :108-160):
STRING INT LONG FLOAT DOUBLE BOOLEAN BYTES FIXED DATE TIME TIMESTAMP
ENUM ARRAY MAP RECORD NULL UNION.

Mapping rules (SURVEY.md §1.3, decisions from §7 "hard parts"):
- DATE/TIME/TIMESTAMP carry a string pattern and are parsed at ingest
  (:419-458) -> DateType/TimestampType + a parse expression.
- ENUM -> StringType (+ optional membership row policy).
- UNION [T, null] (any order) -> nullable T.
- General UNION -> StructType of ``member_0..member_n`` fields, one
  non-null per record (documented + tested; Spark has no sum types).
- MAP -> MapType(string, V) (string keys, :556-577).
- NULL -> NullType field, nullable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALARS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "fixed": T.BinaryType(),
    "enum": T.StringType(),
    "null": T.NullType(),
    "date": T.DateType(),
    "time": T.TimestampType(),  # Spark has no TimeType; time-of-day rides a ts
    "timestamp": T.TimestampType(),
}


def _convert_type(dt: Any) -> tuple[T.DataType, bool]:
    """dataType spec -> (Spark type, nullable). Spec forms: "string",
    {"type": "array", "items": ...}, {"type": ["string","null"]}, ..."""
    if isinstance(dt, str):
        if dt in _SCALARS:
            return _SCALARS[dt], dt == "null"
        raise ValueError(f"unknown type: {dt}")
    if isinstance(dt, list):  # UNION
        non_null = [m for m in dt if m != "null"]
        nullable = len(non_null) != len(dt)
        if len(non_null) == 1:
            inner, _ = _convert_type(non_null[0])
            return inner, nullable or True
        # general union -> struct of members (one non-null per record)
        fields = []
        for i, m in enumerate(non_null):
            mtype, _ = _convert_type(m)
            fields.append(T.StructField(f"member_{i}", mtype, True))
        return T.StructType(fields), True
    if isinstance(dt, dict):
        kind = dt["type"]
        if isinstance(kind, list):
            return _convert_type(kind)
        if kind == "array":
            item_type, item_nullable = _convert_type(dt["items"])
            return T.ArrayType(item_type, item_nullable), True
        if kind == "map":
            val_type, val_nullable = _convert_type(dt["values"])
            return T.MapType(T.StringType(), val_type, val_nullable), True
        if kind in ("record", "struct"):
            return (
                T.StructType(
                    [_convert_field(f) for f in dt.get("fields", dt.get("values", []))]
                ),
                True,
            )
        if kind in ("enum",):
            return T.StringType(), True
        return _convert_type(kind)
    raise ValueError(f"unparseable dataType: {dt!r}")


def _convert_field(entry: dict) -> T.StructField:
    name = entry.get("columnName", entry.get("name"))
    dt = entry.get("dataType", entry.get("type"))
    spark_type, nullable = _convert_type(dt)
    if "isNullable" in entry:
        nullable = bool(entry["isNullable"])
    meta = {}
    for k in ("timeFormat", "comment", "symbols"):
        if isinstance(dt, dict) and k in dt:
            meta[k] = dt[k]
    return T.StructField(name, spark_type, nullable, metadata=meta or None)


class SchemaRecursionError(ValueError):
    """A schema references one of its ancestor records (Avro allows
    this; Spark StructTypes cannot be recursive). Carries the paths of
    the offending fields."""

    def __init__(self, paths: list[str]):
        self.paths = paths
        super().__init__(
            "recursive schema: field(s) "
            + ", ".join(paths)
            + " reference an ancestor record. Spark schemas cannot be "
            "recursive — pass on_recursion='prune' (or pre-process with "
            "schema.eliminate_recursion) to cut the cycle by dropping "
            "these fields, the AvroRecursionEliminatingConverter rule."
        )


def eliminate_recursion(
    json_schema: list[dict],
) -> tuple[list[dict], list[str]]:
    """Cut recursive type references out of a JSON-intermediate schema.

    Reference: AvroRecursionEliminatingConverter.java:42 — Avro permits
    a record field to reference an enclosing record by name (linked
    lists, trees); Spark's StructType is strictly finite, so the
    reference's rule is applied at ingest: any field whose type refers
    to an ancestor record (by registered name, or by Python object
    identity for self-referential specs) is REMOVED, and the pruned
    field paths are returned for audit. One level of each structure is
    kept — the cut happens at the first re-entry.

    Returns (sanitized schema copy, pruned field paths). Non-recursive
    named reuse (a reference to a record that is NOT an ancestor) is
    left untouched and will fail type conversion as before — resolving
    a full named-type registry is out of scope; recursion is the case
    that otherwise fails opaquely (RecursionError deep in the lattice).
    """
    pruned: list[str] = []

    def _walk_type(dt: Any, anc_names: tuple, anc_ids: tuple, path: str):
        """Sanitized copy of a dataType spec, or None if the type
        irreducibly re-enters an ancestor record."""
        if isinstance(dt, str):
            return None if dt in anc_names else dt
        if id(dt) in anc_ids:
            return None
        if isinstance(dt, list):  # union: drop recursive members
            members = []
            for m in dt:
                w = _walk_type(m, anc_names, anc_ids, path)
                if w is not None:
                    members.append(w)
            non_null = [m for m in members if m != "null"]
            return members if non_null else None
        if isinstance(dt, dict):
            kind = dt.get("type")
            anc_ids = anc_ids + (id(dt),)
            if isinstance(kind, str) and kind in anc_names:
                return None
            if kind == "array":
                items = _walk_type(dt["items"], anc_names, anc_ids, path)
                if items is None:
                    return None
                return {**dt, "items": items}
            if kind == "map":
                values = _walk_type(dt["values"], anc_names, anc_ids, path)
                if values is None:
                    return None
                return {**dt, "values": values}
            if kind in ("record", "struct"):
                name = dt.get("name")
                if name:
                    anc_names = anc_names + (name,)
                key = "fields" if "fields" in dt else "values"
                fields = []
                for f in dt.get(key, []):
                    w = _walk_field(f, anc_names, anc_ids, path)
                    if w is not None:
                        fields.append(w)
                return {**dt, key: fields}
            if isinstance(kind, (list, dict)):
                inner = _walk_type(kind, anc_names, anc_ids, path)
                if inner is None:
                    return None
                return {**dt, "type": inner}
            return dt
        return dt

    def _walk_field(entry: dict, anc_names: tuple, anc_ids: tuple, prefix: str):
        name = entry.get("columnName", entry.get("name"))
        path = f"{prefix}.{name}" if prefix else str(name)
        key = "dataType" if "dataType" in entry else "type"
        w = _walk_type(entry.get(key), anc_names, anc_ids, path)
        if w is None:
            pruned.append(path)
            return None
        return {**entry, key: w}

    out = []
    for e in json_schema:
        w = _walk_field(e, (), (), "")
        if w is not None:
            out.append(w)
    return out, pruned


def to_struct_type(
    json_schema: list[dict], on_recursion: str = "error"
) -> T.StructType:
    """JSON-intermediate schema (list of {columnName, dataType}) ->
    StructType.

    ``on_recursion``: "error" (default) raises :class:`SchemaRecursionError`
    naming the offending field paths when the schema is recursive —
    instead of the opaque RecursionError the raw lattice would hit;
    "prune" applies :func:`eliminate_recursion` and converts the
    sanitized schema."""
    sanitized, pruned = eliminate_recursion(json_schema)
    if pruned and on_recursion != "prune":
        raise SchemaRecursionError(pruned)
    return T.StructType([_convert_field(e) for e in sanitized])


def from_struct_type(schema: T.StructType) -> list[dict]:
    """StructType -> JSON-intermediate schema (round-trip support)."""

    def _type(dt: T.DataType) -> Any:
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": _type(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": _type(dt.valueType)}
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "fields": [
                    {"columnName": f.name, "dataType": {"type": _type(f.dataType)}}
                    for f in dt.fields
                ],
            }
        for name, t in _SCALARS.items():
            if dt == t and name not in ("time", "enum", "fixed"):
                return name
        raise ValueError(f"unmappable type: {dt}")

    return [
        {
            "columnName": f.name,
            "dataType": {"type": _type(f.dataType)},
            "isNullable": f.nullable,
        }
        for f in schema.fields
    ]


def parse_time_columns(schema: T.StructType) -> dict[str, Column]:
    """For DATE/TIMESTAMP fields declared with a string ``timeFormat``
    metadata (the JsonElementConversionFactory pattern-parse rule,
    :419-458): expressions converting the string column to the typed
    column."""
    out: dict[str, Column] = {}
    for f in schema.fields:
        fmt = (f.metadata or {}).get("timeFormat")
        if not fmt:
            continue
        if isinstance(f.dataType, T.DateType):
            out[f.name] = F.to_date(F.col(f.name), fmt)
        elif isinstance(f.dataType, T.TimestampType):
            out[f.name] = F.to_timestamp(F.col(f.name), fmt)
    return out
