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


def to_struct_type(json_schema: list[dict]) -> T.StructType:
    """JSON-intermediate schema (list of {columnName, dataType}) ->
    StructType."""
    return T.StructType([_convert_field(e) for e in json_schema])


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
