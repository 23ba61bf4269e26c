"""Avro object-container-file (OCF) codec + distributed read/write.

Reference surface: Avro is Gobblin's dominant lake format —
AvroHdfsDataWriter stages avro container files (gobblin-core
.../writer/AvroHdfsDataWriter.java:51), AvroToBytesConverter /
BytesToAvroConverter do binary serde (gobblin-core
.../converter/avro/AvroToBytesConverter.java:41, BytesToAvroConverter.java:40),
and DatePartitionedAvroFileExtractor scans date-layout avro trees
(.../source/extractor/DatePartitionedAvroFileExtractor.java:28).

Spark-first design, two tiers:

1. FILE-level avro scan/write is NATIVE. Spark 4's ``spark-sql`` jar
   ships the complete avro FileFormat implementation
   (``org.apache.spark.sql.avro.AvroFileFormat`` + Avro(De)Serializer)
   — only the short-name registration lives in the external spark-avro
   package. ``read_avro``/``write_avro`` address the format by its
   fully-qualified class name, which Spark's DataSource lookup resolves
   via Class.forName: columnar, JVM-side, codegen'd — identical
   execution to a cluster with spark-avro deployed.
2. BINARY-COLUMN serde (``from_avro``/``to_avro``, the
   AvroToBytesConverter/BytesToAvroConverter + registry-envelope
   surface) has no JVM implementation here (AvroDataToCatalyst is only
   in spark-avro), so the engine carries a self-contained pure-Python
   avro codec (zigzag varints, JSON schema, deflate blocks, sync
   markers) applied via Arrow-batched pandas UDFs.

The pure-Python tier also backs a full OCF container read/write
fallback for clusters where even the FileFormat class is absent:

- read: ``binaryFile`` scan lists + splits by FILE (one task per avro
  file — the same parallelism unit as the reference's one-WorkUnit-per-
  file FileBasedSource) and decodes inside ``mapInPandas`` → Arrow
  batches. No driver-side data movement; only the first file's HEADER
  (a few KB) is read on the driver for schema inference.
- write: each Spark partition encodes its rows to one container file
  inside ``mapInPandas`` and emits a one-row manifest (path, rows);
  collecting the manifest is the action that drives the write. Files
  land in the caller's staging dir, so the staged-atomic-publish flow
  (sinks/files.py) applies unchanged.

Scale: per-file decode parallelism matches how avro lakes are laid out
(many O(100 MB) files); a single giant avro file would pin one task,
exactly like the reference's per-file extractor. Python decode costs
~1-2 MB/s/core — the docstring-level contract is "correct + distributed
everywhere, fast where spark-avro exists".
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import date, datetime, timedelta, timezone
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# Spark 4 ships the avro FileFormat inside spark-sql; only the
# short-name ("avro") registration is external. Addressing the class
# directly gives native columnar avro without the spark-avro package.
AVRO_FORMAT = "org.apache.spark.sql.avro.AvroFileFormat"
_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# varint / zigzag primitives (Avro spec "Binary encoding")
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    """Positional reader over an in-memory avro block."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_long(self) -> int:
        buf, pos = self.buf, self.pos
        shift = 0
        acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return _zigzag_decode(acc)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


# ---------------------------------------------------------------------------
# schema-driven decoder/encoder compilation
# ---------------------------------------------------------------------------


def _schema_type(schema: Any) -> Any:
    """Normalize a schema node to its type tag (str) or the node itself
    for unions (lists)."""
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def make_decoder(schema: Any) -> Callable[[_Reader], Any]:
    """Compile an avro schema node into a closure tree decoder.

    Logical types decoded to Python natives Spark's Arrow conversion
    accepts: date -> datetime.date, timestamp-millis/micros ->
    naive UTC datetime (Spark session TZ is UTC in the engine)."""
    if isinstance(schema, list):  # union
        branches = [make_decoder(s) for s in schema]

        def _union(r: _Reader, _b=branches):
            return _b[r.read_long()](r)

        return _union

    t = _schema_type(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None

    if t == "null":
        return lambda r: None
    if t == "boolean":
        def _bool(r: _Reader):
            b = r.buf[r.pos]
            r.pos += 1
            return b == 1
        return _bool
    if t == "int":
        if logical == "date":
            return lambda r: _EPOCH_DATE + timedelta(days=r.read_long())
        return lambda r: r.read_long()
    if t == "long":
        if logical in ("timestamp-micros", "local-timestamp-micros"):
            return lambda r: (_EPOCH_DT + timedelta(microseconds=r.read_long())).replace(tzinfo=None)
        if logical in ("timestamp-millis", "local-timestamp-millis"):
            return lambda r: (_EPOCH_DT + timedelta(milliseconds=r.read_long())).replace(tzinfo=None)
        return lambda r: r.read_long()
    if t == "float":
        def _float(r: _Reader):
            (v,) = struct.unpack_from("<f", r.buf, r.pos)
            r.pos += 4
            return v
        return _float
    if t == "double":
        def _double(r: _Reader):
            (v,) = struct.unpack_from("<d", r.buf, r.pos)
            r.pos += 8
            return v
        return _double
    if t == "bytes":
        return lambda r: r.read_bytes()
    if t == "string":
        return lambda r: r.read_bytes().decode("utf-8")
    if t == "fixed":
        size = schema["size"]
        return lambda r: r.read_fixed(size)
    if t == "enum":
        symbols = schema["symbols"]
        return lambda r: symbols[r.read_long()]
    if t == "array":
        item = make_decoder(schema["items"])

        def _array(r: _Reader, _item=item):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_item(r))

        return _array
    if t == "map":
        val = make_decoder(schema["values"])

        def _map(r: _Reader, _val=val):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = _val(r)

        return _map
    if t == "record":
        fields = [(f["name"], make_decoder(f["type"])) for f in schema["fields"]]

        def _record(r: _Reader, _fields=fields):
            return {name: dec(r) for name, dec in _fields}

        return _record
    # named-type reference or nested {"type": {...}} wrapper
    if isinstance(schema, dict) and isinstance(t, (dict, list)):
        return make_decoder(t)
    raise ValueError(f"unsupported avro type: {schema!r}")


def make_encoder(schema: Any) -> Callable[[bytearray, Any], None]:
    """Compile an avro schema node into an encoder closure tree.

    Accepts Python/pandas natives: None, bool, int, float, str, bytes,
    date, datetime, pandas.Timestamp, list, dict (for map/record)."""
    if isinstance(schema, list):  # union — resolve branch by value
        null_idx = next((i for i, s in enumerate(schema) if _schema_type(s) == "null"), None)
        non_null = [(i, s) for i, s in enumerate(schema) if _schema_type(s) != "null"]
        if len(non_null) != 1:
            raise ValueError("general (non-nullable) unions not supported for encode")
        idx, branch_schema = non_null[0]
        branch = make_encoder(branch_schema)

        def _union(out: bytearray, v, _idx=idx, _null=null_idx, _b=branch):
            if v is None:
                if _null is None:
                    raise ValueError("null value for non-nullable union")
                _write_long(out, _null)
            else:
                _write_long(out, _idx)
                _b(out, v)

        return _union

    t = _schema_type(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None

    if t == "null":
        return lambda out, v: None
    if t == "boolean":
        return lambda out, v: out.append(1 if v else 0)
    if t == "int":
        if logical == "date":
            return lambda out, v: _write_long(out, (v - _EPOCH_DATE).days)
        return _write_long
    if t == "long":
        if logical in ("timestamp-micros", "local-timestamp-micros"):
            def _ts(out: bytearray, v):
                if isinstance(v, datetime):
                    if v.tzinfo is None:
                        v = v.replace(tzinfo=timezone.utc)
                    _write_long(out, int(v.timestamp() * 1_000_000))
                else:  # pandas.Timestamp: .value is epoch nanos
                    _write_long(out, v.value // 1000)
            return _ts
        return _write_long
    if t == "float":
        return lambda out, v: out.extend(struct.pack("<f", v))
    if t == "double":
        return lambda out, v: out.extend(struct.pack("<d", float(v)))
    if t == "bytes":
        def _bytes(out: bytearray, v):
            v = bytes(v)
            _write_long(out, len(v))
            out.extend(v)
        return _bytes
    if t == "string":
        def _str(out: bytearray, v):
            b = str(v).encode("utf-8")
            _write_long(out, len(b))
            out.extend(b)
        return _str
    if t == "fixed":
        size = schema["size"]
        def _fixed(out: bytearray, v, _n=size):
            v = bytes(v)
            if len(v) != _n:
                raise ValueError(f"fixed size mismatch: {len(v)} != {_n}")
            out.extend(v)
        return _fixed
    if t == "enum":
        index = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda out, v: _write_long(out, index[v])
    if t == "array":
        item = make_encoder(schema["items"])

        def _array(out: bytearray, v, _item=item):
            if len(v):
                _write_long(out, len(v))
                for x in v:
                    _item(out, x)
            _write_long(out, 0)

        return _array
    if t == "map":
        val = make_encoder(schema["values"])

        def _map(out: bytearray, v, _val=val):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    kb = str(k).encode("utf-8")
                    _write_long(out, len(kb))
                    out.extend(kb)
                    _val(out, x)
            _write_long(out, 0)

        return _map
    if t == "record":
        fields = [(f["name"], make_encoder(f["type"])) for f in schema["fields"]]

        def _record(out: bytearray, v, _fields=fields):
            for name, enc in _fields:
                enc(out, v.get(name) if isinstance(v, dict) else getattr(v, name))

        return _record
    if isinstance(schema, dict) and isinstance(t, (dict, list)):
        return make_encoder(t)
    raise ValueError(f"unsupported avro type: {schema!r}")


# ---------------------------------------------------------------------------
# container file (OCF) layer
# ---------------------------------------------------------------------------


def read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """Parse an OCF header → (schema, codec, sync_marker, body_offset)."""
    if data[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read_fixed(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, r.pos


def read_meta(data: bytes) -> dict[str, bytes]:
    """Parse an OCF header's full metadata map (every key, not just
    avro.schema/avro.codec) — Iceberg manifests carry spec-required
    application keys ("schema", "partition-spec", ...) there."""
    if data[:4] != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    return meta


def decode_ocf(data: bytes, decoder: Callable[[_Reader], Any] | None = None) -> tuple[dict, list]:
    """Decode a whole container file from bytes → (schema, records)."""
    schema, codec, sync, pos = read_header(data)
    if decoder is None:
        decoder = make_decoder(schema)
    records: list = []
    r = _Reader(data)
    r.pos = pos
    total = len(data)
    while r.pos < total:
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(decoder(br))
        if r.read_fixed(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
    return schema, records


def encode_ocf(
    schema: dict,
    records,
    codec: str = "deflate",
    block_records: int = 4096,
    extra_meta: dict[str, bytes] | None = None,
) -> bytes:
    """Encode records into container-file bytes (AvroHdfsDataWriter's
    deflate-codec default, AvroHdfsDataWriter.java:51). ``extra_meta``
    adds application metadata to the header map (the Iceberg manifest
    spec requires keys like "schema"/"partition-spec" there)."""
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    head = bytearray()
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **(extra_meta or {}),
    }
    _write_long(head, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_long(head, len(kb))
        head.extend(kb)
        _write_long(head, len(v))
        head.extend(v)
    _write_long(head, 0)
    out.write(bytes(head))
    out.write(sync)

    encoder = make_encoder(schema)
    buf = bytearray()
    n_in_block = 0

    def _flush():
        nonlocal buf, n_in_block
        if not n_in_block:
            return
        payload = bytes(buf)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        blk = bytearray()
        _write_long(blk, n_in_block)
        _write_long(blk, len(payload))
        out.write(bytes(blk))
        out.write(payload)
        out.write(sync)
        buf = bytearray()
        n_in_block = 0

    for rec in records:
        encoder(buf, rec)
        n_in_block += 1
        if n_in_block >= block_records:
            _flush()
    _flush()
    return out.getvalue()


# ---------------------------------------------------------------------------
# avro JSON schema <-> Spark StructType
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}

_SPARK_TO_AVRO: list[tuple[type, Any]] = [
    (T.BooleanType, "boolean"),
    (T.ByteType, "int"),
    (T.ShortType, "int"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BinaryType, "bytes"),
    (T.StringType, "string"),
    (T.DateType, {"type": "int", "logicalType": "date"}),
    (T.TimestampType, {"type": "long", "logicalType": "timestamp-micros"}),
    (T.TimestampNTZType, {"type": "long", "logicalType": "local-timestamp-micros"}),
]


def avro_to_spark_type(schema: Any) -> tuple[T.DataType, bool]:
    """Avro schema node → (Spark type, nullable). Same lattice rules as
    schema.py (§1.3): [T, null] → nullable T; enum → string; fixed →
    binary; logical date/timestamp → Date/TimestampType."""
    if isinstance(schema, list):
        non_null = [s for s in schema if _schema_type(s) != "null"]
        nullable = len(non_null) != len(schema)
        if len(non_null) == 1:
            inner, _ = avro_to_spark_type(non_null[0])
            return inner, True if nullable else False
        fields = []
        for i, m in enumerate(non_null):
            mt, _ = avro_to_spark_type(m)
            fields.append(T.StructField(f"member_{i}", mt, True))
        return T.StructType(fields), True
    t = _schema_type(schema)
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    if logical == "date":
        return T.DateType(), False
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType(), False
    if logical in ("local-timestamp-micros", "local-timestamp-millis"):
        return T.TimestampNTZType(), False
    if isinstance(t, str) and t in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[t], t == "null"
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    if t == "array":
        it, inull = avro_to_spark_type(schema["items"])
        return T.ArrayType(it, inull), False
    if t == "map":
        vt, vnull = avro_to_spark_type(schema["values"])
        return T.MapType(T.StringType(), vt, vnull), False
    if t == "record":
        return (
            T.StructType(
                [
                    T.StructField(f["name"], *avro_to_spark_type(f["type"])[:1], True)
                    for f in schema["fields"]
                ]
            ),
            False,
        )
    if isinstance(t, (dict, list)):
        return avro_to_spark_type(t)
    raise ValueError(f"unsupported avro schema: {schema!r}")


def avro_to_struct(schema: dict) -> T.StructType:
    """Top-level avro record schema → StructType."""
    if _schema_type(schema) != "record":
        raise ValueError("top-level avro schema must be a record")
    fields = []
    for f in schema["fields"]:
        ft, nullable = avro_to_spark_type(f["type"])
        if isinstance(f["type"], list):
            nullable = any(_schema_type(s) == "null" for s in f["type"])
        fields.append(T.StructField(f["name"], ft, nullable))
    return T.StructType(fields)


def struct_to_avro(schema: T.StructType, name: str = "spark_record") -> dict:
    """StructType → avro record schema; nullable fields become
    ``[null, T]`` unions (JsonIntermediateToAvroConverter's rule)."""

    def _type(dt: T.DataType) -> Any:
        for cls, avro_t in _SPARK_TO_AVRO:
            if isinstance(dt, cls):
                return avro_t
        if isinstance(dt, T.ArrayType):
            items = _type(dt.elementType)
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        if isinstance(dt, T.MapType):
            values = _type(dt.valueType)
            if dt.valueContainsNull:
                values = ["null", values]
            return {"type": "map", "values": values}
        if isinstance(dt, T.StructType):
            return _record(dt, f"{name}_nested")
        raise ValueError(f"unmappable Spark type for avro: {dt}")

    _nested_counter = [0]

    def _record(st: T.StructType, rec_name: str) -> dict:
        _nested_counter[0] += 1
        fields = []
        for f in st.fields:
            ft = _type(f.dataType)
            if f.nullable:
                ft = ["null", ft]
            fields.append({"name": f.name, "type": ft})
        return {
            "type": "record",
            "name": f"{rec_name}_{_nested_counter[0]}" if rec_name != name else name,
            "fields": fields,
        }

    return _record(schema, name)


# ---------------------------------------------------------------------------
# distributed read / write
# ---------------------------------------------------------------------------


def _ensure_portable_pickling() -> None:
    """Mark the formats modules for BY-VALUE cloudpickle serialization.

    The codec UDF closures reference module-level functions; by default
    cloudpickle serializes those by reference, which requires
    ``incubator_gobblin_spark`` to be importable inside every executor
    Python worker — true when the driver runs from the repo root, false
    for an arbitrary-cwd driver (exactly how a cluster submits jobs
    without shipping the package). By-value registration makes every
    UDF closure self-contained: no addPyFile / PYTHONPATH coupling."""
    try:
        from pyspark import cloudpickle

        import incubator_gobblin_spark.formats.avro_ocf as _m1

        cloudpickle.register_pickle_by_value(_m1)
        try:
            import incubator_gobblin_spark.formats.registry as _m2

            cloudpickle.register_pickle_by_value(_m2)
        except ImportError:  # pragma: no cover
            pass
    except Exception:  # pragma: no cover - best effort, old cloudpickle
        pass


def resolve_format(fmt: str) -> str:
    """Translate the engine's short format names to loadable data-source
    names. "avro" has no short-name registration without the spark-avro
    package, but the implementation class ships in spark-sql — address
    it by fully-qualified name."""
    return AVRO_FORMAT if fmt == "avro" else fmt


def _native_avro_available(spark: SparkSession) -> bool:
    """True when the avro FileFormat class resolves in the JVM. We probe
    with Class.forName (cheap) — lookupDataSource resolves the
    fully-qualified name through the same loader at read/write time."""
    try:
        spark._jvm.java.lang.Class.forName(AVRO_FORMAT)
        return True
    except Exception:
        return False


def _first_avro_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".avro") and not n.startswith((".", "_")):
                return os.path.join(root, n)
    raise FileNotFoundError(f"no .avro files under {path}")


def read_avro(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    force_python: bool = False,
) -> DataFrame:
    """Distributed avro scan. Native FileFormat when the class resolves
    (always in Spark 4 — columnar, pushdown-capable); else binaryFile +
    mapInPandas pure-Python decode (one task per file). Schema inferred
    from the first file's header (driver reads the header bytes only)."""
    if not force_python and _native_avro_available(spark):
        reader = spark.read.format(AVRO_FORMAT)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.option("recursiveFileLookup", "true").load(path)

    _ensure_portable_pickling()
    if schema is None:
        first = _first_avro_file(path)
        with open(first, "rb") as fh:
            head = fh.read(1 << 20)  # headers are KBs; 1 MB covers huge schemas
        avro_schema, _codec, _sync, _pos = read_header(head)
        schema = avro_to_struct(avro_schema)

    names = [f.name for f in schema.fields]

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                _schema, records = decode_ocf(bytes(row["content"]))
                if not records:
                    continue
                yield pd.DataFrame.from_records(records, columns=names)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("content")
    )
    return binary.mapInPandas(_decode, schema=schema)


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    record_name: str = "spark_record",
    force_python: bool = False,
    mode: str = "overwrite",
) -> int:
    """Distributed avro write: native FileFormat when the class resolves
    (one file per task, committer-managed); else pure-Python encode of
    one container file per partition. Returns files written (-1 =
    native, count unknown without a listing). Mirrors
    AvroHdfsDataWriter's staging-file + deflate defaults
    (AvroHdfsDataWriter.java:51)."""
    spark = df.sparkSession
    if not force_python and _native_avro_available(spark):
        (
            df.write.format(AVRO_FORMAT)
            .option("compression", codec)
            .mode(mode)
            .save(path)
        )
        return -1

    _ensure_portable_pickling()
    avro_schema = struct_to_avro(df.schema, record_name)
    names = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import uuid as _uuid

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0

        def _clean(v):
            # scalar NaN/NaT -> None so nullable unions encode correctly;
            # array cells (numpy) pass through untouched
            if v is None or v is pd.NaT:
                return None
            if isinstance(v, float) and v != v:
                return None
            return v

        records: list[dict] = []
        for pdf in batches:
            cols = {c: [_clean(v) for v in pdf[c]] for c in names}
            records.extend(
                dict(zip(names, vals)) for vals in zip(*(cols[c] for c in names))
            )
        if records:
            fname = os.path.join(
                path, f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.avro"
            )
            data = encode_ocf(avro_schema, records, codec=codec)
            tmp = fname + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, fname)
            yield pd.DataFrame({"path": [fname], "rows": [len(records)]})
        else:
            yield pd.DataFrame({"path": pd.Series([], dtype=str), "rows": pd.Series([], dtype="int64")})

    manifest = df.mapInPandas(_encode, schema="path string, rows long").collect()
    return len([r for r in manifest if r["rows"]])


# ---------------------------------------------------------------------------
# binary-column serde: the AvroToBytesConverter / BytesToAvroConverter pair
# (single-record binary encoding, no container framing) — also the base
# of the registry envelope decode in formats/registry.py. No JVM
# implementation exists without spark-avro (AvroDataToCatalyst lives
# there), so these are Arrow-batched pandas UDFs over the Python codec.
# ---------------------------------------------------------------------------


def encode_record(schema: dict, record: dict) -> bytes:
    out = bytearray()
    make_encoder(schema)(out, record)
    return bytes(out)


def decode_record(schema: dict, data: bytes) -> Any:
    return make_decoder(schema)(_Reader(data))


def from_avro_column(col, avro_schema: dict | str):
    """``from_avro`` analogue: binary column -> struct column
    (BytesToAvroConverter.java:40). Decoder compiled once per task."""
    from pyspark.sql import functions as F

    _ensure_portable_pickling()
    schema = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
    spark_type, _ = avro_to_spark_type(schema)
    if not isinstance(spark_type, T.StructType):
        raise ValueError("from_avro_column expects a record schema")

    @F.pandas_udf(returnType=spark_type)
    def _decode(s: pd.Series) -> pd.DataFrame:
        dec = make_decoder(schema)
        vals = [None if v is None else dec(_Reader(bytes(v))) for v in s]
        return pd.DataFrame.from_records(
            vals, columns=[f.name for f in spark_type.fields]
        )

    return _decode(col)


def to_avro_column(col, avro_schema: dict | str):
    """``to_avro`` analogue: struct column -> binary column
    (AvroToBytesConverter.java:41)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as _T

    _ensure_portable_pickling()
    schema = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema

    @F.pandas_udf(returnType=_T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        enc = make_encoder(schema)
        # struct input arrives as a DataFrame (one column per field) or
        # as a Series of dicts depending on the arrow conversion mode
        recs = s.to_dict("records") if isinstance(s, pd.DataFrame) else list(s)
        out = []
        for rec in recs:
            buf = bytearray()
            enc(buf, rec)
            out.append(bytes(buf))
        return pd.Series(out)

    return _encode(col)
