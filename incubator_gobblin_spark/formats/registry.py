"""Schema-registry envelope decode/encode.

Reference surface: EnvelopeSchemaConverter extracts a schema id from
each Kafka record, looks the writer schema up in a schema registry, and
deserializes the avro payload (gobblin-modules/gobblin-kafka-common
.../converter/EnvelopeSchemaConverter.java:57); KafkaSchemaChangeInjector
watches the registry's latest schema and injects a
MetadataUpdateControlMessage when it changes
(.../converter/KafkaSchemaChangeInjector.java:48).

Spark-first mapping (SURVEY §2.4/§2.11): the registry is consulted at
PLAN time — a snapshot of id->schema is captured into the decode
closure (broadcast with the task binary), so executors never call the
registry. Mixed writer-schema batches decode per record by embedded id
and are projected onto the READER schema by field name (avro schema
resolution: missing-in-writer -> null, extra-in-writer -> dropped).
Mid-stream schema change maps to micro-batch boundary detection: a
``SchemaChangeMonitor`` spots unknown ids / registry drift in
``foreachBatch`` and the flow restarts with the new reader schema — the
documented restart semantics, now with executable detection.

Wire format: 1-byte magic 0x00 + 4-byte big-endian schema id + avro
binary body — the de-facto registry envelope framing (the reference's
``KafkaAvroSchemaRegistry`` uses a magic + md5-hash header; id-based
framing is the same shape with a smaller key).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator, Protocol

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_gobblin_spark.formats.avro_ocf import (
    _Reader,
    _ensure_portable_pickling,
    avro_to_struct,
    make_decoder,
    make_encoder,
)

MAGIC_BYTE = 0


class SchemaRegistry(Protocol):
    """Minimal registry client surface (KafkaAvroSchemaRegistry
    analogue). Implementations: in-memory (tests), file-backed (local
    lakes); an HTTP client plugs in by implementing these three."""

    def get_by_id(self, schema_id: int) -> dict: ...

    def latest(self, subject: str) -> tuple[int, dict]: ...

    def register(self, subject: str, schema: dict) -> int: ...


class InMemorySchemaRegistry:
    """Dict-backed registry; ids are globally unique and stable for a
    given schema JSON (re-registering the same schema returns the same
    id, like the reference registry's schema-hash keying)."""

    def __init__(self) -> None:
        self._by_id: dict[int, dict] = {}
        self._subjects: dict[str, list[int]] = {}
        self._hash_to_id: dict[str, int] = {}
        self._next = 1

    def get_by_id(self, schema_id: int) -> dict:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, dict]:
        ids = self._subjects[subject]
        return ids[-1], self._by_id[ids[-1]]

    def register(self, subject: str, schema: dict) -> int:
        key = json.dumps(schema, sort_keys=True)
        sid = self._hash_to_id.get(key)
        if sid is None:
            sid = self._next
            self._next += 1
            self._hash_to_id[key] = sid
            self._by_id[sid] = schema
        self._subjects.setdefault(subject, [])
        if sid not in self._subjects[subject]:
            self._subjects[subject].append(sid)
        return sid

    def snapshot(self) -> dict[int, dict]:
        return dict(self._by_id)


class FileSchemaRegistry(InMemorySchemaRegistry):
    """Registry persisted as one JSON document — the FsStateStore-style
    local analogue, so batch jobs across processes share ids."""

    def __init__(self, path: str) -> None:
        super().__init__()
        self.path = path
        if os.path.exists(path):
            doc = json.load(open(path))
            self._by_id = {int(k): v for k, v in doc["by_id"].items()}
            self._subjects = doc["subjects"]
            self._hash_to_id = {
                json.dumps(v, sort_keys=True): k for k, v in self._by_id.items()
            }
            self._next = max(self._by_id, default=0) + 1

    def register(self, subject: str, schema: dict) -> int:
        sid = super().register(subject, schema)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"by_id": self._by_id, "subjects": self._subjects}, fh)
        os.replace(tmp, self.path)
        return sid


def encode_envelope(col: Column | str, schema: dict, schema_id: int) -> Column:
    """struct column -> envelope binary (magic + id + avro body)."""
    _ensure_portable_pickling()

    @F.pandas_udf(returnType=T.BinaryType())
    def _enc(s: pd.Series) -> pd.Series:
        enc = make_encoder(schema)
        head = struct.pack(">bI", MAGIC_BYTE, schema_id)
        recs = s.to_dict("records") if isinstance(s, pd.DataFrame) else list(s)
        out = []
        for rec in recs:
            buf = bytearray(head)
            enc(buf, rec)
            out.append(bytes(buf))
        return pd.Series(out)

    return _enc(col if isinstance(col, Column) else F.col(col))


def decode_envelope(
    col: Column | str,
    registry: SchemaRegistry,
    reader_schema: dict | None = None,
    subject: str | None = None,
) -> Column:
    """envelope binary column -> struct column typed by the READER
    schema (registry latest for ``subject`` unless given explicitly).

    EnvelopeSchemaConverter.java:57 semantics per record: extract id,
    fetch writer schema, deserialize; then avro name-based schema
    resolution onto the reader struct. The registry is snapshotted at
    plan time — executors decode from the captured dict. Records whose
    id is missing from the snapshot raise (fail-fast — the
    SchemaChangeMonitor is the graceful path)."""
    _ensure_portable_pickling()
    if reader_schema is None:
        if subject is None:
            raise ValueError("need reader_schema or subject")
        _, reader_schema = registry.latest(subject)
    out_type = avro_to_struct(reader_schema)
    reader_fields = [f.name for f in out_type.fields]
    snap = (
        registry.snapshot()
        if hasattr(registry, "snapshot")
        else {}
    )

    @F.pandas_udf(returnType=out_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        decoders: dict[int, object] = {}
        rows = []
        for v in s:
            if v is None:
                rows.append({n: None for n in reader_fields})
                continue
            b = bytes(v)
            magic, sid = struct.unpack_from(">bI", b, 0)
            if magic != MAGIC_BYTE:
                raise ValueError(f"bad envelope magic byte: {magic}")
            dec = decoders.get(sid)
            if dec is None:
                if sid not in snap:
                    raise KeyError(
                        f"schema id {sid} not in plan-time registry snapshot"
                    )
                dec = make_decoder(snap[sid])
                decoders[sid] = dec
            rec = dec(_Reader(b[5:]))
            rows.append({n: rec.get(n) for n in reader_fields})
        return pd.DataFrame.from_records(rows, columns=reader_fields)

    return _dec(col if isinstance(col, Column) else F.col(col))


def extract_schema_id(col: Column | str) -> Column:
    """Envelope binary -> schema id (int column), JVM-side: the
    cheap projection the change monitor aggregates over — no Python."""
    c = col if isinstance(col, Column) else F.col(col)
    # bytes 2..5 big-endian unsigned int (1-indexed substr positions)
    b = [F.conv(F.hex(F.substring(c, i + 2, 1)), 16, 10).cast("long") for i in range(4)]
    return (
        (b[0] * F.lit(1 << 24)) + (b[1] * F.lit(1 << 16)) + (b[2] * F.lit(1 << 8)) + b[3]
    ).cast("int").alias("schema_id")


class SchemaChangeMonitor:
    """KafkaSchemaChangeInjector analogue for micro-batch execution:
    call ``check(batch_df, col)`` per batch; returns the set of ids in
    the batch that were unknown at plan time (empty = no change). The
    streaming flow treats a non-empty result as the
    MetadataUpdateControlMessage — finish the batch with the old
    schema, then restart the query with a fresh registry snapshot
    (the documented restart-on-change semantics)."""

    def __init__(self, registry: SchemaRegistry) -> None:
        self.known: set[int] = set(
            registry.snapshot() if hasattr(registry, "snapshot") else {}
        )
        self.seen_unknown: set[int] = set()

    def check(self, batch_df: DataFrame, col: Column | str = "value") -> set[int]:
        ids = {
            r["schema_id"]
            for r in batch_df.select(extract_schema_id(col)).distinct().collect()
        }
        new = ids - self.known
        self.seen_unknown |= new
        return new
