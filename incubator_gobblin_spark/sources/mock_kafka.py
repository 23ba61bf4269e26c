"""File-backed Kafka-protocol DataSource ("mockkafka") via PySpark's
public Python DataSource API.

Purpose: the container has no spark-sql-kafka connector jar and no
network, so the REAL Kafka relation can never load here (pinned by
tests/test_connectors.py::test_kafka_wiring_gap_is_the_connector_jar).
This module makes the engine's Kafka surface EXECUTE anyway by
implementing the broker contract — topics, partitions, dense offsets,
bounded [start, end) pulls, earliest/latest metadata, streaming reads
with checkpointed progress, and a keyed producer — against an
append-only file log, behind the exact DataFrame schema Spark's Kafka
relation exposes (key/value binary, topic, partition, offset,
timestamp, timestampType).

Reference surface being exercised end-to-end:
- KafkaExtractor's bounded per-partition pull
  (gobblin-modules/gobblin-kafka-common/.../kafka/KafkaExtractor.java:59)
- KafkaSource work-unit planning feeding startingOffsets/endingOffsets
  (kafka/KafkaSource.java:190) — the SAME ``plan_offsets``/
  ``offsets_json`` output drives this source and the real connector.
- Kafka1DataWriter's keyed produce (Kafka1DataWriter.java:48) — the
  writer hashes keys to partitions (murmur-free stable hash) and
  assigns dense offsets under an exclusive file lock.

Scale posture: this is a test/dev loopback (a real deployment points the
identical planning + read code at format("kafka")). Even so the shapes
are honest: one InputPartition per topic-partition so the scan
parallelizes like the real relation's consumer-per-range, and streaming
offsets are per-partition dicts exactly like Kafka's JSON offsets.

Log layout: ``<root>/<topic>/p<partition>/log.jsonl`` — line N IS offset
N (dense, append-only, like a Kafka partition with no compaction).
Records hold base64 key/value + epoch-ms timestamp. Appends take an
flock so concurrent producer tasks interleave atomically.
"""

from __future__ import annotations

import base64
import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: the exact columns (names, types, order) of Spark's Kafka relation
KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


# ---------------------------------------------------------------- log I/O


def _part_dir(root: str, topic: str, partition: int) -> str:
    return os.path.join(root, topic, f"p{partition}")


def _log_path(root: str, topic: str, partition: int) -> str:
    return os.path.join(_part_dir(root, topic, partition), "log.jsonl")


def create_topic(root: str, topic: str, partitions: int) -> None:
    """Broker admin analogue: pre-create partition dirs so metadata ops
    see the topic before the first produce."""
    for p in range(partitions):
        os.makedirs(_part_dir(root, topic, p), exist_ok=True)


def topic_partitions(root: str, topic: str) -> list[int]:
    tdir = os.path.join(root, topic)
    if not os.path.isdir(tdir):
        raise FileNotFoundError(f"unknown topic {topic!r} under {root}")
    return sorted(
        int(d[1:]) for d in os.listdir(tdir) if d.startswith("p") and d[1:].isdigit()
    )


def partition_end_offset(root: str, topic: str, partition: int) -> int:
    """latest (= next offset to be assigned); line count of the log."""
    path = _log_path(root, topic, partition)
    if not os.path.exists(path):
        return 0
    with open(path, "rb") as fh:
        return sum(1 for _ in fh)


def partition_earliest_offset(root: str, topic: str, partition: int) -> int:
    """earliest retained offset (0 until retention expires records)."""
    marker = os.path.join(_part_dir(root, topic, partition), "earliest")
    if not os.path.exists(marker):
        return 0
    with open(marker) as fh:
        return int(fh.read().strip() or 0)


def expire_before(root: str, topic: str, partition: int, offset: int) -> None:
    """Retention expiry (broker admin analogue): records below
    ``offset`` fall out of the retained window — earliest advances,
    reads below it return nothing, and a committed consumer offset
    below it triggers the planner's OffsetResetPolicy
    (KafkaSource's topic.move.to.earliest/latest semantics). Offsets
    stay dense and immutable; only the retained window moves."""
    cur = partition_earliest_offset(root, topic, partition)
    if offset <= cur:
        return
    marker = os.path.join(_part_dir(root, topic, partition), "earliest")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(offset))
    os.replace(tmp, marker)


def earliest_latest(root: str, topic: str) -> tuple[dict[int, int], dict[int, int]]:
    """Broker metadata for work planning — feed straight into
    ``kafka_batch.plan_offsets``."""
    parts = topic_partitions(root, topic)
    return {p: partition_earliest_offset(root, topic, p) for p in parts}, {
        p: partition_end_offset(root, topic, p) for p in parts
    }


def append_records(
    root: str, topic: str, partition: int, records: list[tuple[bytes | None, bytes, int]]
) -> tuple[int, int]:
    """Append (key, value, ts_ms) records to one partition log under an
    exclusive lock; returns the assigned [first, last] offset range.
    Dense offsets come from the post-lock line count, so concurrent
    producers serialize exactly like broker appends."""
    os.makedirs(_part_dir(root, topic, partition), exist_ok=True)
    path = _log_path(root, topic, partition)
    with open(path, "a+b") as fh:
        try:
            import fcntl

            fcntl.flock(fh, fcntl.LOCK_EX)
        except ImportError:
            pass
        fh.seek(0)
        base = sum(1 for _ in fh)
        fh.seek(0, os.SEEK_END)
        for key, value, ts_ms in records:
            line = json.dumps(
                {
                    "k": base64.b64encode(key).decode() if key is not None else None,
                    "v": base64.b64encode(value).decode(),
                    "t": int(ts_ms),
                }
            )
            fh.write(line.encode() + b"\n")
        fh.flush()
    return base, base + len(records) - 1


def _read_range(root: str, topic: str, partition: int, start: int, end: int):
    """Yield Kafka-schema tuples for offsets [start, end) of one
    partition — the KafkaExtractor bounded pull. Expired offsets
    (below the retained window's earliest) yield nothing, like a broker
    whose segments were deleted."""
    start = max(start, partition_earliest_offset(root, topic, partition))
    path = _log_path(root, topic, partition)
    if not os.path.exists(path) or start >= end:
        return
    with open(path, "rb") as fh:
        for off, raw in enumerate(fh):
            if off < start:
                continue
            if off >= end:
                break
            rec = json.loads(raw)
            key = base64.b64decode(rec["k"]) if rec["k"] is not None else None
            yield (
                key,
                base64.b64decode(rec["v"]),
                topic,
                partition,
                off,
                datetime.fromtimestamp(rec["t"] / 1000.0, tz=timezone.utc),
                0,  # CreateTime, like the broker default
            )


def _parse_offsets(
    option: str | None,
    topic: str,
    earliest: dict[int, int],
    latest: dict[int, int],
    default: str,
) -> dict[int, int]:
    """Resolve a startingOffsets/endingOffsets option — ``earliest``,
    ``latest``, or the per-partition JSON {"topic": {"0": 5}} the real
    connector accepts (-1 = latest, -2 = earliest)."""
    opt = (option or default).strip()
    if opt == "earliest":
        return dict(earliest)
    if opt == "latest":
        return dict(latest)
    spec = json.loads(opt)
    out: dict[int, int] = {}
    for p, hi in latest.items():
        v = spec.get(topic, {}).get(str(p))
        if v is None or v == -1:
            out[p] = hi
        elif v == -2:
            out[p] = earliest.get(p, 0)
        else:
            out[p] = int(v)
    return out


# ------------------------------------------------------------- batch read


class _RangePartition(InputPartition):
    def __init__(self, topic: str, partition: int, start: int, end: int):
        self.topic, self.partition, self.start, self.end = (
            topic,
            partition,
            start,
            end,
        )


class MockKafkaBatchReader(DataSourceReader):
    """One InputPartition per topic-partition offset range — the scan
    parallelizes like the real relation (consumer per WorkUnit)."""

    def __init__(self, options):
        self.root = options["path"]
        self.topic = options["subscribe"]
        if "," in self.topic:
            raise ValueError(
                "mockkafka reads one topic per load; union multiple loads"
            )
        earliest, latest = earliest_latest(self.root, self.topic)
        self.starts = _parse_offsets(
            options.get("startingoffsets"), self.topic, earliest, latest,
            "earliest",
        )
        self.ends = _parse_offsets(
            options.get("endingoffsets"), self.topic, earliest, latest,
            "latest",
        )

    def partitions(self):
        return [
            _RangePartition(self.topic, p, self.starts.get(p, 0), self.ends[p])
            for p in sorted(self.ends)
        ]

    def read(self, part: _RangePartition):
        yield from _read_range(
            self.root, part.topic, part.partition, part.start, part.end
        )


# --------------------------------------------------------- streaming read


class MockKafkaStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source: offsets are per-partition dicts checkpointed
    by the engine, so a restarted query resumes exactly after the last
    committed batch (the KafkaStreamingExtractor no-reprocess
    contract)."""

    def __init__(self, options):
        self.root = options["path"]
        self.topic = options["subscribe"]
        self.start_opt = options.get("startingoffsets")

    def initialOffset(self) -> dict:
        earliest, latest = earliest_latest(self.root, self.topic)
        if self.start_opt == "latest":
            return {str(p): latest[p] for p in latest}
        return {str(p): earliest[p] for p in earliest}

    def read(self, start: dict):
        _, latest = earliest_latest(self.root, self.topic)
        end = {str(p): latest[p] for p in latest}
        rows = list(self._between(start, end))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._between(start, end)

    def _between(self, start: dict, end: dict):
        for p_str in sorted(end):
            p = int(p_str)
            yield from _read_range(
                self.root,
                self.topic,
                p,
                int(start.get(p_str, 0)),
                int(end[p_str]),
            )


# ---------------------------------------------------------------- produce


class _ProduceCommit(WriterCommitMessage):
    def __init__(self, spool: str, task_part: int):
        self.spool = spool
        self.task_part = task_part


class MockKafkaWriter(DataSourceWriter):
    """Producer analogue (Kafka1DataWriter.java:48): rows carry
    value (binary/string) and optionally key / partition / topic; keyed
    rows hash to a stable partition (same key -> same partition, the
    Kafka ordering guarantee), unkeyed rows land on partition 0 of the
    task (sticky batching).

    Offset assignment is two-phase: each task SPOOLS its records (in
    row order) and the driver's ``commit`` replays spools in task-
    partition order — so broker offsets follow the DataFrame's row
    order, the per-partition send-order guarantee a single Kafka
    producer gives. Without the spool, concurrent task appends race
    for offsets and two same-key records can commit in either order
    (a real flake: CDC keep-latest then resurrects the older value).
    Spools unapplied on abort also make batch produce effectively
    idempotent — the ``enable.idempotence`` producer contract."""

    def __init__(self, options, schema):
        import uuid

        self.root = options["path"]
        self.topic = options.get("topic")
        self.n_parts = int(options.get("numpartitions", "1"))
        self.fields = [f.name for f in schema.fields]
        # one uid per write JOB (constructed on the driver, pickled to
        # every task): spool names derive from (job_uid, task partition)
        # so two attempts of the same task — speculation, retry after a
        # post-spool crash — converge on ONE spool file instead of two
        # uuid spools that would both be applied at commit
        self.job_uid = uuid.uuid4().hex

    def write(self, rows):
        import time as _time
        import uuid

        from pyspark import TaskContext

        if self.topic:
            create_topic(self.root, self.topic, self.n_parts)
        # per-(topic,partition) buckets, row order preserved in each
        buckets: dict[tuple[str, int], list] = {}
        for row in rows:
            rec = dict(zip(self.fields, row))
            topic = rec.get("topic") or self.topic
            if topic is None:
                raise ValueError("no topic column and no 'topic' writer option")
            key = rec.get("key")
            if isinstance(key, str):
                key = key.encode()
            value = rec.get("value")
            if isinstance(value, str):
                value = value.encode()
            if value is None:
                raise ValueError("rows must carry a non-null 'value'")
            part = rec.get("partition")
            if part is None:
                if key is not None:
                    # stable byte-sum hash (NOT Python hash(): that is
                    # salted per-process and would scatter identical
                    # keys across runs)
                    part = int.from_bytes(key[:8].ljust(8, b"\0"), "big") % self.n_parts
                else:
                    part = 0
            ts = rec.get("timestamp")
            if ts is None:
                ts_ms = int(_time.time() * 1000)
            elif isinstance(ts, datetime):
                ts_ms = int(ts.timestamp() * 1000)
            else:
                ts_ms = int(ts)
            buckets.setdefault((topic, int(part)), []).append((key, value, ts_ms))
        ctx = TaskContext.get()
        task_part = ctx.partitionId() if ctx is not None else 0
        spool_dir = os.path.join(self.root, "_spool")
        os.makedirs(spool_dir, exist_ok=True)
        # deterministic per (job, task-partition): duplicate attempts
        # overwrite (atomically, identical content — the task's row set
        # is deterministic) rather than accumulate
        spool = os.path.join(spool_dir, f"{self.job_uid}-{task_part}.json")
        tmp = os.path.join(spool_dir, f".{self.job_uid}-{task_part}.{uuid.uuid4().hex}.tmp")
        payload = [
            [
                topic,
                part,
                [
                    [
                        base64.b64encode(k).decode() if k is not None else None,
                        base64.b64encode(v).decode(),
                        t,
                    ]
                    for k, v, t in recs
                ],
            ]
            for (topic, part), recs in sorted(buckets.items())
        ]
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, spool)
        return _ProduceCommit(spool, task_part)

    def _sweep_job_spools(self):
        """Remove every spool this job wrote, referenced or not: an
        attempt that died after json.dump but before returning its
        commit message would otherwise leak its file forever (neither
        commit nor abort ever sees a message naming it)."""
        import glob

        spool_dir = os.path.join(self.root, "_spool")
        for path in glob.glob(os.path.join(spool_dir, f"*{self.job_uid}*")):
            try:
                os.remove(path)
            except OSError:
                pass

    def commit(self, messages):
        # replay spools in task order: offsets are dense, deterministic,
        # and follow the DataFrame's row order within each partition
        for msg in sorted(
            (m for m in messages if m is not None),
            key=lambda m: (m.task_part, m.spool),
        ):
            if not os.path.exists(msg.spool):
                continue  # speculative duplicate already applied
            with open(msg.spool) as fh:
                payload = json.load(fh)
            for topic, part, recs in payload:
                append_records(
                    self.root,
                    topic,
                    int(part),
                    [
                        (
                            base64.b64decode(k) if k is not None else None,
                            base64.b64decode(v),
                            int(t),
                        )
                        for k, v, t in recs
                    ],
                )
            os.remove(msg.spool)
        self._sweep_job_spools()
        return None

    def abort(self, messages):
        for msg in messages or []:
            if msg is not None and os.path.exists(msg.spool):
                os.remove(msg.spool)
        self._sweep_job_spools()
        return None


class MockKafkaStreamWriter(DataSourceStreamWriter):
    """Streaming producer sink (``writeStream.format("mockkafka")``):
    every micro-batch's rows spool through the same keyed-produce path
    as the batch writer and append at epoch commit in task order. A
    replayed epoch re-appends (at-least-once across restarts — the real
    Kafka sink's contract; exactly-once belongs to the downstream
    reader's offset dedup, not the producer), but within one epoch
    offsets are deterministic and follow row order."""

    def __init__(self, options, schema):
        self._w = MockKafkaWriter(options, schema)

    def write(self, rows):
        return self._w.write(rows)

    def commit(self, messages, batchId):
        return self._w.commit(messages)

    def abort(self, messages, batchId):
        return self._w.abort(messages)


# -------------------------------------------------------------- datasource


class MockKafkaDataSource(DataSource):
    """``spark.read.format("mockkafka").option("path", root)
    .option("subscribe", topic)`` — plus writer and stream reader."""

    def __init__(self, options):
        super().__init__(options)
        self.options = {k.lower(): v for k, v in options.items()}

    @classmethod
    def name(cls):
        return "mockkafka"

    def schema(self):
        return KAFKA_SCHEMA

    def reader(self, schema):
        return MockKafkaBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return MockKafkaStreamReader(self.options)

    def writer(self, schema, overwrite):
        return MockKafkaWriter(self.options, schema)

    def streamWriter(self, schema, overwrite):
        return MockKafkaStreamWriter(self.options, schema)


def _ship_package(spark) -> None:
    """Make ``incubator_gobblin_spark`` importable on executor Python
    workers. The DataSource class is cloudpickled BY REFERENCE, so the
    worker re-imports this module — which fails whenever the driver's
    cwd isn't the repo root (and on any real cluster where the package
    isn't installed). Shipping a zip via addPyFile is the standard
    deployment for a pure-Python package; done once per session."""
    if getattr(spark, "_igs_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import incubator_gobblin_spark as pkg

    pkgdir = os.path.dirname(os.path.abspath(pkg.__file__))
    root = os.path.dirname(pkgdir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"igs_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkgdir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    # Spark's DRIVER-side Python streaming source runner resolves its
    # includes under <userFiles>/streaming_job/ (the root it is handed
    # is suffixed), but addPyFile materializes the zip in <userFiles>/
    # itself — without this mirror copy, every streaming Python
    # DataSource unpickle fails with ModuleNotFoundError whenever the
    # driver's cwd isn't the repo root.
    try:
        import shutil

        from pyspark.core.files import SparkFiles

        sj = os.path.join(SparkFiles.getRootDirectory(), "streaming_job")
        os.makedirs(sj, exist_ok=True)
        shutil.copy(zpath, os.path.join(sj, os.path.basename(zpath)))
    except Exception:
        pass  # non-local deployments install the package instead
    spark._igs_pkg_shipped = True


def register(spark) -> None:
    _ship_package(spark)
    spark.dataSource.register(MockKafkaDataSource)
