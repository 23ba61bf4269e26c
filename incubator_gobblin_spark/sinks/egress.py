"""Generic async batched egress writer: the one pattern behind the
reference's HTTP / Eventhub / Couchbase / Elasticsearch writers.

Reference:
- AsyncHttpWriter (gobblin-modules/gobblin-http
  .../writer/AsyncHttpWriter.java:49): buffer records, dispatch async,
  bounded outstanding requests, retry with backoff, fail the task after
  maxAttempts.
- EventhubDataWriter (gobblin-modules/gobblin-eventhub
  .../writer/EventhubDataWriter.java:75): size-bounded batching against
  a REST endpoint.
- CouchbaseWriter (gobblin-modules/gobblin-couchbase
  .../writer/CouchbaseWriter.java:72): async mutations with a
  write-response callback.
- FutureCallbackHolder (gobblin-elasticsearch
  .../writer/FutureCallbackHolder.java:44): future-per-batch ack/nack
  bookkeeping.

All four are one design: batch -> async dispatch window -> ack or retry
-> at-least-once. Spark-first, that lives in ``mapPartitions``: each
task drains its partition through a bounded in-flight window of batch
sends (a small thread pool — I/O concurrency, not CPU), rate-limited by
a per-task TokenBucket, each batch retried with exponential backoff.

Delivery contract (same as the reference's writers): AT-LEAST-ONCE.
A batch that fails BEFORE the endpoint applies it retries without
duplicates; a batch whose ack is lost AFTER apply is resent and
duplicates — idempotent endpoints (keyed upserts, ES doc ids) make that
exactly-once, which is the receiver's job, not the writer's. Both modes
are exercised in tests/test_connectors.py against a file-backed double.

At scale: egress parallelism = Spark tasks; aggregate request rate =
``rate_per_sec x tasks`` (size rate_per_sec = target / expected tasks,
the ThrottleWriter arithmetic). No shuffle is introduced — the writer
consumes whatever partitioning the upstream plan produced; callers
wanting fewer, larger connections coalesce first.
"""

from __future__ import annotations

import time
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame

__all__ = ["EgressConfig", "EgressResult", "write_egress", "FileBackedBulkEndpoint"]


@dataclass
class EgressConfig:
    batch_size: int = 200          # records per request
    max_in_flight: int = 4         # outstanding async requests per task
    rate_per_sec: float | None = None  # record tokens per second per task
    max_retries: int = 3
    backoff_sec: float = 0.05
    backoff_factor: float = 2.0


@dataclass
class EgressResult:
    records_sent: int
    batches_sent: int
    retries: int


def write_egress(
    df: DataFrame,
    transport: Callable[[list[dict]], Any],
    config: EgressConfig | None = None,
) -> EgressResult:
    """Send every row of ``df`` through ``transport`` in batches.

    ``transport(batch)`` receives a list of row dicts; returning acks
    the batch, raising nacks it (the writer retries up to
    ``max_retries`` with exponential backoff, then fails the task —
    Spark's task retry then replays the partition, which is the same
    at-least-once contract the reference's RetryWriter + async writers
    compose to). The callable must be picklable (ships to executors).
    """
    # the partition closure imports package modules (TokenBucket) on the
    # executor — ship the package zip so workers resolve the import
    # regardless of the driver's cwd (the rest_api/mock_kafka deployment)
    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(df.sparkSession)
    cfg = config or EgressConfig()
    batch_size = int(cfg.batch_size)
    max_in_flight = max(1, int(cfg.max_in_flight))
    rate = cfg.rate_per_sec
    max_retries = int(cfg.max_retries)
    backoff = float(cfg.backoff_sec)
    factor = float(cfg.backoff_factor)

    def _send_partition(rows):
        from incubator_gobblin_spark.operators.throttle import TokenBucket

        bucket = (
            TokenBucket(rate_per_sec=rate, burst=max(rate, batch_size))
            if rate
            else None
        )

        def _send(batch: list[dict]) -> int:
            """Send one batch with bounded retries; returns retry count."""
            attempt = 0
            while True:
                try:
                    transport(batch)
                    return attempt
                except Exception:
                    attempt += 1
                    if attempt > max_retries:
                        raise
                    time.sleep(backoff * (factor ** (attempt - 1)))

        n_records = n_batches = n_retries = 0
        pending: set = set()
        with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
            batch: list[dict] = []
            for row in rows:
                batch.append(row.asDict(recursive=True))
                if len(batch) >= batch_size:
                    if bucket is not None:
                        bucket.acquire(len(batch))
                    if len(pending) >= max_in_flight:
                        done, pending = wait(pending, return_when=FIRST_COMPLETED)
                        for f in done:
                            n_retries += f.result()  # re-raises on failure
                    pending.add(pool.submit(_send, batch))
                    n_records += len(batch)
                    n_batches += 1
                    batch = []
            if batch:
                if bucket is not None:
                    bucket.acquire(len(batch))
                pending.add(pool.submit(_send, batch))
                n_records += len(batch)
                n_batches += 1
            for f in pending:
                n_retries += f.result()
        yield (n_records, n_batches, n_retries)

    counts = df.rdd.mapPartitions(_send_partition).collect()
    return EgressResult(
        records_sent=sum(c[0] for c in counts),
        batches_sent=sum(c[1] for c in counts),
        retries=sum(c[2] for c in counts),
    )


class FileBackedBulkEndpoint:
    """File-backed bulk-API double (the egress twin of the mock Kafka
    broker): each acked batch lands as one JSON file under ``root``.
    Deterministic failure injection, tracked in marker files so it
    works across executor processes:

    - ``fail_before=n``: the first n attempts of each distinct batch
      raise BEFORE persisting — retries then deliver exactly once (the
      server never saw the failed attempts).
    - ``fail_after_ack=n``: the first n attempts of each distinct batch
      persist and THEN raise (ack lost in transit) — retries deliver
      again, making the at-least-once duplicate visible to tests.
    """

    def __init__(self, root: str, fail_before: int = 0, fail_after_ack: int = 0):
        self.root = root
        self.fail_before = int(fail_before)
        self.fail_after_ack = int(fail_after_ack)

    def _attempt_number(self, digest: str) -> int:
        """Register one attempt for this batch; returns how many
        attempts happened before it (O_EXCL marker files — atomic on
        any POSIX fs, shared across processes)."""
        import os

        marks = os.path.join(self.root, "_attempts")
        os.makedirs(marks, exist_ok=True)
        n = 0
        while True:
            try:
                fd = os.open(
                    os.path.join(marks, f"{digest}.{n}"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return n
            except FileExistsError:
                n += 1

    def __call__(self, batch: list[dict]) -> None:
        import hashlib
        import json
        import os
        import uuid

        payload = json.dumps(batch, sort_keys=True, default=str)
        digest = hashlib.md5(payload.encode()).hexdigest()
        prior = self._attempt_number(digest)
        if prior < self.fail_before:
            raise ConnectionError(f"injected pre-apply failure {prior + 1}")
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"batch-{digest}-{uuid.uuid4().hex}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, path)
        if prior < self.fail_before + self.fail_after_ack:
            raise ConnectionError(f"injected post-apply ack loss {prior + 1}")

    def delivered(self) -> list[dict]:
        """Every record the endpoint applied (duplicates included)."""
        import glob
        import json
        import os

        out: list[dict] = []
        for path in sorted(glob.glob(os.path.join(self.root, "batch-*.json"))):
            with open(path) as fh:
                out.extend(json.load(fh))
        return out
