"""Pipeline state store — the engine's FsStateStore analogue.

Reference: Gobblin persists per-job state (committed watermarks, offsets)
between runs in a StateStore — Hadoop SequenceFiles per job by default
(gobblin-metastore .../FsStateStore.java:65), alternatively MySQL
(gobblin-runtime .../MysqlDatasetStateStore.java). That state is what
makes incremental ingestion incremental (SURVEY.md §1.4).

Here: one small JSON document per (store, table) on any
fsspec-reachable path — local FS in tests, object storage in
production. Writes are atomic (temp file + rename) mirroring the
reference's create-then-rename (FsStateStore uses the same trick for
HDFS). The document holds the committed high watermark per table plus
arbitrary extra state (e.g. Kafka offsets per partition for batch
offset-range reads). Streaming pipelines do NOT use this store — their
offsets live in the Structured Streaming checkpoint, which already has
exactly-once semantics.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any


def _to_jsonable(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return {"__ts__": v.isoformat()}
    return v


def _from_jsonable(v: Any) -> Any:
    if isinstance(v, dict) and "__ts__" in v:
        s = v["__ts__"]
        try:
            return datetime.fromisoformat(s)
        except ValueError:  # pragma: no cover
            return s
    return v


@dataclass
class TableState:
    """Committed state for one table/dataset (the WorkUnitState COMMITTED
    analogue, gobblin-api .../configuration/WorkUnitState.java:78-84 —
    only COMMITTED state survives into the next run)."""

    high_watermark: Any = None
    last_run_id: str | None = None
    extra: dict[str, Any] = field(default_factory=dict)


class StateStore:
    """JSON-file state store keyed by (store_dir, table)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.state.json")

    def get(self, table: str) -> TableState:
        path = self._path(table)
        if not os.path.exists(path):
            return TableState()
        with open(path) as f:
            doc = json.load(f)
        return TableState(
            high_watermark=_from_jsonable(doc.get("high_watermark")),
            last_run_id=doc.get("last_run_id"),
            extra={k: _from_jsonable(v) for k, v in doc.get("extra", {}).items()},
        )

    def commit(self, table: str, state: TableState) -> None:
        """Atomic write: temp file in the same dir + rename (the
        FsStateStore create-then-rename pattern)."""
        doc = {
            "high_watermark": _to_jsonable(state.high_watermark),
            "last_run_id": state.last_run_id,
            "extra": {k: _to_jsonable(v) for k, v in state.extra.items()},
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f, indent=2, sort_keys=True)
            os.replace(tmp, self._path(table))
        finally:
            if os.path.exists(tmp):  # pragma: no cover
                os.unlink(tmp)
