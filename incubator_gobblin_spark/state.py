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


def _state_doc(state: TableState) -> str:
    return json.dumps(
        {
            "high_watermark": _to_jsonable(state.high_watermark),
            "last_run_id": state.last_run_id,
            "extra": {k: _to_jsonable(v) for k, v in state.extra.items()},
        },
        sort_keys=True,
    )


def _state_from_doc(doc: str) -> TableState:
    d = json.loads(doc)
    return TableState(
        high_watermark=_from_jsonable(d.get("high_watermark")),
        last_run_id=d.get("last_run_id"),
        extra={k: _from_jsonable(v) for k, v in d.get("extra", {}).items()},
    )


class DbStateStore:
    """Database-backed state store — the MysqlDatasetStateStore analogue
    (gobblin-runtime .../MysqlDatasetStateStore.java over the generic
    gobblin-metastore .../MysqlStateStore.java table) on stdlib sqlite3.

    What a DB adds over the JSON-file store: SERIALIZED CONCURRENT
    COMMITS. Two schedulers (or a retried driver racing its zombie
    predecessor) both finishing a run of the same table must not
    last-write-wins each other's watermark back in time. Every row
    carries a monotonically increasing ``version``; writers either

    - :meth:`commit_cas` against the version they read (optimistic
      concurrency — the reference's conditional upsert), or
    - :meth:`advance_watermark`, which takes the database write lock
      (``BEGIN IMMEDIATE``) and advances only if the new watermark is
      strictly greater — the monotonicity rule that makes incremental
      ingestion safe under at-least-once job scheduling.

    sqlite serializes writers across threads AND processes via file
    locking, so the semantics hold for local concurrent schedulers; on
    a real MySQL/Postgres the same statements run unchanged (the SQL is
    deliberately vanilla). Scale: state rows are O(tables), not O(data)
    — nothing here is on the data path.
    """

    _DDL = (
        "CREATE TABLE IF NOT EXISTS table_state ("
        " tbl TEXT PRIMARY KEY,"
        " doc TEXT NOT NULL,"
        " version INTEGER NOT NULL)"
    )

    def __init__(self, db_path: str):
        self.db_path = db_path
        parent = os.path.dirname(os.path.abspath(db_path))
        os.makedirs(parent, exist_ok=True)
        with self._conn() as con:
            con.execute(self._DDL)

    def _conn(self):
        import sqlite3

        con = sqlite3.connect(self.db_path, timeout=30.0)
        con.isolation_level = None  # explicit transactions only
        return con

    def get(self, table: str) -> TableState:
        return self.get_versioned(table)[0]

    def get_versioned(self, table: str) -> tuple[TableState, int]:
        """State plus its row version (version 0 = absent row): the
        token :meth:`commit_cas` checks against."""
        with self._conn() as con:
            row = con.execute(
                "SELECT doc, version FROM table_state WHERE tbl = ?", (table,)
            ).fetchone()
        if row is None:
            return TableState(), 0
        return _state_from_doc(row[0]), row[1]

    def commit(self, table: str, state: TableState) -> None:
        """Unconditional upsert (single-writer deployments)."""
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            con.execute(
                "INSERT INTO table_state (tbl, doc, version) VALUES (?, ?, 1) "
                "ON CONFLICT(tbl) DO UPDATE SET doc = excluded.doc, "
                "version = table_state.version + 1",
                (table, _state_doc(state)),
            )
            con.execute("COMMIT")

    def commit_cas(self, table: str, state: TableState, expected_version: int) -> bool:
        """Compare-and-swap on the version read via
        :meth:`get_versioned`; False = a concurrent writer won and the
        caller must re-read and re-plan (NOT blindly retry the write —
        its planned watermark range may now overlap the winner's)."""
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if expected_version == 0:
                cur = con.execute(
                    "INSERT INTO table_state (tbl, doc, version) "
                    "VALUES (?, ?, 1) ON CONFLICT(tbl) DO NOTHING",
                    (table, _state_doc(state)),
                )
            else:
                cur = con.execute(
                    "UPDATE table_state SET doc = ?, version = version + 1 "
                    "WHERE tbl = ? AND version = ?",
                    (_state_doc(state), table, expected_version),
                )
            ok = cur.rowcount == 1
            con.execute("COMMIT")
        return ok

    def advance_watermark(self, table: str, new_hwm: Any, run_id: str | None = None) -> bool:
        """Atomically advance the committed high watermark, refusing any
        move that is not strictly forward (the zombie-writer guard).
        Returns whether the advance happened. Extra state is preserved."""
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")  # the write lock: no TOCTOU
            row = con.execute(
                "SELECT doc, version FROM table_state WHERE tbl = ?", (table,)
            ).fetchone()
            state = _state_from_doc(row[0]) if row else TableState()
            cur_hwm = state.high_watermark
            if cur_hwm is not None and not (new_hwm > cur_hwm):
                con.execute("COMMIT")
                return False
            state.high_watermark = new_hwm
            state.last_run_id = run_id
            if row:
                con.execute(
                    "UPDATE table_state SET doc = ?, version = version + 1 "
                    "WHERE tbl = ?",
                    (_state_doc(state), table),
                )
            else:
                con.execute(
                    "INSERT INTO table_state (tbl, doc, version) VALUES (?, ?, 1)",
                    (table, _state_doc(state)),
                )
            con.execute("COMMIT")
        return True
