"""Salesforce SOQL dialect over the generic REST family.

The reference's second-biggest source family is Salesforce
(gobblin-salesforce); the shared machinery — REST paging, token auth,
watermark tiling, PK-chunked workunits, bounded retries — already lives
in ``sources/rest_api.py``. What is Salesforce-SPECIFIC, replicated
here:

- the SOQL query strings the extractor builds
  (``SalesforceExtractor.java`` — data :381-407, high watermark
  :237-271, count :317-350, soft deletes :445-459 via
  ``QueryResultIterator``) with the Salesforce literal formats
  (:97-99 — SOQL date/datetime literals are UNQUOTED) and the
  trailing-LIMIT splice discipline (``getLimitFromInputQuery:413``);
- the ``/queryAll/?q=`` URL encoding (``getSoqlUrl:470``);
- Bulk-API result-id chaining: a bulk job finishes as a list of
  ``batchId:resultId`` pairs fetched one file at a time
  (``parseBatchIdResultIdString:564``, ``ResultChainingIterator``,
  and the PK-chunking variant ``getQueryResultIdsPkChunking:734``).
  Here each (batch, result) pair becomes one Spark task — the
  chaining iterator's sequential walk turned embarrassingly parallel,
  which is the point of re-expressing it on Spark.

SOQL differs from the JDBC dialects just enough that reusing
``sources/jdbc.extract_sql`` would mis-render: no ``SELECT *``
(explicit field lists only), unquoted datetime literals ending in
``.000Z``, ``COUNT()`` not ``COUNT(*)``, and LIMIT is the only
sampling clause."""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any, Sequence
from urllib.parse import quote

from incubator_gobblin_spark.operators.watermark import (
    WatermarkInterval,
    WatermarkType,
)
from incubator_gobblin_spark.sources.jdbc import Predicate, add_predicate

# SalesforceExtractor.java:97-99. SOQL temporal literals are bare
# (quoting them is a SOQL syntax error), which is why the JDBC
# renderer's TIMESTAMP '...' form cannot be reused.
SALESFORCE_TIMESTAMP_FORMAT = "%Y-%m-%dT%H:%M:%S.000Z"
SALESFORCE_DATE_FORMAT = "%Y-%m-%d"
SALESFORCE_HOUR_FORMAT = "%H"

_LIMIT_RE = re.compile(r"\s+limit\s+\d+\s*$", re.IGNORECASE)


def soql_literal(value: Any, wm_type: WatermarkType) -> str:
    """Render a watermark value as a SOQL literal
    (getTimestampPredicateCondition:529 / getDatePredicateCondition:522
    / getHourPredicateCondition:515 — formatted, never quoted)."""
    if value is None:
        raise ValueError("watermark value must not be None")
    if wm_type is WatermarkType.SIMPLE:
        return str(int(value))
    if wm_type is WatermarkType.HOUR:
        if isinstance(value, (datetime,)):
            return value.strftime(SALESFORCE_HOUR_FORMAT)
        return str(int(value))
    if wm_type is WatermarkType.DATE:
        if isinstance(value, (datetime, date)):
            return value.strftime(SALESFORCE_DATE_FORMAT)
        return str(value)
    if isinstance(value, datetime):
        return value.strftime(SALESFORCE_TIMESTAMP_FORMAT)
    return str(value)


def soql_watermark_predicates(
    interval: WatermarkInterval,
    wm_type: WatermarkType = WatermarkType.TIMESTAMP,
) -> list[Predicate]:
    """Low-exclusive / high-inclusive SOQL predicates — the JDBC
    watermark discipline with Salesforce literal rendering."""
    preds = []
    if interval.low is not None:
        preds.append(
            Predicate(interval.column, ">", soql_literal(interval.low, wm_type))
        )
    if interval.high is not None:
        preds.append(
            Predicate(interval.column, "<=", soql_literal(interval.high, wm_type))
        )
    return preds


def split_trailing_limit(query: str) -> tuple[str, str]:
    """(query-without-limit, the trailing ``LIMIT n`` clause or ``""``)
    — getLimitFromInputQuery:413: predicates must be spliced BEFORE a
    user query's trailing LIMIT, then the LIMIT re-appended."""
    m = _LIMIT_RE.search(query)
    if not m:
        return query, ""
    return query[: m.start()], query[m.start() :].strip()


def soql_extract(
    entity: str,
    columns: Sequence[str],
    predicates: Sequence[Predicate] = (),
    limit: int | None = None,
    include_soft_deleted_only: bool = False,
) -> str:
    """The data-pull SOQL (getDataMetadata:381-407): explicit field
    list (SOQL has no ``*``), predicate chain, optional soft-delete
    restriction (``IsDeleted = true`` — the :404 dynamic-API branch),
    trailing LIMIT last."""
    if not columns:
        raise ValueError("SOQL requires an explicit field list (no SELECT *)")
    sql = f"SELECT {', '.join(columns)} FROM {entity}"
    for p in predicates:
        sql = add_predicate(sql, p.sql())
    if include_soft_deleted_only:
        sql = add_predicate(sql, "IsDeleted = true")
    if limit is not None:
        sql = f"{sql} LIMIT {int(limit)}"
    return sql


def soql_high_watermark(
    entity: str,
    watermark_column: str,
    predicates: Sequence[Predicate] = (),
    existing_where: str | None = None,
) -> str:
    """The high-watermark probe (getHighWatermarkMetadata:237-271):
    project only the watermark, carry the user query's existing WHERE,
    add the run predicates plus the ``!= null`` guard, take the newest
    row."""
    sql = f"SELECT {watermark_column} FROM {entity}"
    if existing_where:
        sql = f"{sql} {existing_where.strip()}"
    sql, _ = split_trailing_limit(sql)
    for p in predicates:
        sql = add_predicate(sql, p.sql())
    sql = add_predicate(sql, f"{watermark_column} != null")
    return f"{sql} ORDER BY {watermark_column} desc LIMIT 1"


def soql_count(
    entity: str,
    predicates: Sequence[Predicate] = (),
    existing_where: str | None = None,
    limit: str = "",
) -> str:
    """The row-count probe (getCountMetadata:317-350): ``COUNT()`` —
    SOQL's bare form, not COUNT(*) — the existing WHERE, predicates,
    and the user query's trailing LIMIT re-appended last. Composes with
    :func:`split_trailing_limit` (which returns the clause stripped):
    the separator space is added here, so either form of ``limit`` —
    stripped or not — yields well-formed SOQL."""
    sql = f"SELECT COUNT() FROM {entity}"
    if existing_where:
        sql = f"{sql} {existing_where.strip()}"
    sql, _ = split_trailing_limit(sql)
    for p in predicates:
        sql = add_predicate(sql, p.sql())
    limit = (limit or "").strip()
    return f"{sql} {limit}" if limit else sql


def soql_url(query: str, api_version: str = "42.0") -> str:
    """The REST path for a SOQL query (getSoqlUrl:470 —
    ``/queryAll/?q=<url-encoded>``; queryAll, not query, so soft
    deletes are visible to the IsDeleted predicates)."""
    return f"/services/data/v{api_version}/queryAll/?q={quote(query, safe='')}"


# ---------------------------------------------------------------------------
# Bulk-API result-id chaining
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BulkResultFile:
    """One fetchable result file of a finished bulk job
    (FileIdVO.java: jobId + batchId + resultId)."""

    job_id: str
    batch_id: str
    result_id: str


def parse_batch_result_ids(
    job_id: str, batch_result_pairs: str
) -> list[BulkResultFile]:
    """``"batchId:resultId,batchId:resultId,..."`` → ordered file list
    (parseBatchIdResultIdString:564 — the same wire format the
    reference accepts for fetch-only replays of an existing bulk
    job)."""
    out = []
    for pair in batch_result_pairs.split(","):
        pair = pair.strip()
        if not pair:
            continue
        batch_id, _, result_id = pair.partition(":")
        if not batch_id or not result_id:
            raise ValueError(f"malformed batchId:resultId pair: {pair!r}")
        out.append(BulkResultFile(job_id, batch_id, result_id))
    return out


def read_bulk_results(
    spark,
    endpoint: Any,
    files: list[BulkResultFile],
    schema,
    max_retries: int = 3,
    retry_backoff_sec: float = 0.0,
):
    """Fetch every bulk result file as one DataFrame — the
    ResultChainingIterator turned parallel: one Spark task per
    (batch, result) file instead of a sequential driver-side walk
    (each file is independent by construction; the reference chains
    them only because its extractor is single-threaded).

    ``endpoint.fetch_result(job_id, batch_id, result_id)`` returns the
    file's records as a list of JSON strings (the file-backed double in
    tests; a real deployment implements it with the Bulk-API GET —
    ``/services/async/<ver>/job/<job>/batch/<batch>/result/<result>``).
    Failed fetches retry ``max_retries`` times; a file is only yielded
    once, so retries cannot duplicate records (the RestApiConnector
    retry contract)."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sources.mock_kafka import _ship_package

    _ship_package(spark)
    if not files:
        return (
            spark.createDataFrame([], "json string")
            .select(F.from_json(F.col("json"), schema).alias("r"))
            .select("r.*")
        )
    rows = [(f.job_id, f.batch_id, f.result_id) for f in files]
    unit_df = spark.createDataFrame(
        rows, "job_id string, batch_id string, result_id string"
    ).repartition(len(rows))

    def fetch(batches):
        import time as _time

        import pandas as pd

        for pdf in batches:
            for job_id, batch_id, result_id in pdf.itertuples(index=False):
                attempt = 0
                while True:
                    try:
                        recs = endpoint.fetch_result(job_id, batch_id, result_id)
                        break
                    # OSError covers ConnectionError (the file-backed
                    # double's transient signal) AND urllib's
                    # HTTPError/URLError from the real HTTP endpoint —
                    # a 503 must ride the same bounded retry
                    except OSError:
                        attempt += 1
                        if attempt > max_retries:
                            raise
                        _time.sleep(retry_backoff_sec * attempt)
                if recs:
                    yield pd.DataFrame({"json": list(recs)})

    raw = unit_df.mapInPandas(fetch, "json string")
    return raw.select(
        F.from_json(F.col("json"), schema).alias("r")
    ).select("r.*")


class FileBackedBulkEndpoint:
    """Bulk-API double for jar-free containers (the mock_kafka /
    FileBackedRestEndpoint discipline): result files precomputed per
    (batch, result), optionally failing the first fetch of a chosen
    file to exercise the retry path. Lives in the package (not the test
    module) so executor-side unpickling can import it."""

    def __init__(self, results, fail_once_on=None):
        self.results = results  # (batch_id, result_id) -> [json, ...]
        self.fail_once_on = fail_once_on

    def fetch_result(self, job_id, batch_id, result_id):
        import os
        import tempfile

        key = (batch_id, result_id)
        if self.fail_once_on == key:
            # one-shot failure marker, file-based so the retry (possibly
            # in another task attempt) observes that it already fired
            marker = os.path.join(
                tempfile.gettempdir(), f"soql-fail-{batch_id}-{result_id}"
            )
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise ConnectionError("transient bulk fetch failure")
        return self.results[key]


# ---------------------------------------------------------------------------
# End-to-end SOQL extraction (SalesforceSource -> extractor flow)
# ---------------------------------------------------------------------------


class FileBackedSoqlEndpoint:
    """A /queryAll endpoint double that EXECUTES the builders' SOQL
    (the file-backed-broker discipline): entity rows live in plain
    lists (picklable by value for executor-side closures), each query
    runs on DuckDB after the one SOQL-ism translation — unquoted
    datetime literals become SQL timestamp literals — and results page
    through ``nextRecordsUrl`` tokens exactly like the real API
    (records / totalSize / done / nextRecordsUrl). Cursor state lives
    in the task's own copy of the endpoint, mirroring a session's
    server-side cursor."""

    _TS_LIT = r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?)"

    def __init__(self, tables: dict[str, list[dict]], page_size: int = 200):
        self.tables = {k: [dict(r) for r in v] for k, v in tables.items()}
        self.page_size = int(page_size)
        self._cursors: dict[str, tuple[list[dict], int]] = {}

    def _run(self, soql: str) -> list[dict]:
        import re as _re

        import duckdb

        sql = _re.sub(
            self._TS_LIT, lambda m: f"TIMESTAMP '{m.group(1).rstrip('Z')}'",
            soql,
        )
        con = duckdb.connect()
        for name, rows in self.tables.items():
            cols = sorted({c for r in rows for c in r}) or ["__empty"]
            values = ", ".join(
                "(" + ", ".join(_sql_lit(r.get(c)) for c in cols) + ")"
                for r in rows
            ) or "(NULL)"
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM (VALUES {values}) "
                f"t({', '.join(cols)})"
            )
        out = con.sql(sql)
        names = [d[0] for d in out.description]
        return [dict(zip(names, row)) for row in out.fetchall()]

    def _page(self, rows: list[dict], pos: int) -> dict:
        import uuid as _uuid

        page = rows[pos : pos + self.page_size]
        done = pos + self.page_size >= len(rows)
        resp = {
            "records": page,
            "totalSize": len(rows),
            "done": done,
        }
        if not done:
            token = f"/services/data/query/{_uuid.uuid4().hex}"
            self._cursors[token] = (rows, pos + self.page_size)
            resp["nextRecordsUrl"] = token
        return resp

    def query(self, soql: str) -> dict:
        return self._page(self._run(soql), 0)

    def query_more(self, next_records_url: str) -> dict:
        # cursors stay valid after a read — Salesforce nextRecordsUrl
        # is re-fetchable (15-min server-side retention), and a client
        # retrying a page lost to a network failure depends on that
        rows, pos = self._cursors[next_records_url]
        return self._page(rows, pos)


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def read_soql(
    spark,
    endpoint: Any,
    entity: str,
    columns: Sequence[str],
    schema,
    interval: WatermarkInterval | None = None,
    wm_type: WatermarkType = WatermarkType.TIMESTAMP,
    num_partitions: int = 4,
    include_soft_deleted_only: bool = False,
) -> "DataFrame":
    """SOQL extraction end to end — the SalesforceSource workunit flow
    (``SalesforceSource.java`` getWorkunits -> one extractor per
    watermark partition) on Spark: the watermark interval tiles into
    half-open units (the rest_api tiling), each task builds its unit's
    SOQL with :func:`soql_extract` + :func:`soql_watermark_predicates`
    and pages ``endpoint.query`` / ``query_more`` until ``done`` —
    exactly the real API's nextRecordsUrl loop. Plan shape: one fetch
    task per unit, zero shuffle; everything after from_json is plain
    Catalyst."""
    import json as _json

    from pyspark.sql import functions as F

    from incubator_gobblin_spark.sources.mock_kafka import _ship_package
    from incubator_gobblin_spark.sources.rest_api import _split_units

    _ship_package(spark)
    units = (
        _split_units(interval, num_partitions)
        if interval is not None
        else [(None, None)]
    )
    if not units:
        return (
            spark.createDataFrame([], "json string")
            .select(F.from_json(F.col("json"), schema).alias("r"))
            .select("r.*")
        )
    unit_df = spark.createDataFrame(
        units, "lo string, hi string"
    ).repartition(len(units))
    cols = list(columns)
    wm_col = interval.column if interval is not None else None

    def fetch(batches):
        import pandas as pd

        from incubator_gobblin_spark.sources.jdbc import Predicate

        for pdf in batches:
            for lo, hi in pdf.itertuples(index=False):
                preds = []
                if wm_col is not None and lo is not None:
                    preds.append(
                        Predicate(wm_col, ">", _unit_literal(lo, wm_type))
                    )
                if wm_col is not None and hi is not None:
                    preds.append(
                        Predicate(wm_col, "<=", _unit_literal(hi, wm_type))
                    )
                soql = soql_extract(
                    entity,
                    cols,
                    preds,
                    include_soft_deleted_only=include_soft_deleted_only,
                )
                resp = endpoint.query(soql)
                while True:
                    if resp["records"]:
                        yield pd.DataFrame(
                            {
                                "json": [
                                    _json.dumps(r, default=str)
                                    for r in resp["records"]
                                ]
                            }
                        )
                    if resp.get("done", True):
                        break
                    resp = endpoint.query_more(resp["nextRecordsUrl"])

    raw = unit_df.mapInPandas(fetch, "json string")
    return raw.select(
        F.from_json(F.col("json"), schema).alias("r")
    ).select("r.*")


def _unit_literal(v: str, wm_type: WatermarkType) -> str:
    """A tiled unit bound (ISO/int string from _split_units) rendered
    as the SOQL literal for that watermark type."""
    if wm_type is WatermarkType.SIMPLE:
        return str(int(v))
    try:
        return soql_literal(datetime.fromisoformat(v), wm_type)
    except ValueError:
        return v
