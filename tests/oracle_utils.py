"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, sort columns by name and
rows by value, and diff. Used by tests so mismatches surface before the
driver's correctness gate."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    actual = normalize(spark_df.toPandas())
    expected = normalize(con.sql(sql).df())
    if list(actual.columns) != list(expected.columns):
        return False, f"columns differ: spark={list(actual.columns)} oracle={list(expected.columns)}"
    if len(actual) != len(expected):
        return False, f"row count differs: spark={len(actual)} oracle={len(expected)}"
    # dtype KIND must agree (int vs float): DuckDB silently widens e.g.
    # windowed sum(BIGINT) to HUGEINT, which pandas renders float64 —
    # value-identical under check_dtype=False here, but a value HASH of
    # 12.0 vs 12 diverges (the exact q84 driver failure). Width
    # differences (int32/int64) stay tolerated.
    for c in actual.columns:
        ka = actual[c].dtype.kind
        ke = expected[c].dtype.kind
        if {ka, ke} == {"i", "f"} or {ka, ke} == {"u", "f"}:
            return False, (
                f"dtype kind differs on {c!r}: spark={actual[c].dtype} "
                f"oracle={expected[c].dtype} — add explicit CASTs; a "
                f"value-hash gate distinguishes 12 from 12.0"
            )
    try:
        pd.testing.assert_frame_equal(
            actual, expected, check_dtype=False, check_exact=True
        )
    except AssertionError as e:
        return False, str(e)[:2000]
    return True, "ok"
