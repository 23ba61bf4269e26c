"""Join operators.

The reference has no general join operator; joins appear in exactly three
places (SURVEY.md §2.5), each mapped here. The engine additionally exposes
the full Spark join matrix natively — Catalyst picks broadcast /
sort-merge / shuffled-hash, AQE re-plans at runtime.

Scale notes baked into the helpers:
- purge and enrichment joins broadcast the small side explicitly — the
  compliance-id set and dimension tables are tiny relative to the fact
  table, and a broadcast join removes the fact-side shuffle entirely
  (at 100 TB the shuffle IS the job);
- ``join_skew_salted`` provides explicit key-salting for the rare case
  AQE's skew splitting isn't enough (a single hot key joining a
  non-broadcastable right side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_anti_join(
    data: DataFrame, ids: DataFrame, on: Sequence[str] | str
) -> DataFrame:
    """GDPR purge: keep rows whose key does NOT appear in ``ids``.

    Mirrors HivePurgerQueryTemplate (gobblin-modules/gobblin-compliance
    .../purger/HivePurgerQueryTemplate.java:82-89): ``LEFT JOIN ids b ON
    key WHERE b.key IS NULL`` with a ``/*+MAPJOIN(b)*/`` hint — i.e. a
    broadcast left-anti join. The write-back side (dynamic partition
    overwrite) lives in jobs/purge.py.
    """
    return data.join(F.broadcast(ids), on=on, how="left_anti")


def enrich_broadcast(
    data: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "left"
) -> DataFrame:
    """Per-record lookup/enrichment join against a small dimension.

    Mirrors HttpJoinConverter (gobblin-modules/gobblin-http
    .../converter/HttpJoinConverter.java:57,:94-120): each record is
    enriched with fields looked up from an external service. Spark-first:
    resolve the dimension to a DataFrame once and broadcast-join, instead
    of one RPC per record.
    """
    return data.join(F.broadcast(dim), on=on, how=how)


def join_skew_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for skewed left keys.

    The left side gets a random salt in [0, salt_buckets); the right side
    is exploded ×salt_buckets so every (key, salt) pair finds its match.
    Use only when the right side is too big to broadcast AND one key
    dominates; otherwise rely on AQE skew-join splitting.
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, on=[on, "_salt"], how=how)
    return out.drop("_salt")
