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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join: each left row picks the latest right row with
    ``right_ts <= left_ts`` for the same key (backward direction).

    Spark has no built-in as-of join; the naive formulation is an
    inequality join (O(n×m) range explosion) or a per-key subquery. This
    implementation is the union+window pattern: tag both sides, union
    them, sort within each key by (ts, side) — right rows first on ties,
    so an exactly-simultaneous right row IS visible — and carry the last
    non-null right values forward with ``last(ignorenulls)`` over an
    unbounded-preceding frame. ONE shuffle on the join key, linear work,
    no candidate explosion: the pattern that survives 100 TB where a
    range join would not.
    """
    lcols = left.columns
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("_lrow")).schema["_lrow"].dataType
        ).alias("_lrow"),
        # one struct, not per-column carries: every value column must come
        # from the SAME right row
        F.struct(*[F.col(c) for c in value_cols]).alias("_vrow"),
    )
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(tagged_right.schema["_vrow"].dataType).alias("_vrow"),
    )
    from pyspark.sql.window import Window

    # right rows sort before left rows at equal ts (>= semantics); among
    # simultaneous right rows the value struct itself is the final
    # tiebreak, keeping the carried row deterministic
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_vrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_left.unionByName(tagged_right).select(
        "_side",
        "_lrow",
        F.last(F.col("_vrow"), ignorenulls=True).over(w).alias("_vrow"),
    )
    out = merged.filter(F.col("_side") == 1)
    if how == "inner":
        # match on the carried struct itself being non-null: a matched
        # right row may legitimately carry NULL in every value column,
        # but the struct it was packed into is never null
        out = out.filter(F.col("_vrow").isNotNull())
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_vrow.{c}").alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    lo: str,
    hi: str,
    on: Sequence[str] = (),
    bucket: str = "1 hour",
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Interval join: left rows whose ``left_ts`` falls in a right-side
    ``[lo, hi]`` interval (plus optional equi-keys ``on``).

    Spark plans the naive formulation as a nested-loop join (every left
    row against every right interval). This implementation buckets time:
    each interval explodes to the buckets it spans, each left row maps to
    its single bucket, and the join becomes an EQUI-join on
    (keys, bucket) + an exact range filter. Each matching pair meets in
    exactly one bucket (the left row's), so no dedup is needed. Intervals
    must be bounded; pick ``bucket`` near the typical interval length —
    wider buckets mean more false candidates filtered after the join,
    narrower ones replicate each interval across more buckets.

    ``max_span_buckets`` bounds the per-interval explosion: one corrupt
    interval (hi in year 2286) would otherwise materialize millions of
    bucket rows and kill the stage. An interval spanning more buckets
    than the cap is clamped to its first ``max_span_buckets`` buckets —
    matches beyond the clamp are dropped, which is the deliberate
    bounded-damage trade for a row that is already out of spec.
    """
    # bucket spec '<n> <second|minute|hour|day>[s]' -> seconds per bucket
    qty, unit = bucket.split()
    secs_per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s")
    ] * int(qty)

    def _b(c):
        # floor, not truncate-toward-zero: pre-1970 timestamps are
        # negative and must bucket consistently on both sides
        return F.floor(F.unix_timestamp(c) / secs_per).cast("long")

    tagged_left = left.withColumn("_bucket", _b(F.col(left_ts)))
    lo_b = _b(F.col(lo))
    hi_b = F.least(_b(F.col(hi)), lo_b + F.lit(max_span_buckets - 1))
    tagged_right = right.withColumn("_bucket", F.explode(F.sequence(lo_b, hi_b)))
    joined = tagged_left.join(tagged_right, on=[*on, "_bucket"])
    return joined.filter(
        (F.col(left_ts) >= F.col(lo)) & (F.col(left_ts) <= F.col(hi))
    ).drop("_bucket")


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


def skew_report(
    df: DataFrame, cols: list[str], top: int = 10
) -> DataFrame:
    """Hot-key diagnostic for join/agg planning: the ``top`` most
    frequent key tuples with row count and corpus fraction — the
    numbers that decide between plain shuffle, AQE skew splitting, and
    explicit salting (:func:`join_skew_salted`). Deterministic order:
    count desc, then key columns asc.

    Shape: one map-side-combining groupBy on the key; the total rides a
    broadcast one-row aggregate (no driver collect); top-k goes through
    ``orderBy().limit()`` — Spark's TakeOrderedAndProject, a partial
    per-partition top-k merged once, NOT a single-partition global sort
    of every distinct key — and the rank window touches only the k
    survivors. Run it on the join key BEFORE shipping a 100 TB join —
    a 1% hot key at that scale is a 1 TB partition."""
    from pyspark.sql.window import Window

    order = [F.col("n").desc(), *[F.col(c).asc() for c in cols]]
    counts = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(*order)
        .limit(top)
    )
    total = df.select(F.count(F.lit(1)).alias("_total"))
    w = Window.orderBy(*order)
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            *cols,
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("frac"),
            F.col("_rn").cast("long").alias("rank"),
        )
    )
