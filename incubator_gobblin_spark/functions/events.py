"""Event-stream analytics: ordered funnels and cohort retention.

Gobblin's event tables stop at ingest (the reference MODELS events —
gobblin-metrics-libs/gobblin-metrics-base/src/main/avro/
GobblinTrackingEvent.avsc: namespace/name/timestamp/metadata — and
ships them, e.g. gobblin-core-base/.../converter/filter/
GobblinTrackingEventFlattenFilterConverter.java:43); the downstream
questions every event pipeline exists to answer — "how many users
completed the flow?", "how long do cohorts stay active?" — are
aggregations the reference delegates to the warehouse. Here they are first-class DataFrame operators, shaped for
scale: every stage is an equi-join or groupBy on the user key, so all
shuffles share one partitioning (Catalyst reuses the exchange), and no
stage expands rows beyond the per-step event subsets.

Determinism: step boundaries compare exact timestamps (min over a
group is order-independent); retention offsets are integer day
arithmetic on DATE values — no floats anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: one row per step — (step_idx, step,
    n_users) — counting users whose FIRST completion of each step
    happened strictly after their completion of the previous step (and,
    with ``within_seconds``, no later than that many seconds after).

    Semantics: the user's step-1 time is their earliest step-1 event;
    step k's time is their earliest step-k event inside
    ``(t_{k-1}, t_{k-1} + within]``. First-match semantics make the
    funnel a pure function of the event set, independent of row order.

    Scale shape: ONE scan (filtered to the step types, pushed to the
    scan) and ONE shuffle on the user key. Each user's step-typed
    events aggregate to one array of (ts, type) structs, the sequential
    step times fall out of array higher-order functions over it (step
    k's time = min event of type k inside the gate after step k-1 —
    pure per-row JVM expressions), and the k per-step counts come from
    one conditional aggregation unpivoted by ``stack``. The former
    shape — per-step `filter` + join against the step-(k-1) frame, one
    count branch per step union'd at the end — re-executed the whole
    chain once per union branch (Spark shares no subplans), scanning
    the events table O(steps²) times. Per-user arrays are bounded by
    that user's step-typed event count — the same per-key bound the
    sessionizer carries.

    The collected array is min-reduced per step, so element order
    (and therefore row order) cannot affect the result — the funnel
    stays a pure function of the event set."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    per_user = (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.collect_list(
                F.struct(F.col(ts_col).alias("_ts"), F.col(type_col).alias("_ty"))
            ).alias("_ev")
        )
    )
    # step-1 time: earliest step-1 event; step-k time: earliest step-k
    # event strictly after t_{k-1} (and <= t_{k-1} + within, when set).
    # array_min over a filter of the per-user array == the old chain's
    # min-aggregate over the joined, gated rows, user by user. Each
    # step time is BOUND once (text.bind_once) before the next step's
    # gate references it — a chained withColumn would let Catalyst's
    # project collapse inline t_{k-1}'s expression into every reference
    # and blow the tree up 2^k.
    from incubator_gobblin_spark.functions.text import bind_once

    ev = F.col("_ev")

    def _sel(i, prev):
        step = steps[i]

        def _pred(e):
            ok = e["_ty"] == F.lit(step)
            if prev is not None:
                ok = ok & (e["_ts"] > prev)
                if within_seconds is not None:
                    ok = ok & (
                        e["_ts"]
                        <= prev + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
                    )
            return ok

        return F.filter(ev, _pred)

    def _times(i, prev, acc):
        if i == len(steps):
            return F.struct(
                *[a.alias(f"_t{j}") for j, a in enumerate(acc)]
            )
        ti = F.array_min(F.transform(_sel(i, prev), lambda e: e["_ts"]))
        return bind_once(ti, lambda tv: _times(i + 1, tv, acc + [tv]))

    # step 1 counts users with ANY step-1 event (the old chain counted
    # the groupBy row even when every matching ts was null); step k>=2
    # counts non-null t_k — the gate comparison already excludes
    # null-ts events, exactly as the old `ts > _prev` filter did
    timed = per_user.select(
        (F.size(_sel(0, None)) > 0).alias("_h0"),
        _times(0, None, []).alias("_t"),
    )
    one_row = timed.agg(
        F.sum(F.when(F.col("_h0"), 1).otherwise(0)).cast("long").alias("_n0"),
        *[
            F.count(F.col(f"_t._t{i}")).cast("long").alias(f"_n{i}")
            for i in range(1, len(steps))
        ],
    )
    # unpivot the single aggregate row to (step_idx, step, n_users) —
    # stack is one Generate over one row; a union of per-step selects
    # would re-execute the aggregate once per branch
    stack_args = ", ".join(
        "CAST({} AS BIGINT), '{}', coalesce(_n{}, CAST(0 AS BIGINT))".format(
            i + 1, step.replace("'", "''"), i
        )
        for i, step in enumerate(steps)
    )
    return one_row.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_days: int = 1,
) -> DataFrame:
    """Cohort retention matrix: (cohort_day, bucket_offset, n_users) —
    users grouped by the calendar day of their first event, counted
    once per subsequent ``bucket_days``-wide activity bucket they
    appear in. ``bucket_offset`` 0 is the cohort bucket itself; the
    drop-off along increasing offsets is the retention curve.

    Scale shape: ONE scan. Events project to (user, day) pairs that
    dedup with map-side combine BEFORE any wide exchange (the offset
    depends only on the pair, so deduping first is lossless and the
    shuffle carries distinct pairs, not raw events); the cohort day is
    a min window over the user partition of those pairs — replacing
    the former second scan + join-back of the full events table; the
    final matrix is tiny (cohorts x offsets). Integer day arithmetic
    only."""
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col))
    day_pairs = df.select(F.col(user_col), day.alias("_d")).distinct()
    active = day_pairs.select(
        F.col(user_col),
        F.min("_d").over(Window.partitionBy(user_col)).alias("cohort_day"),
        F.col("_d"),
    ).select(
        F.col(user_col),
        "cohort_day",
        (F.datediff(F.col("_d"), F.col("cohort_day")) / bucket_days)
        .cast("long")
        .alias("bucket_offset"),
    )
    if bucket_days > 1:
        # several distinct days can share one bucket; for bucket_days=1
        # the (user, day) -> (user, offset) map is injective and the
        # distinct above already holds
        active = active.distinct()
    return active.groupBy("cohort_day", "bucket_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
