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

    Scale shape: step k is `filter(type = step_k)` — pushed to the scan
    — joined to the (users-sized, one row per user) step k-1 frame on
    the user key, then min-aggregated on the same key. Every exchange
    hashes the same column, every aggregation combines map-side, and
    the frames shrink monotonically down the funnel. No windows, no
    per-user event sorting."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    u, t = F.col(user_col), F.col(ts_col)
    reached = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [reached.agg(F.count(F.lit(1)).alias("n_users"))]
    for step in steps[1:]:
        nxt = df.filter(F.col(type_col) == step).join(
            reached.select(u, F.col("_t").alias("_prev")), user_col
        )
        gate = t > F.col("_prev")
        if within_seconds is not None:
            gate = gate & (
                t <= F.col("_prev") + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        reached = nxt.filter(gate).groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        counts.append(reached.agg(F.count(F.lit(1)).alias("n_users")))
    rows = [
        cnt.select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("n_users").cast("long"),
        )
        for i, (step, cnt) in enumerate(zip(steps, counts))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


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

    Scale shape: the first-seen frame is one min-aggregation on the
    user key; activity buckets come from joining events back to it on
    the same key (exchange reuse) and a distinct on (user, cohort,
    offset) that combines map-side; the final matrix is tiny
    (cohorts x offsets). Integer day arithmetic only."""
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    day = F.to_date(F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = (
        df.select(F.col(user_col), day.alias("_d"))
        .join(first, user_col)
        .select(
            F.col(user_col),
            "cohort_day",
            (F.datediff(F.col("_d"), F.col("cohort_day")) / bucket_days)
            .cast("long")
            .alias("bucket_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "bucket_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
