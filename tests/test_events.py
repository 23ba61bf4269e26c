"""Event-analytics operators (funnel, cohort retention): semantics the
oracle parity suite proves value-for-value at sf0.01; these tests pin
the behavioral contract on hand-built event sets where the expected
funnel/matrix is known by construction."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from incubator_gobblin_spark.functions import events as events_fn


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, 0.0, "")
         for i, (s, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_strict_order_and_window(spark):
    rows = [
        # u1 completes all three in order
        (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
        # u2 clicks BEFORE viewing -> stops at view
        (50, 2, "click"), (60, 2, "view"),
        # u3 views and clicks, purchase outside the window
        (0, 3, "view"), (5, 3, "click"), (99999, 3, "purchase"),
        # u4 never views -> not even step 1
        (0, 4, "purchase"),
    ]
    out = events_fn.funnel(
        _ev(spark, rows), ["view", "click", "purchase"], within_seconds=100
    ).toPandas().set_index("step_idx")
    assert out.loc[1, "n_users"] == 3  # u1, u2, u3
    assert out.loc[2, "n_users"] == 2  # u1, u3 (u2's click precedes its view)
    assert out.loc[3, "n_users"] == 1  # u1 only
    assert list(out["step"]) == ["view", "click", "purchase"]


def test_funnel_first_match_semantics(spark):
    """Step k anchors on the FIRST qualifying event: a later click must
    not re-open the purchase window."""
    rows = [
        (0, 1, "view"), (10, 1, "click"), (500, 1, "click"),
        (550, 1, "purchase"),  # within 100s of the SECOND click only
    ]
    out = events_fn.funnel(
        _ev(spark, rows), ["view", "click", "purchase"], within_seconds=100
    ).toPandas().set_index("step_idx")
    assert out.loc[2, "n_users"] == 1
    assert out.loc[3, "n_users"] == 0


def test_funnel_unwindowed(spark):
    rows = [(0, 1, "view"), (10 ** 7, 1, "click")]
    out = events_fn.funnel(
        _ev(spark, rows), ["view", "click"]
    ).toPandas().set_index("step_idx")
    assert out.loc[2, "n_users"] == 1


def test_funnel_rejects_single_step(spark):
    with pytest.raises(ValueError):
        events_fn.funnel(_ev(spark, [(0, 1, "view")]), ["view"])


def test_cohort_retention_matrix(spark):
    day = 86400
    rows = [
        # u1 first on day 0, active days 0, 1, 3
        (0, 1, "view"), (day + 5, 1, "click"), (3 * day, 1, "view"),
        # u2 first on day 1, active days 1, 3 -> offsets 0 and 2
        (day, 2, "view"), (3 * day + 9, 2, "error"),
        # duplicate same-day activity counts once
        (day + 10, 2, "view"),
    ]
    out = events_fn.cohort_retention(_ev(spark, rows)).toPandas()
    m = {
        (str(r.cohort_day), int(r.bucket_offset)): int(r.n_users)
        for r in out.itertuples()
    }
    assert m == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_cohort_retention_week_buckets(spark):
    day = 86400
    rows = [(0, 1, "view"), (8 * day, 1, "view"), (13 * day, 1, "view")]
    out = events_fn.cohort_retention(_ev(spark, rows), bucket_days=7).toPandas()
    offs = sorted(out["bucket_offset"])
    assert offs == [0, 1]  # day 8 and day 13 share week-bucket 1


def test_funnel_shuffles_share_user_key(spark):
    """Plan-shape: the funnel must not introduce any exchange keyed on
    something other than the user column (one partitioning reused)."""
    rows = [(i, i % 5 + 1, "view" if i % 2 else "click") for i in range(50)]
    df = _ev(spark, [(s, u, t) for s, u, t in rows])
    plan = events_fn.funnel(
        df, ["view", "click"], within_seconds=3600
    )._jdf.queryExecution().executedPlan().toString()
    import re

    for part in re.findall(r"hashpartitioning\(([^,)]+)", plan):
        assert part.startswith("user_id"), plan


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_funnel_matches_bruteforce_python(spark, seed):
    """Randomized cross-check: dense random event sets with heavy ties
    and interleavings must produce exactly the reference funnel counts
    (first-match anchoring, strict after, inclusive window)."""
    import random

    rng = random.Random(seed)
    steps = ["view", "click", "purchase"]
    types = steps + ["error"]
    rows = [
        (rng.randint(0, 120), rng.randint(1, 6), rng.choice(types))
        for _ in range(80)
    ]
    window = 30

    def brute():
        by_user = {}
        for s, u, t in rows:
            by_user.setdefault(u, []).append((s, t))
        counts = [0] * len(steps)
        for evs in by_user.values():
            evs.sort()
            anchor, idx = None, 0
            for s, t in evs:
                if idx >= len(steps):
                    break
                if t != steps[idx]:
                    continue
                if idx > 0 and (s <= anchor or s > anchor + window):
                    continue
                anchor = s
                idx += 1
                counts[idx - 1] += 1
        return counts

    df = _ev(spark, rows)
    got = (
        events_fn.funnel(df, steps, within_seconds=window)
        .toPandas()
        .sort_values("step_idx")["n_users"]
        .tolist()
    )
    assert got == brute()


@pytest.mark.parametrize("seed", [5, 23])
def test_cohort_retention_matches_bruteforce_python(spark, seed):
    import datetime as dt
    import random

    rng = random.Random(seed)
    day = 86400
    rows = [
        (rng.randint(0, 20) * day + rng.randint(0, day - 1), rng.randint(1, 8), "view")
        for _ in range(60)
    ]

    def brute():
        first = {}
        for s, u, _ in rows:
            d = s // day
            first[u] = min(first.get(u, d), d)
        out = {}
        seen = set()
        for s, u, _ in rows:
            off = s // day - first[u]
            key = (first[u], off)
            if (u, off) not in seen:
                seen.add((u, off))
                out[key] = out.get(key, 0) + 1
        return out

    got = {
        (
            (r.cohort_day - dt.date(2024, 1, 1)).days,
            int(r.bucket_offset),
        ): int(r.n_users)
        for r in events_fn.cohort_retention(_ev(spark, rows)).toPandas().itertuples()
    }
    assert got == brute()
