"""The driver-window rotation invariant (VERDICT r12 ask 5).

The hard correctness gate records only the first 50 registry entries
per round, so `_WINDOW_HEAD` decides which queries re-prove themselves
against the driver's DuckDB oracle. With 155 queries and 50 slots the
sustainable cycle is ~3 rounds, with at most 5 queries per cycle
waiting a 4th round — and ONLY as documented deferrals whose machinery
another in-window query re-proves (`queries._DEFERRALS`). This test
computes every query's actual driver staleness from the committed
CORRECTNESS_r*.json history and fails when a rotation would silently
retire a query from the gate:

- out-of-window at age 3 (last green row 3 rounds before the upcoming
  run) requires a written deferral rationale;
- out-of-window at age 4+ always fails (a deferral lasts ONE round);
- a query with no driver history (newly registered) must be in-window
  or deferred with a rationale;
- deferrals are capped at 5 steady-state (the 155/50 arithmetic) plus
  one per driver-mandated early refresh (`queries._FORCED_REFRESH`:
  an age<=2 query given a window slot because its implementation
  changed after its last driver row), and must not also sit in the
  window.

Had round 12 deferred q39/q40/q41/q46/q86 (last green r09, age 3 at
the r12 run) without recording rationales, this test would have
failed — that is the regression it pins.
"""

import glob
import json
import os
import re

import pytest

from incubator_gobblin_spark.plans import queries as Q

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _history():
    """(latest_round, {query: last_green_round}) from every committed
    CORRECTNESS_r*.json (repo root and bench_history/)."""
    last_green: dict[str, int] = {}
    latest = 0
    paths = glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")) + glob.glob(
        os.path.join(ROOT, "bench_history", "CORRECTNESS_r*.json")
    )
    for f in paths:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        try:
            data = json.load(open(f))
        except (OSError, ValueError):
            continue
        for q, rec in data.items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and rec.get("err") is None
            ):
                last_green[q] = max(last_green.get(q, 0), rnd)
    return latest, last_green


def test_no_query_silently_retires_from_the_gate():
    latest, last_green = _history()
    if latest == 0:
        pytest.skip("no CORRECTNESS_r*.json history yet (round 1)")
    upcoming = latest + 1  # the driver run this _WINDOW_HEAD feeds
    head = set(Q._WINDOW_HEAD)
    deferred = set(Q._DEFERRALS)
    violations = []
    for q in Q._REGISTRY:
        if q in head:
            continue  # gets its driver row this round
        g = last_green.get(q)
        if g is None:
            if q not in deferred:
                violations.append(
                    f"{q}: registered but never driver-green and "
                    "neither in-window nor deferred with a rationale"
                )
            continue
        age = upcoming - g
        if age >= 4:
            violations.append(
                f"{q}: last driver-green r{g:02d}, age {age} at the "
                f"upcoming r{upcoming:02d} run — deferrals last ONE "
                "round; it must be in _WINDOW_HEAD"
            )
        elif age == 3 and q not in deferred:
            violations.append(
                f"{q}: last driver-green r{g:02d}, age 3 — deferring "
                "it past the 3-round cycle requires a _DEFERRALS "
                "rationale naming the in-window queries that cover it"
            )
    assert not violations, "\n".join(violations)


def test_deferrals_are_bounded_documented_and_disjoint():
    # Steady-state cap: 5 (the 155/50 arithmetic). Every deferral past
    # that must be paid for by a driver-mandated EARLY refresh — a
    # window slot spent on a query of age <= 2 whose implementation
    # changed after its last driver row (queries._FORCED_REFRESH).
    # The slot arithmetic is zero-sum, so the cap is 5 + one per
    # forced refresh actually sitting in the window.
    latest, last_green = _history()
    upcoming = latest + 1
    head = set(Q._WINDOW_HEAD)
    forced_in_head = 0
    for q, why in Q._FORCED_REFRESH.items():
        assert q in Q._REGISTRY, f"forced refresh {q} is not registered"
        assert q in head, (
            f"forced refresh {q} must be in _WINDOW_HEAD — it is the "
            "justification for an extra deferral slot"
        )
        assert len(why) > 20, f"forced refresh {q} needs a real rationale"
        g = last_green.get(q)
        if g is not None:
            assert upcoming - g <= 2, (
                f"forced refresh {q} is age {upcoming - g} — it would "
                "be due in-window anyway and cannot pay for a deferral"
            )
        forced_in_head += 1
    cap = 5 + forced_in_head
    assert len(Q._DEFERRALS) <= cap, (
        f"{len(Q._DEFERRALS)} deferrals exceed the cap of {cap} "
        f"(5 steady-state + {forced_in_head} driver-mandated early "
        "refreshes)"
    )
    for q, why in Q._DEFERRALS.items():
        assert q in Q._REGISTRY, f"deferral {q} is not registered"
        assert q not in Q._WINDOW_HEAD, (
            f"{q} is both deferred and in-window"
        )
        assert len(why) > 20, f"deferral {q} needs a real rationale"


def test_r12_style_undocumented_deferral_would_fail():
    """The scenario the verdict cites: pretend the current _DEFERRALS
    entries were NOT documented — the age-3 branch must trip."""
    latest, last_green = _history()
    if latest == 0:
        pytest.skip("no history")
    upcoming = latest + 1
    head = set(Q._WINDOW_HEAD)
    trips = [
        q
        for q in Q._DEFERRALS
        if q not in head
        and last_green.get(q) is not None
        and upcoming - last_green[q] >= 3
    ]
    # every CURRENT deferral sits exactly in the age-3 band the
    # invariant polices — proving the rationale requirement is load-
    # bearing, not decorative
    assert sorted(trips) == sorted(
        Q._DEFERRALS
    ), f"deferrals outside the policed band: {sorted(set(Q._DEFERRALS) - set(trips))}"
