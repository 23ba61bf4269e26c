"""Property-based tests (hypothesis) for the pure planning logic.

These cover the invariants that example-based tests under-sample:
partition tiling over arbitrary ranges, offset planning over arbitrary
broker states, schema round-trips over generated nested types. No
SparkSession needed — everything here is driver-side plan math.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_gobblin_spark.operators.watermark import (
    WatermarkInterval,
    WatermarkType,
)
from incubator_gobblin_spark.schema import from_struct_type, to_struct_type
from incubator_gobblin_spark.sources import jdbc as J
from incubator_gobblin_spark.sources import kafka_batch as K


# ------------------------------------------------ integer partition tiling


@given(
    lo=st.integers(min_value=-(10**12), max_value=10**12),
    span=st.integers(min_value=1, max_value=10**12),
    n=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_partition_predicates_tile_exactly(lo, span, n):
    """The generated predicates partition (lo, hi]: bounds are strictly
    increasing, consecutive, start at lo, end at hi — no gap, no overlap,
    for ANY integer range and partition count."""
    hi = lo + span
    interval = WatermarkInterval("c", lo, hi)
    parts = J.partition_predicates(interval, n, WatermarkType.SIMPLE)
    assert 1 <= len(parts) <= n
    bounds = []
    for p in parts:
        frags = p.split(" AND ")
        bounds.append((int(frags[0].split("> ")[1]), int(frags[1].split("<= ")[1])))
    assert bounds[0][0] == lo
    assert bounds[-1][1] == hi
    for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
        assert a_hi == b_lo  # consecutive: high of one is low of next
    assert all(b_lo < b_hi for b_lo, b_hi in bounds)  # no empty splits


# ------------------------------------------------------ kafka offset plans


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=31),
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=0, max_value=10**9),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=16,
    ),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_kafka_offset_planning_invariants(partitions, first_run):
    earliest = {p: lo for p, (lo, _) in partitions.items()}
    latest = {p: hi for p, (_, hi) in partitions.items()}
    committed = None if first_run else {p: lo for p, (lo, _) in partitions.items()}
    ranges = K.plan_offsets(earliest, latest, committed, "t")
    assert len(ranges) == len(partitions)
    for r in ranges:
        # never read outside the retained window; never negative spans
        assert earliest[r.partition] <= r.start <= r.end == latest[r.partition]
    # advancing the watermark and replanning yields empty ranges (no
    # double-read): consecutive runs tile the log
    nxt = K.next_committed(ranges)
    ranges2 = K.plan_offsets(earliest, latest, nxt, "t")
    assert all(r.start == r.end for r in ranges2)


@given(
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=100, deadline=None)
def test_kafka_stale_offsets_policies(earliest, committed):
    latest = earliest + 10
    e, l_, c = {0: earliest}, {0: latest}, {0: committed}
    if earliest <= committed <= latest:
        r = K.plan_offsets(e, l_, c, "t")[0]
        assert (r.start, r.end) == (committed, latest)
    else:
        import pytest

        with pytest.raises(ValueError):
            K.plan_offsets(e, l_, c, "t", K.OffsetResetPolicy.FAIL)
        r = K.plan_offsets(e, l_, c, "t", K.OffsetResetPolicy.EARLIEST)[0]
        assert r.start == earliest
        r = K.plan_offsets(e, l_, c, "t", K.OffsetResetPolicy.LATEST)[0]
        assert r.start == latest


# ------------------------------------------------------- schema roundtrip

_scalar = st.sampled_from(["string", "int", "long", "float", "double", "boolean", "bytes", "date", "timestamp"])

_dtype = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.builds(lambda i: {"type": "array", "items": i}, children),
        st.builds(lambda v: {"type": "map", "values": v}, children),
        st.builds(
            lambda fields: {
                "type": "record",
                "fields": [
                    {"columnName": f"f{i}", "dataType": {"type": t}}
                    for i, t in enumerate(fields)
                ],
            },
            st.lists(children, min_size=1, max_size=3),
        ),
    ),
    max_leaves=6,
)

_schema = st.lists(
    st.tuples(st.integers(), _dtype).map(
        lambda t: {"columnName": f"c{abs(t[0]) % 1000}", "dataType": {"type": t[1]}}
    ),
    min_size=1,
    max_size=5,
    unique_by=lambda e: e["columnName"],
)


@given(_schema)
@settings(max_examples=150, deadline=None)
def test_schema_roundtrip_fixpoint(json_schema):
    """to_struct_type . from_struct_type is a fixpoint: converting a
    generated JSON-intermediate schema to StructType, back to JSON, and
    to StructType again yields the identical StructType."""
    st1 = to_struct_type(json_schema)
    st2 = to_struct_type(from_struct_type(st1))
    assert st1 == st2


# ------------------------------------------------ REST workunit tiling


@given(
    lo=st.integers(min_value=-(10**9), max_value=10**9),
    span=st.integers(min_value=1, max_value=10**9),
    n=st.integers(min_value=1, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_rest_split_units_tile_exactly(lo, span, n):
    """_split_units partitions an integer watermark range into
    consecutive half-open (lo, hi] chunks: strictly increasing,
    gap-free, covering exactly (lo, hi] — the same tiling contract as
    partition_predicates, for the REST workunit planner."""
    from incubator_gobblin_spark.sources.rest_api import _split_units

    hi = lo + span
    units = _split_units(WatermarkInterval("ts", lo, hi), n)
    assert 1 <= len(units) <= n
    prev = lo
    for u_lo, u_hi in units:
        assert int(u_lo) == prev
        assert int(u_hi) > int(u_lo)
        prev = int(u_hi)
    assert prev == hi


@given(
    start=st.datetimes(
        min_value=__import__("datetime").datetime(1990, 1, 1),
        max_value=__import__("datetime").datetime(2100, 1, 1),
    ),
    span_sec=st.integers(min_value=1, max_value=10**9),
    n=st.integers(min_value=1, max_value=32),
)
@settings(max_examples=200, deadline=None)
def test_rest_split_units_timestamps_tile(start, span_sec, n):
    from datetime import timedelta

    from incubator_gobblin_spark.sources.rest_api import _split_units

    hi = start + timedelta(seconds=span_sec)
    units = _split_units(WatermarkInterval("ts", start, hi), n)
    assert 1 <= len(units) <= n
    prev = start.isoformat()
    for u_lo, u_hi in units:
        assert u_lo == prev
        assert u_hi > u_lo
        prev = u_hi
    assert prev == hi.isoformat()


# -------------------------------------------- md5 hash-mode primitives


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_md5_shingle_hash_oracle_formula_agrees(s):
    """The engine's md5-mode base hash (conv of the first 15 md5 hex
    chars, mod p) and the oracle's list_reduce hex fold are the SAME
    function — proven here in pure Python for arbitrary unicode
    shingles (the cross-engine contract the q31 oracle rides on)."""
    import hashlib

    from incubator_gobblin_spark.functions.dedup_fuzzy import _MERSENNE_P

    hx = hashlib.md5(s.encode("utf-8")).hexdigest()[:15]
    spark_side = int(hx, 16) % _MERSENNE_P  # conv(substring(md5,1,15),16,10) % p
    duck_side = 0
    for d in hx:
        duck_side = duck_side * 16 + "0123456789abcdef".index(d)
    assert spark_side == duck_side % _MERSENNE_P


@given(st.lists(st.integers(min_value=0, max_value=(1 << 31) - 2), min_size=0, max_size=50))
@settings(max_examples=200, deadline=None)
def test_simhash_split_halves_reconstruct(votes_bits):
    """The md5-mode (hi, lo) split signature is a bijection of the
    64-bit signature: reconstructing hi*2^32 + lo from per-bit votes
    equals building the 64-bit int directly."""
    votes = [(1 if (i < len(votes_bits) and votes_bits[i] % 2) else -1) for i in range(64)]
    hi = sum((1 << (i - 32)) for i in range(32, 64) if votes[i] > 0)
    lo = sum((1 << i) for i in range(32) if votes[i] > 0)
    direct = sum((1 << i) for i in range(64) if votes[i] > 0)
    assert hi * (1 << 32) + lo == direct
    assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=2, max_value=16),
)
def test_cms_never_underestimates_property(items, width):
    """CMS one-sided error: est >= exact for every item, any width."""
    from incubator_gobblin_spark.functions import sketches
    from incubator_gobblin_spark.session import get_spark

    spark = get_spark(app_name="props", master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame([(i,) for i in items], "item string")
    pdf = sketches.cms_heavy_hitters(
        df, "item", k=len(items), depth=3, width=width
    ).toPandas()
    assert (pdf["est"] >= pdf["exact"]).all()
    assert int(pdf["exact"].sum()) == len(items)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # user
            st.integers(min_value=0, max_value=1000),   # ts offset sec
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_counts_monotone_property(rows):
    """Down any ordered funnel, per-step user counts never increase."""
    import datetime as dt

    from incubator_gobblin_spark.functions import events as events_fn
    from incubator_gobblin_spark.session import get_spark

    spark = get_spark(app_name="props", master="local[2]", shuffle_partitions=2)
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, 0.0, "")
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = (
        events_fn.funnel(df, ["view", "click", "purchase"], within_seconds=600)
        .toPandas()
        .sort_values("step_idx")
    )
    ns = list(out["n_users"])
    assert all(a >= b for a, b in zip(ns, ns[1:]))
