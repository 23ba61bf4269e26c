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
