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

# Hypothesis property suites: correctness net, not per-commit gating — the slow
# marker keeps the default run inside the driver verify budget
# (run with -m slow; must stay green before every round)
import pytest

pytestmark = pytest.mark.slow


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


# ---------------------------------------------------------------------------
# Batched-BPE selection: equality with the sequential reference, proven
# over RANDOM corpora (driver-side — the selection rule is pure Python;
# Spark only supplies the pair counts, replicated exactly here)
# ---------------------------------------------------------------------------


def _py_pair_counts(wf):
    from collections import Counter

    c = Counter()
    for syms, f in wf.values():
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += f
    return c


def _py_apply_merge(syms, l, r):
    out = []
    for s in syms:
        if out and out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return tuple(out)


def _py_bpe(words, num_merges, batched):
    """Pure-Python replica of both trainer loops: pair counts +
    greedy-left merge application are shared; batched mode routes
    selection through the ENGINE's _select_exact_batch."""
    from incubator_gobblin_spark.functions.corpus import _select_exact_batch

    wf = {}
    for w in words:
        syms, f = wf.get(w, (tuple(w), 0))
        wf[w] = (syms, f + 1)
    merges = []
    while len(merges) < num_merges:
        c = _py_pair_counts(wf)
        if not c:
            break
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows = [(l, r, n) for (l, r), n in ranked]
        if batched:
            sel = _select_exact_batch(
                rows, truncated=False, quota=num_merges - len(merges)
            )
            if not sel:
                sel = [rows[0][:2]]
        else:
            sel = [rows[0][:2]]
        for l, r in sel:
            merges.append((l, r))
            wf = {w: (_py_apply_merge(s, l, r), f) for w, (s, f) in wf.items()}
    return merges


@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    ),
    num_merges=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_bpe_exact_batch_equals_sequential_property(words, num_merges):
    """For ANY corpus, the batched selection must reproduce the
    sequential merge list exactly — the conflict/dominance/collision
    stopping rules are sufficient conditions, falsified here if any is
    too weak. Tiny alphabet maximizes pair collisions, fused-symbol
    collisions, and count ties (the adversarial regime)."""
    assert _py_bpe(words, num_merges, batched=True) == _py_bpe(
        words, num_merges, batched=False
    )


# ---------------------------------------------------------------------------
# Quartz cron: next_fire_time is the MINIMAL matching instant after t
# ---------------------------------------------------------------------------


@given(
    minute=st.one_of(
        st.just("*"),
        st.integers(0, 59).map(str),
        st.tuples(st.integers(0, 20), st.integers(1, 15)).map(
            lambda t: f"{t[0]}/{t[1]}"
        ),
    ),
    hour=st.one_of(st.just("*"), st.integers(0, 23).map(str)),
    dow=st.one_of(st.just("?"), st.integers(1, 7).map(str)),
    start_min=st.integers(0, 60 * 24 * 14),
)
@settings(max_examples=120, deadline=None)
def test_quartz_next_fire_time_is_minimal_match(minute, hour, dow, start_min):
    """next_fire_time(t) must (a) be strictly after t, (b) match the
    expression, and (c) have NO matching instant between t and it —
    checked by brute-force minute scan (second field pinned to 0 so the
    scan grain equals the match grain)."""
    from datetime import datetime, timedelta

    from incubator_gobblin_spark.jobs.schedule import parse_quartz_cron

    cron = parse_quartz_cron(f"0 {minute} {hour} ? * {dow}")
    after = datetime(2024, 3, 1) + timedelta(minutes=start_min)
    nxt = cron.next_fire_time(after)
    assert nxt > after
    assert cron.matches(nxt)
    probe = (after + timedelta(minutes=1)).replace(second=0, microsecond=0)
    # don't scan further than a week — guard the property's own runtime
    scanned = 0
    while probe < nxt and scanned < 7 * 24 * 60:
        assert not cron.matches(probe), (probe, nxt)
        probe += timedelta(minutes=1)
        scanned += 1


# ---------------------------------------------------------------------------
# Import-path pruning: NEVER drops a file that contains a matching row
# (conservativeness is the entire correctness contract of file skipping)
# ---------------------------------------------------------------------------


_OPS = ["=", "<", "<=", ">", ">="]


def _matches(op, row, val):
    return {
        "=": row == val,
        "<": row < val,
        "<=": row <= val,
        ">": row > val,
        ">=": row >= val,
    }[op]


@given(
    files=st.lists(
        st.lists(st.integers(-50, 50), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    op=st.sampled_from(_OPS),
    val=st.integers(-55, 55),
    with_stats=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_delta_prune_adds_is_conservative(files, op, val, with_stats):
    """For ANY per-file row sets and ANY single filter: every file
    holding at least one matching row SURVIVES prune_adds (files
    without stats always survive)."""
    import json

    from incubator_gobblin_spark.sources.delta_import import prune_adds

    live = {}
    for i, rows in enumerate(files):
        add = {"path": f"f{i}", "partitionValues": {}}
        if with_stats:
            add["stats"] = json.dumps(
                {
                    "numRecords": len(rows),
                    "minValues": {"c": min(rows)},
                    "maxValues": {"c": max(rows)},
                }
            )
        live[f"f{i}"] = add
    kept = prune_adds(live, [("c", op, val)], [])
    for i, rows in enumerate(files):
        if any(_matches(op, r, val) for r in rows):
            assert f"f{i}" in kept, (rows, op, val)


@given(
    files=st.lists(
        st.lists(st.integers(0, 86399), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    op=st.sampled_from(_OPS),
    val=st.integers(-5, 86405),
    lit_sep=st.sampled_from([" ", "T"]),
)
@settings(max_examples=300, deadline=None)
def test_delta_prune_adds_timestamp_separator_is_conservative(
    files, op, val, lit_sep
):
    """Exported Delta stats store TIMESTAMP bounds 'T'-separated while
    the engine's filter convention is the space form; ' ' < 'T'
    lexicographically, so unnormalized comparison would prune a
    same-day file non-conservatively. Property: for ANY same-day
    second-offsets and EITHER literal separator, every file holding a
    matching row survives."""
    import datetime
    import json

    from incubator_gobblin_spark.sources.delta_import import prune_adds

    day = datetime.datetime(2024, 1, 1)

    def iso(secs: int, sep: str) -> str:
        return (day + datetime.timedelta(seconds=secs)).isoformat(sep=sep)

    live = {}
    for i, rows in enumerate(files):
        live[f"f{i}"] = {
            "path": f"f{i}",
            "partitionValues": {},
            # stats as _delta_file_stats writes them: 'T'-separated
            "stats": json.dumps(
                {
                    "numRecords": len(rows),
                    "minValues": {"ts": iso(min(rows), "T")},
                    "maxValues": {"ts": iso(max(rows), "T")},
                }
            ),
        }
    lit = iso(max(0, min(86399, val)), lit_sep)
    kept = prune_adds(live, [("ts", op, lit)], [])
    vnorm = max(0, min(86399, val))
    for i, rows in enumerate(files):
        if any(_matches(op, r, vnorm) for r in rows):
            assert f"f{i}" in kept, (rows, op, lit)


@given(
    files=st.lists(
        st.lists(st.integers(-50, 50), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    op=st.sampled_from(_OPS),
    val=st.integers(-55, 55),
)
@settings(max_examples=300, deadline=None)
def test_iceberg_prune_files_is_conservative(files, op, val):
    """Same contract over the binary Appendix-D bounds encoding."""
    from incubator_gobblin_spark.sinks.iceberg_export import _encode_bound
    from incubator_gobblin_spark.sources.iceberg_import import prune_files

    fields = [{"name": "c", "id": 1, "type": "long"}]
    flist = [
        {
            "path": f"f{i}",
            "partition": {},
            "lower_bounds": {1: _encode_bound(min(rows), "long")},
            "upper_bounds": {1: _encode_bound(max(rows), "long")},
        }
        for i, rows in enumerate(files)
    ]
    kept = {f["path"] for f in prune_files(flist, [("c", op, val)], fields, [])}
    for i, rows in enumerate(files):
        if any(_matches(op, r, val) for r in rows):
            assert f"f{i}" in kept, (rows, op, val)


@given(
    vals=st.sets(
        st.one_of(
            st.integers(0, 200_000),
            st.integers(2**32 - 100, 2**32 + 200_000),
        ),
        max_size=400,
    )
)
@settings(max_examples=200, deadline=None)
def test_roaring64_serialization_round_trips(vals):
    """For ANY 64-bit row-index set (spanning the 32-bit bitmap
    boundary), serialize -> deserialize is the sorted identity — the
    invariant the Delta deletion-vector reader rests on."""
    from incubator_gobblin_spark.formats.deletion_vectors import (
        deserialize_roaring64,
        serialize_roaring64,
    )

    data = serialize_roaring64(vals)
    assert deserialize_roaring64(data) == sorted(vals)


@given(raw=st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
@settings(max_examples=200, deadline=None)
def test_z85_round_trips(raw):
    from incubator_gobblin_spark.formats.deletion_vectors import (
        z85_decode,
        z85_encode,
    )

    assert z85_decode(z85_encode(raw)) == raw


@given(
    vals=st.sets(st.integers(0, 100_000), min_size=1, max_size=200),
    storage=st.sampled_from(["u", "i", "p"]),
)
@settings(max_examples=60, deadline=None)
def test_dv_descriptor_round_trips_every_storage(tmp_path_factory, vals, storage):
    """write_dv_file -> read_dv_positions is the identity for every
    storage form (file framing + CRC + z85 inline padding included)."""
    from incubator_gobblin_spark.formats.deletion_vectors import (
        read_dv_positions,
        write_dv_file,
    )

    root = str(tmp_path_factory.mktemp("dv"))
    d = write_dv_file(root, vals, storage=storage)
    assert read_dv_positions(root, d) == sorted(vals)


@given(
    vals=st.sets(
        st.one_of(
            st.integers(0, 20_000),
            st.integers(60_000, 70_000),
            st.integers(2**32, 2**32 + 9_000),
        ),
        min_size=1,
        max_size=6000,
    )
)
@settings(max_examples=60, deadline=None)
def test_roaring_offset_header_points_at_actual_containers(vals):
    """The serialized offset header must point at each container's
    ACTUAL byte position within its 32-bit bitmap (RoaringFormatSpec).
    Our reader and delta-spark skip the offsets, but readers using the
    offset index (Java ImmutableRoaringBitmap mapped views, CRoaring
    frozen views) would misread DVs whose offsets are wrong — the r8
    serializer counted the descriptive header at 8 bytes/container."""
    import struct

    from incubator_gobblin_spark.formats.deletion_vectors import (
        _COOKIE_NO_RUN,
        MAGIC,
        serialize_roaring64,
    )

    data = serialize_roaring64(vals)
    assert struct.unpack_from("<i", data, 0)[0] == MAGIC
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    for _ in range(n_bitmaps):
        bitmap_start = pos
        (cookie,) = struct.unpack_from("<I", data, pos)
        assert cookie == _COOKIE_NO_RUN
        pos += 4
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        cards = []
        for _i in range(size):
            _k, cm1 = struct.unpack_from("<HH", data, pos)
            pos += 4
            cards.append(cm1 + 1)
        offsets = []
        for _i in range(size):
            (off,) = struct.unpack_from("<I", data, pos)
            pos += 4
            offsets.append(off)
        # offsets are relative to the start of THIS bitmap's cookie
        for card, off in zip(cards, offsets):
            assert off == pos - bitmap_start
            pos += 2 * card if card <= 4096 else 8192
