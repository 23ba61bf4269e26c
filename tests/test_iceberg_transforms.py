"""Iceberg partition transforms — spec Appendix B conformance.

The bucket hash is pinned against the spec's PUBLISHED test vectors
(iceberg.apache.org/spec Appendix B "Bucket Transform Details" hash
table) in both the pure-Python reference and the Spark Column form,
then cross-checked property-style on random values; truncate and the
time transforms are pinned against the spec's worked examples. The
Column forms must stay JVM-side (no Python in the plan).
"""

import datetime
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_gobblin_spark.functions.iceberg_transforms import (  # noqa: E402
    bucket_col,
    bucket_py,
    murmur3_32,
    time_transform_col,
    transform_expr,
    truncate_col,
)

# (input bytes, expected signed murmur3) — the spec's published vectors
SPEC_VECTORS = [
    ((34).to_bytes(8, "little"), 2017239379),  # int/long 34
    ((17486).to_bytes(8, "little"), -653330422),  # date 2017-11-16
    ((81068000000).to_bytes(8, "little"), -662762989),  # time 22:31:08
    ((1510871468000000).to_bytes(8, "little"), -2047944441),  # ts micros
    (b"iceberg", 1210000089),  # string
    (bytes([0, 1, 2, 3]), -188683207),  # binary 0x00010203
]


def test_murmur3_python_matches_spec_vectors():
    for data, expected in SPEC_VECTORS:
        assert murmur3_32(data) == expected, data


@pytest.mark.slow  # soak/sweep: run with -m slow, not in the default budget
def test_bucket_columns_match_spec_vectors(spark):
    """The Column forms reproduce the spec hashes: bucket over the
    published values with a modulus chosen so the bucket value exposes
    the full hash (N large power of two would mask; instead compare
    bucket_py which uses the pinned hash)."""
    df = spark.createDataFrame(
        [(34, "iceberg", bytes([0, 1, 2, 3]),
          datetime.date(2017, 11, 16),
          datetime.datetime(2017, 11, 16, 22, 31, 8))],
        "i long, s string, b binary, d date, ts timestamp",
    )
    row = df.select(
        bucket_col(F.col("i"), 97, "long").alias("bi"),
        bucket_col(F.col("s"), 97, "string").alias("bs"),
        bucket_col(F.col("b"), 97, "binary").alias("bb"),
        bucket_col(F.col("d"), 97, "date").alias("bd"),
        bucket_col(F.col("ts"), 97, "timestamp").alias("bts"),
    ).collect()[0]
    assert row.bi == (2017239379 & 0x7FFFFFFF) % 97
    assert row.bs == (1210000089 & 0x7FFFFFFF) % 97
    assert row.bb == ((-188683207) & 0x7FFFFFFF) % 97
    assert row.bd == ((-653330422) & 0x7FFFFFFF) % 97
    assert row.bts == ((-2047944441) & 0x7FFFFFFF) % 97


@pytest.mark.slow  # soak/sweep: run with -m slow, not in the default budget
def test_bucket_column_cross_checks_python_on_random_values(spark):
    """Property cross-check: the JVM expression and the pure-Python
    reference agree on longs spanning the signed range and on strings
    of every tail length (0-3 remainder bytes, multi-block, unicode)."""
    import random

    rng = random.Random(20260815)
    longs = (
        [0, 1, -1, 2**31, -(2**31), 2**62, -(2**62), 34]
        + [rng.randint(-(2**62), 2**62) for _ in range(200)]
    )
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = {
        r.v: r.b
        for r in df.select(
            "v", bucket_col(F.col("v"), 1013, "long").alias("b")
        ).collect()
    }
    for v in longs:
        assert got[v] == bucket_py(v, 1013, "long"), v

    strings = ["", "a", "ab", "abc", "abcd", "abcde", "iceberg",
               "héllo wörld", "züri", "日本語テキスト", "x" * 37]
    strings += ["".join(chr(rng.randint(32, 0x2FA0)) for _ in range(rng.randint(0, 24))) for _ in range(60)]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got_s = {
        r.s: r.b
        for r in sdf.select(
            "s", bucket_col(F.col("s"), 1013, "string").alias("b")
        ).collect()
    }
    for s in strings:
        assert got_s[s] == bucket_py(s, 1013, "string"), repr(s)


def test_bucket_stays_jvm_side(spark):
    """No Python evaluation nodes in the bucket plan — the hash is a
    whole-stage-codegen expression by construction."""
    df = spark.range(10).select(
        bucket_col(F.col("id"), 16, "long").alias("b"),
        bucket_col(F.col("id").cast("string"), 16, "string").alias("bs"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("EvalPython", "MapInPandas", "BatchEvalPython"):
        assert node not in plan


def test_truncate_and_time_transforms_spec_examples(spark):
    """The spec's worked examples: truncate ints floor toward -inf
    (W=10: 1 -> 0, -1 -> -10), strings take W code points; day/month/
    year/hour are epoch offsets."""
    df = spark.createDataFrame(
        [(1, -1, "iceberg", datetime.date(2017, 11, 16),
          datetime.datetime(2017, 11, 16, 22, 31, 8))],
        "a long, b long, s string, d date, ts timestamp",
    )
    row = df.select(
        truncate_col(F.col("a"), 10, "long").alias("ta"),
        truncate_col(F.col("b"), 10, "long").alias("tb"),
        truncate_col(F.col("s"), 3, "string").alias("ts_"),
        time_transform_col("day", F.col("d"), "date").alias("dd"),
        time_transform_col("month", F.col("d"), "date").alias("dm"),
        time_transform_col("year", F.col("d"), "date").alias("dy"),
        time_transform_col("hour", F.col("ts"), "timestamp").alias("th"),
    ).collect()[0]
    assert row.ta == 0
    assert row.tb == -10
    assert row.ts_ == "ice"
    assert row.dd == 17486
    assert row.dm == (2017 - 1970) * 12 + 10
    assert row.dy == 47
    assert row.th == 1510871468000000 // 3_600_000_000


def test_transform_expr_dispatch_and_refusals(spark):
    df = spark.createDataFrame([(5, None)], "v long, nv string")
    row = df.select(
        transform_expr("identity", F.col("v"), "long").alias("i"),
        transform_expr("void", F.col("v"), "long").alias("vd"),
        transform_expr("bucket[4]", F.col("v"), "long").alias("b"),
        transform_expr("truncate[2]", F.col("v"), "long").alias("t"),
        transform_expr("bucket[4]", F.col("nv"), "string").alias("nb"),
    ).collect()[0]
    assert row.i == 5 and row.vd is None and row.t == 4
    assert row.b == bucket_py(5, 4, "long")
    assert row.nb is None  # null in, null out
    with pytest.raises(ValueError, match="unknown Iceberg"):
        transform_expr("zorder[2]", F.col("v"), "long")
    with pytest.raises(ValueError, match="unsupported"):
        transform_expr("bucket[4]", F.col("v"), "decimal(9,2)")
    with pytest.raises(ValueError, match="invalid for date"):
        transform_expr("hour", F.col("v"), "date")


def test_bucket_timestamp_naive_is_timezone_independent():
    """A NAIVE datetime must bucket as UTC regardless of the host's
    local timezone: ``value.timestamp()`` would interpret it in the
    OS zone and shift the driver-side prune value off the spec's —
    epoch_micros does the arithmetic timezone-free. Spec vector:
    2017-11-16T22:31:08 = 1510871468000000 micros."""
    import time

    from incubator_gobblin_spark.functions.iceberg_transforms import (
        epoch_micros,
        transform_py,
    )

    naive = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert epoch_micros(naive) == 1510871468000000
    expected = bucket_py(1510871468000000, 16, "timestamp")
    old_tz = os.environ.get("TZ")
    try:
        os.environ["TZ"] = "America/New_York"
        time.tzset()
        assert transform_py("bucket[16]", naive, "timestamp") == expected
        assert epoch_micros(naive) == 1510871468000000
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()
    # tz-aware inputs still honor their explicit offset
    aware = datetime.datetime(
        2017, 11, 16, 17, 31, 8,
        tzinfo=datetime.timezone(datetime.timedelta(hours=-5)),
    )
    assert epoch_micros(aware) == 1510871468000000


def test_epoch_norm_normalizes_avro_logical_values():
    from incubator_gobblin_spark.functions.iceberg_transforms import (
        epoch_norm,
    )

    assert epoch_norm(datetime.date(2017, 11, 16)) == 17486
    assert (
        epoch_norm(datetime.datetime(2017, 11, 16, 22, 31, 8))
        == 1510871468000000
    )
    assert epoch_norm(42) == 42
    assert epoch_norm("s") == "s"


def test_prune_day_transform_compares_in_epoch_space():
    """ADVICE r9 (high): manifests decoded through Avro logicalType
    carry day-transform partition values as datetime.date while
    transform_py yields epoch-day ints; date != int is vacuously true,
    so a matching file was silently PRUNED. Normalized comparison must
    keep the matching file and still prune the non-matching one."""
    from incubator_gobblin_spark.sources.iceberg_import import prune_files

    fields = [
        {"id": 1, "name": "ts", "required": False, "type": "timestamp"}
    ]
    spec = {
        "spec-id": 0,
        "fields": [
            {
                "source-id": 1,
                "field-id": 1000,
                "name": "ts_day",
                "transform": "day",
            }
        ],
    }
    f_match = {
        "path": "match.parquet",
        "partition": {"ts_day": datetime.date(2020, 1, 2)},
        "spec_id": 0,
    }
    f_other = {
        "path": "other.parquet",
        "partition": {"ts_day": datetime.date(2020, 5, 9)},
        "spec_id": 0,
    }
    kept = prune_files(
        [f_match, f_other],
        [("ts", "=", datetime.datetime(2020, 1, 2, 10, 30))],
        fields,
        [],
        specs_by_id={0: spec},
    )
    assert [f["path"] for f in kept] == ["match.parquet"]
    # order-preserving range on the same date-typed partition values
    kept = prune_files(
        [f_match, f_other],
        [("ts", "<", datetime.datetime(2020, 2, 1))],
        fields,
        [],
        specs_by_id={0: spec},
    )
    assert [f["path"] for f in kept] == ["match.parquet"]
    # epoch-int partition values (foreign manifests without logical
    # decoding) keep working identically
    f_int = dict(f_match, partition={"ts_day": 18263})
    kept = prune_files(
        [f_int, f_other],
        [("ts", "=", datetime.datetime(2020, 1, 2, 10, 30))],
        fields,
        [],
        specs_by_id={0: spec},
    )
    assert [f["path"] for f in kept] == ["match.parquet"]


def test_prune_transform_type_mismatch_is_conservative():
    """A partition value whose type still disagrees with the transform
    result AFTER epoch normalization must never prove a non-match —
    pruning may only ever cost a read it skipped."""
    from incubator_gobblin_spark.sources.iceberg_import import prune_files

    fields = [{"id": 1, "name": "ts", "required": False, "type": "timestamp"}]
    spec = {
        "spec-id": 0,
        "fields": [
            {
                "source-id": 1,
                "field-id": 1000,
                "name": "ts_day",
                "transform": "day",
            }
        ],
    }
    f_weird = {
        "path": "weird.parquet",
        "partition": {"ts_day": "18263"},
        "spec_id": 0,
    }
    kept = prune_files(
        [f_weird],
        [("ts", "=", datetime.datetime(2020, 1, 2))],
        fields,
        [],
        specs_by_id={0: spec},
    )
    assert [f["path"] for f in kept] == ["weird.parquet"]


def test_bucket_and_truncate_extreme_longs_ansi_safe(spark):
    """ADVICE-wave r10: the 16/16-split modular multiplies must stay
    ANSI-overflow-safe at the extremes of the signed-64 range (min
    long has no positive counterpart; its byte pattern exercises every
    high bit), and truncate[W] must floor correctly for negative
    values at the edge. Cross-checked against the pure-Python
    reference under ANSI mode."""
    assert spark.conf.get("spark.sql.ansi.enabled", "true") != "false"
    from incubator_gobblin_spark.functions.iceberg_transforms import (
        transform_py,
        truncate_col,
    )

    edges = [-(2**63), -(2**63) + 1, 2**63 - 1, 2**63 - 2, -1, 0, 1]
    df = spark.createDataFrame([(v,) for v in edges], "v long")
    got = {
        r.v: r.b
        for r in df.select(
            "v", bucket_col(F.col("v"), 4099, "long").alias("b")
        ).collect()
    }
    for v in edges:
        assert got[v] == bucket_py(v, 4099, "long"), v
    # truncate floors toward -inf except at the min-long corner, where
    # the mathematical floor is below the long range and iceberg-java
    # WRAPS in two's complement — both our forms must match that wrap
    tg = {
        r.v: r.t
        for r in df.select(
            "v", truncate_col(F.col("v"), 100, "long").alias("t")
        ).collect()
    }
    for v in edges:
        assert tg[v] == transform_py("truncate[100]", v, "long"), v
        if v >= -(2**63) + 8:  # 100-aligned floor representable
            assert tg[v] <= v and v - tg[v] < 100
    # the wrap corner, pinned to Java's two's-complement value:
    # -2^63 - ((-2^63 mod 100 + 100) mod 100) = -2^63 - 92, wrapped
    assert tg[-(2**63)] == -(2**63) - 92 + 2**64
