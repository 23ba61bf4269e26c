"""Sketch/sampling operators: determinism, bias, and error invariants.

Cross-engine value parity for q103-q105 is covered by
tests/test_oracle_parity.py; these tests pin the properties the oracle
cannot see — partitioning-independence, weight bias, plan shape, and
that the "within_tol" flags are computed (not constant-folded)."""

import pyspark.sql.functions as F
import pytest

from incubator_gobblin_spark.functions import sketches
from incubator_gobblin_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def test_weighted_sample_partitioning_invariant(docs):
    a = sketches.weighted_sample(docs, "doc_id", "n_chars", k=50)
    b = sketches.weighted_sample(
        docs.repartition(13, "lang"), "doc_id", "n_chars", k=50
    )
    ids = lambda df: sorted(r.doc_id for r in df.collect())  # noqa: E731
    assert ids(a) == ids(b)
    assert len(ids(a)) == 50


def test_weighted_sample_heavy_row_always_selected(docs, spark):
    heavy = spark.createDataFrame(
        [(10_000_000, "xx", 1 << 40)], "doc_id long, lang string, n_chars long"
    )
    out = sketches.weighted_sample(docs.union(heavy), "doc_id", "n_chars", k=10)
    # priority >= w/1.0 = 2^40 * 2^32 / 2^32 = 2^40 >> any doc's
    # n_chars * 2^32 ceiling at u's floor — must be sampled
    assert 10_000_000 in {r.doc_id for r in out.collect()}


def test_weighted_sample_zero_weight_never_beats_positive(spark):
    rows = [(i, 0 if i < 90 else 5) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, w long")
    out = sketches.weighted_sample(df, "k", "w", k=10)
    assert {r.k for r in out.collect()} == set(range(90, 100))


def test_weighted_sample_plan_is_take_ordered(docs):
    plan = sketches.weighted_sample(docs, "doc_id", "n_chars", k=50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no global sort shuffle


def test_approx_distinct_flag_is_live(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rep = sketches.approx_distinct_report(
        orders, "o_orderpriority", "o_custkey", rsd=0.02, tol=0.10
    ).collect()
    assert rep and all(r.within_tol == 1 for r in rep)
    # an absurdly tight tolerance must flip at least one group's flag
    # (otherwise the invariant would be vacuous)
    tight = sketches.approx_distinct_report(
        orders, "o_orderpriority", "o_custkey", rsd=0.3, tol=0.0
    ).collect()
    assert any(r.within_tol == 0 for r in tight)


def test_approx_quantile_rank_bound(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    rep = sketches.approx_quantile_check(
        orders, "o_orderpriority", "o_totalprice", q=0.5, accuracy=100
    ).collect()
    assert rep and all(r.within_tol == 1 for r in rep)
    # the check is exercised across quantiles, not just the median
    for q in (0.1, 0.9):
        rep_q = sketches.approx_quantile_check(
            orders, "o_orderpriority", "o_totalprice", q=q, accuracy=100
        ).collect()
        assert all(r.within_tol == 1 for r in rep_q)


def test_approx_quantile_high_accuracy_converges(spark):
    # at accuracy >= n the GK sketch is exact: the rank bound must
    # hold with the tightest possible tolerance (n/accuracy + 1 ~ 2)
    import random

    rng = random.Random(7)
    rows = [(i, "g", rng.random()) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    row = sketches.approx_quantile_check(
        df, "g", "v", q=0.5, accuracy=10000
    ).collect()[0]
    assert row.n == 5000 and row.within_tol == 1


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_estimate_never_underestimates(spark):
    """The CMS guarantee est >= exact must hold for EVERY item, even at
    a deliberately tiny width where collisions are guaranteed."""
    rows = [(f"tok{i % 37}",) for i in range(500)] + [("heavy",)] * 200
    df = spark.createDataFrame(rows, ["item"])
    out = sketches.cms_heavy_hitters(df, "item", k=100, depth=3, width=4)
    pdf = out.toPandas()
    assert (pdf["est"] >= pdf["exact"]).all()
    assert pdf.iloc[0]["item"] == "heavy" or pdf.iloc[0]["est"] >= 200


def test_cms_exact_at_generous_width(spark):
    """With width >> distinct items every row of every hash function is
    collision-free with high probability at depth 4 — the min over
    depth rows then equals the exact count for all items."""
    rows = [(f"t{i % 10}",) for i in range(300)]
    df = spark.createDataFrame(rows, ["item"])
    pdf = sketches.cms_heavy_hitters(df, "item", k=10, depth=4, width=4096).toPandas()
    assert (pdf["est"] == pdf["exact"]).all()
    assert int(pdf["exact"].sum()) == 300


def test_cms_sketch_bounded_cells(spark):
    """The sketch never exceeds depth*width rows no matter the input."""
    rows = [(f"u{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["item"])
    sk = sketches.cms_sketch(df, "item", depth=4, width=8)
    assert sk.count() <= 4 * 8
    # every occurrence lands in exactly one bucket per hash row
    total = sk.groupBy("hash_row").agg(F.sum("cell_count").alias("s")).toPandas()
    assert set(total["s"]) == {2000}


def test_cms_partitioning_invariant(spark):
    """CMS cells are pure functions of the data — repartitioning the
    input must not move a single estimate."""
    rows = [(f"tok{i % 13}",) for i in range(400)]
    a = spark.createDataFrame(rows, ["item"])
    one = sketches.cms_heavy_hitters(a, "item", k=13, depth=4, width=64).toPandas()
    two = sketches.cms_heavy_hitters(
        a.repartition(7), "item", k=13, depth=4, width=64
    ).toPandas()
    assert one.to_dict("records") == two.to_dict("records")


def test_cms_null_items_excluded_loudly(spark):
    """NULL items are contractually excluded (they would otherwise
    vanish silently through a NULL-bucket join): totals count only
    non-null occurrences and no NULL row appears in the report."""
    rows = [("a",), ("a",), (None,), ("b",), (None,)]
    df = spark.createDataFrame(rows, "item string")
    pdf = sketches.cms_heavy_hitters(df, "item", k=10, depth=3, width=64).toPandas()
    assert pdf["item"].notna().all()
    assert int(pdf["exact"].sum()) == 3
    sk = sketches.cms_sketch(df, "item", depth=3, width=64)
    total = sk.groupBy("hash_row").agg(F.sum("cell_count").alias("s")).toPandas()
    assert set(total["s"]) == {3}
