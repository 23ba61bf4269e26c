"""Sketch / sampling operators for corpus-scale statistics.

At 100 TB, exact distinct counts and exact quantiles are shuffle-heavy
(count-distinct expands rows; exact medians need a global sort), while
their sketched counterparts are single-pass partial aggregations whose
state is O(registers) per group. These operators expose Spark's
built-in sketches (HyperLogLog++ via ``approx_count_distinct``,
Greenwald-Khanna via ``percentile_approx``) together with the error
invariant that makes them oracle-checkable: the sketch estimate is
compared against the exact value computed in the same job, and the
query emits the exact value plus a boolean "within tolerance" flag the
DuckDB oracle reproduces as a constant — any estimator regression
flips the flag and fails the hash gate.

``weighted_sample`` is deterministic priority sampling (Duffield,
Lund & Thorup, "Priority sampling for estimation of arbitrary subset
sums", JACM 2007): each row draws priority ``w / u`` with ``u`` a
uniform hash of its key, and the global top-k priorities form the
sample. Because ``u`` derives from md5 of the key — not a seeded RNG —
the sample is a pure function of the data: identical across engines,
partitionings, and re-runs, the same property the stratified sampler
(`corpus.sample_stratified`) and split assigner (`corpus.assign_split`)
rely on. Every arithmetic step (integer-valued double, multiply,
divide) is IEEE-754 correctly rounded, so priorities are bit-identical
in any engine and the selected set is reproducible in ANSI SQL.

Reference parity: Gobblin samples rows only uniformly
(``RowLevelPolicy`` sampling and ``sample_mod`` style converters,
gobblin-core/.../converter/filter/*); weighted and sketched variants
are part of the training-data-pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "priority_key",
    "weighted_sample",
    "approx_distinct_report",
    "approx_quantile_check",
]

_HEX32 = 4294967296.0  # 2^32 as an exact double


def priority_key(key_col: str, weight_col: str) -> Column:
    """Priority ``w / u`` with ``u = (v + 1) / 2^32`` and ``v`` the
    first 8 md5-hex chars of the key as an integer — i.e.
    ``w * 2^32 / (v + 1)``. ``v`` is an exact integer below 2^32, so
    the multiply and divide are single correctly-rounded IEEE ops:
    any engine computes the identical double."""
    v = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
    return (
        F.col(weight_col).cast("double")
        * F.lit(_HEX32)
        / (v.cast("double") + F.lit(1.0))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: the top-k rows by
    priority ``w/u`` (ties broken by key). Inclusion probability is
    proportional-ish to weight (exactly the priority-sampling design,
    whose subset-sum estimator is unbiased); a row with weight 0 or
    NULL is never selected ahead of any positively-weighted row.

    Scale shape: ``orderBy(...).limit(k)`` compiles to TakeOrdered —
    each partition keeps its local top-k and the driver merges
    ``k * partitions`` candidates; no global sort shuffle. The
    priority column is dropped so results carry only input values
    (cross-engine hash-stable)."""
    pri = priority_key(key_col, weight_col)
    # the temp priority column must not shadow (and then silently drop)
    # a caller column of the same name
    pcol = "_pri"
    while pcol in df.columns:
        pcol += "_"
    return (
        df.withColumn(pcol, pri)
        .orderBy(F.desc(pcol), F.col(key_col))
        .limit(k)
        .drop(pcol)
    )


def approx_distinct_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.02,
    tol: float = 0.10,
) -> DataFrame:
    """Per-group HyperLogLog++ distinct count vs the exact count,
    emitted as (group, n_exact, within_tol). ``within_tol`` is 1 iff
    the sketch's relative error is <= ``tol`` (default 5x the
    requested ``rsd`` — a deterministic property of the fixed input,
    not a per-run coin flip: HLL is seedless, so the estimate is a
    pure function of the value set).

    Scale shape: one grouped aggregation; the HLL state is
    O((1.04/rsd)^2) registers per group with map-side partial merge.
    The exact count rides the same shuffle (Spark plans
    count-distinct + other aggs via expand) — at true 100 TB scale
    callers drop ``n_exact`` and keep only the sketch; the exact side
    here is what makes the invariant checkable."""
    agg = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).alias("n_exact"),
        F.approx_count_distinct(value_col, rsd).alias("_n_approx"),
    )
    within = (
        F.abs(F.col("_n_approx") - F.col("n_exact"))
        <= F.col("n_exact") * F.lit(float(tol))
    )
    return agg.select(
        group_col,
        "n_exact",
        within.cast("long").alias("within_tol"),
    )


def approx_quantile_check(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    accuracy: int = 100,
) -> DataFrame:
    """Per-group Greenwald-Khanna approximate quantile, verified by
    rank: the sketch's q-quantile must be an element whose exact rank
    is within ``n/accuracy + 1`` of ``q*n`` (the GK guarantee).
    Emits (group, n, within_tol); the rank itself is recomputed
    exactly with a second pass, so the flag is a hard check on the
    sketch, not a tautology.

    Scale shape: pass 1 is a grouped sketch aggregation (GK state is
    O(accuracy * log n) per group); the per-group quantiles are a
    groups-sized frame, broadcast back for the rank count in pass 2 —
    two shuffles on the same key, no sort, no expansion."""
    quant = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, q, accuracy).alias("_qv")
    )
    joined = df.join(F.broadcast(quant), group_col)
    # n counts NON-NULL values only: percentile_approx and the rank sum
    # both skip NULLs, so counting all rows would inflate the q*n target
    # on null-bearing columns and falsely flip within_tol
    ranked = joined.groupBy(group_col).agg(
        F.count(F.col(value_col)).alias("n"),
        F.sum((F.col(value_col) <= F.col("_qv")).cast("long")).alias("_rank"),
    )
    within = (
        F.abs(F.col("_rank").cast("double") - F.lit(float(q)) * F.col("n"))
        <= F.col("n").cast("double") / F.lit(float(accuracy)) + F.lit(1.0)
    )
    return ranked.select(
        group_col,
        "n",
        within.cast("long").alias("within_tol"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): frequency estimation
# and heavy hitters in O(depth * width) state, independent of corpus
# size. Spark ships a CountMinSketch aggregate, but its binary blob
# can't be point-queried from SQL — so the sketch is built openly as a
# (depth x width) count table with md5-derived bucket hashes, which
# makes every cell and every point estimate a pure integer function of
# the data that ANSI SQL reproduces bit-for-bit (same determinism idiom
# as the minhash md5 mode and priority sampling above).
# ---------------------------------------------------------------------------


def _cms_bucket(item: Column, row: int, width: int) -> Column:
    """Hash row ``row``'s bucket for ``item``: first 8 md5-hex chars of
    ``"{row}:{item}"`` as an unsigned int, mod width. 32-bit values
    never overflow BIGINT arithmetic (ANSI-safe)."""
    hx = F.substring(F.md5(F.concat(F.lit(f"{row}:"), item)), 1, 8)
    return (F.conv(hx, 16, 10).cast("long") % width).alias(f"_b{row}")


def cms_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``item_col`` occurrences: one row
    per non-empty (hash_row, bucket) cell with its collision-summed
    count — at most ``depth * width`` rows regardless of input size.
    With ``weight_col``, each row contributes that many occurrences
    (the pre-aggregated (item, count) form — bit-identical cells to
    feeding the raw occurrences).

    NULL items are excluded explicitly (a NULL carries no identity to
    count; without the filter it would vanish SILENTLY — its md5 bucket
    is NULL and every probe join drops it — so the exclusion is made
    loud and contractual here instead).

    Scale shape: a single groupBy shuffle whose key space is bounded by
    the sketch dimensions, so the map-side partial aggregation collapses
    every partition to <= depth*width rows before the exchange; the
    sketch itself is always broadcast-sized by construction."""
    df = df.filter(F.col(item_col).isNotNull())
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        w.cast("long").alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("hash_row"),
                        _cms_bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c"),
    )
    return cells.groupBy(
        F.col("_c.hash_row").alias("hash_row"), F.col("_c.bucket").alias("bucket")
    ).agg(F.sum("_w").alias("cell_count"))


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-``k`` items by count-min point estimate, with the exact count
    alongside: (item, est, exact). The CMS guarantee ``est >= exact``
    holds for every row by construction (each cell sums the item's own
    occurrences plus non-negative collisions), so the gap column is a
    direct read on collision error at the chosen (depth, width).

    Scale shape: the distinct-item frame is one map-side-combined count
    shuffle, and the sketch builds FROM it in weighted form
    (:func:`cms_sketch` with ``weight_col`` — bit-identical cells, but
    the depth-way expansion runs over |distinct items| instead of
    |occurrences|); point estimates come from a broadcast hash join of
    the <= depth*width-cell sketch (never a shuffle of the item frame);
    the final top-k is TakeOrdered (per-partition heaps, no global
    sort). Ties broken by item for cross-engine determinism. NULL items
    are excluded (same contract as :func:`cms_sketch`)."""
    exact = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("exact"))
        # computed ONCE: this frame feeds both the sketch build and the
        # probe side, and Spark shares no subplans across branches — the
        # token-count shuffle (a full corpus explode upstream) would
        # otherwise run twice. Lazy checkpoint: first use computes the
        # |distinct items| rows, the other branch reads the blocks.
        .localCheckpoint(eager=False)
    )
    sketch = cms_sketch(
        exact, "item", depth=depth, width=width, weight_col="exact"
    )
    probes = exact.select(
        "item",
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("hash_row"),
                        _cms_bucket(F.col("item"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_p"),
    ).select(
        "item", "exact", F.col("_p.hash_row").alias("hash_row"),
        F.col("_p.bucket").alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["hash_row", "bucket"])
        .groupBy("item", "exact")
        .agg(F.min("cell_count").alias("est"))
    )
    return (
        est.orderBy(F.col("est").desc(), F.col("item").asc())
        .limit(k)
        .select("item", "est", F.col("exact").cast("long").alias("exact"))
    )
