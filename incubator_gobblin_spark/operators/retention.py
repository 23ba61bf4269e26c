"""Retention / version-selection policies as DataFrame operators.

Reference (gobblin-data-management): version finders list dataset versions
(.../retention/version/finder/DateTimeDatasetVersionFinder.java:37 and
siblings) and policies select which versions to keep or delete:

- NewestKRetentionPolicy (.../retention/policy/NewestKRetentionPolicy.java:39,
  listDeletableVersions:83): order versions newest-first, delete rank > K.
- NewestKSelectionPolicy (.../data/management/policy/NewestKSelectionPolicy.java:42,
  :126): select newest (or oldest) K, or EXCLUDE them.
- TimeBasedRetentionPolicy (.../retention/policy/TimeBasedRetentionPolicy.java:48,
  :92): delete versions older than a duration.
- SelectBetween/Before/AfterTimeBasedPolicy
  (.../policy/SelectBetweenTimeBasedPolicy.java:51): time-range selection.
- CombineRetentionPolicy / CombineSelectionPolicy: union / intersect of
  child policies' selections.

The engine models "a dataset's versions" as a DataFrame with a grouping
key, a version column, and arbitrary payload — so the same operators do
double duty as generic top-k-per-group / time-range query operators.
Ranking uses one shuffle on the dataset key; at scale the per-dataset
version counts are small, so no skew handling is needed beyond AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rank_window(group_by: Sequence[str], version_col: str, newest_first: bool,
                 tie_breakers: Sequence[str]):
    order = [F.col(version_col).desc() if newest_first else F.col(version_col).asc()]
    order += [F.col(c).asc() for c in tie_breakers]
    return Window.partitionBy(*group_by).orderBy(*order)


def newest_k(
    df: DataFrame,
    group_by: Sequence[str],
    version_col: str,
    k: int,
    keep: bool = True,
    newest_first: bool = True,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Top-K versions per dataset.

    ``keep=True`` -> the selected newest K (NewestKSelectionPolicy);
    ``keep=False`` -> the complement, i.e. the deletable set
    (NewestKRetentionPolicy.listDeletableVersions).
    """
    w = _rank_window(group_by, version_col, newest_first, tie_breakers)
    ranked = df.withColumn("_rank", F.row_number().over(w))
    cond = F.col("_rank") <= k if keep else F.col("_rank") > k
    return ranked.filter(cond).drop("_rank")


def older_than(df: DataFrame, ts_col: str, cutoff) -> DataFrame:
    """Versions strictly older than ``cutoff`` — the deletable set of
    TimeBasedRetentionPolicy (:92)."""
    return df.filter(F.col(ts_col) < F.lit(cutoff))


def select_between(df: DataFrame, ts_col: str, lo, hi) -> DataFrame:
    """Versions in ``[lo, hi]`` (SelectBetweenTimeBasedPolicy.java:51).
    ``lo=None`` -> SelectBeforeTimeBasedPolicy, ``hi=None`` -> After."""
    out = df
    if lo is not None:
        out = out.filter(F.col(ts_col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(ts_col) <= F.lit(hi))
    return out


def combine_union(*selections: DataFrame) -> DataFrame:
    """CombineRetentionPolicy UNION mode — distinct union of child
    selections."""
    out = selections[0]
    for s in selections[1:]:
        out = out.unionByName(s)
    return out.distinct()


def combine_intersect(*selections: DataFrame) -> DataFrame:
    """CombineRetentionPolicy INTERSECT mode."""
    out = selections[0]
    for s in selections[1:]:
        out = out.intersect(s)
    return out
