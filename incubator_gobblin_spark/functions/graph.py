"""Distributed connected components for duplicate-cluster resolution.

Candidate-pair generators (``dedup_fuzzy.minhash_candidate_pairs``,
``simhash_near_dups``, ``similarity.cosine_near_dup_pairs``,
``jaccard_pairs``) emit an *edge list* of near-duplicate pairs; turning
pairs into dedup decisions needs the transitive closure — if A~B and
B~C, all three are one duplicate cluster and exactly one survives.
The reference only ever dedups by exact key equality
(gobblin-compaction/.../mr/avro/AvroKeyDedupReducer.java:31 — grouping
is the MR shuffle on the record key), so cluster resolution is part of
the beyond-reference LLM-pipeline surface.

Scale design:
- Label propagation with **pointer jumping**: each round a vertex takes
  the min label over its neighbours AND follows its current label one
  hop (``comp(v) <- comp(comp(v))``). Path-doubling makes convergence
  O(log d) rounds in the path length d, not O(d) — a 1M-long chain
  resolves in ~20 rounds, the quasi-clique clusters LSH produces in 2–3.
  (Same regime as the alternating small-star/large-star algorithm of
  Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14, with a simpler per-round plan: one join+groupBy for the
  neighbour min, one self-join for the jump.)
- No per-vertex neighbour materialization: the neighbour min is a
  ``groupBy(u).min``, never ``collect_list`` — a celebrity vertex with
  10⁸ neighbours costs a skewed-but-streamable aggregation (AQE splits
  it), not a 10⁸-element array in one row.
- Each round ends with ``localCheckpoint(eager=True)``: iterative
  DataFrame joins otherwise stack lineage until planning time explodes.
  On a real cluster with an unreliable executor pool, swap for
  ``checkpoint()`` against a reliable store — one line, noted here so
  the deployment-time decision is explicit.
- One ``count()`` action per round for convergence detection; rounds
  are O(log d) so the driver round-trips stay trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Resolve the connected components of an undirected edge list.

    Returns one row per vertex that appears in ``edges``:
    ``(id, component)`` where ``component`` is the minimum vertex id in
    the component — a deterministic canonical representative regardless
    of partitioning or iteration order. Vertices with no edges don't
    appear (callers treat absent = singleton).

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge —
    with pointer jumping that needs a path of length ~2^max_iter, so
    hitting it means the input is pathological, not big.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
    )
    adj = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    comp = adj.select(
        F.col("u").alias("id"), F.col("u").alias("comp")
    ).distinct().localCheckpoint(eager=False)

    for _ in range(max_iter):
        # min label over neighbours (one shuffle; map-side partial min)
        nbr_min = (
            adj.join(
                comp.select(
                    F.col("id").alias("v"), F.col("comp").alias("vcomp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nmin"))
            .select(F.col("u").alias("id"), "nmin")
        )
        stepped = comp.join(nbr_min, "id", "left").select(
            "id", F.least("comp", "nmin").alias("comp")
        )
        # pointer jump: follow the label one hop (labels are vertex ids,
        # so the lookup always hits; least() ignores the impossible-null
        # defensively)
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("jump")
                ).alias("b"),
                "comp",
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(F.col("comp"), F.col("b.jump")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(comp.select("id", F.col("comp").alias("prev")), "id")
            .filter(F.col("comp") != F.col("prev"))
            .count()
        )
        comp = jumped
        if changed == 0:
            return comp.select("id", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_by_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_l",
    dst: str = "id_r",
) -> DataFrame:
    """Fuzzy dedup decision: keep one canonical row per duplicate
    cluster (the min id — deterministic), drop the rest, pass rows that
    belong to no pair through untouched.

    Generalizes the reference's exact keep-one-per-key dedup
    (gobblin-compaction/.../AvroKeyDedupReducer.java:31) to the
    transitive closure of a near-duplicate pair list: compose with any
    candidate generator + verifier, e.g.
    ``dedup_by_pairs(docs, jaccard_pairs(docs, ...), "doc_id")``.

    The loser list is one row per non-canonical duplicate — tiny next
    to the corpus — so the final join broadcasts on real data.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
