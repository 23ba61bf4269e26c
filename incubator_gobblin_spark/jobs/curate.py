"""End-to-end training-corpus curation: the composition users actually
run over a crawl before pretraining.

Stages (each individually oracle-proven by its own registered query;
this job wires them into one DataFrame plan):

1. Quality gate — Gopher/MassiveText document rules as an inline
   projection filter (``corpus.gopher_keep``; q102's semantics).
2. Exact deduplication — keep the lowest-id document per md5 text
   fingerprint (``text.fingerprint``; q07's key).
3. Benchmark decontamination — drop any document sharing a word
   n-gram with the held-out eval corpus (``corpus.decontaminate``;
   q70's overlap).
4. Split assignment — deterministic md5-range train/val/test
   (``corpus.assign_split``; q83's ranges).
5. Per-source cap — at most k docs per source in md5 order, salted
   two-phase top-k (``corpus.cap_per_group``; q82's cap).

Reference framing: Gobblin expresses this kind of flow as a converter +
row-policy chain inside one job
(gobblin-core/src/main/java/org/apache/gobblin/converter/Converter.java:40,
RowLevelPolicy.java:33); here the whole chain is ONE Catalyst plan, so
the quality filter pushes into the scan, the dedup shuffle is the
first exchange, and nothing materializes between stages.

100 TB shape, stage by stage: (1) scan-speed Column filter, pushed to
the parquet read; (2) one hash-partition shuffle on the 128-bit
fingerprint (uniform by construction — no skew, no salting needed);
(3) the benchmark gram set broadcasts (eval sets are small by
definition) and the contaminated-id set — bounded by the overlap, in
practice tiny — broadcasts into a left-anti join, so the corpus is
never shuffled for decontamination; (4) pure projection; (5) salted
two-phase window so a million-doc domain cannot pin one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from incubator_gobblin_spark.functions import corpus, text


def curate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    splits: dict[str, float] | None = None,
    cap_per_source: int = 50,
    decontam_n: int = 3,
    salt_parts: int | None = 8,
    doc_embeddings: DataFrame | None = None,
    bench_embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    vec_col: str = "embedding",
) -> DataFrame:
    """Run the five-stage curation chain over ``docs`` (the training
    candidates) against ``bench`` (the held-out eval corpus). Returns
    the curated rows — all input columns plus ``split``. Every stage
    is deterministic (hash-derived ordering and ranges only), so the
    output set is a pure function of the input tables: identical
    across engines, partitionings, and re-runs.

    Optional stage 3b — semantic decontamination: pass
    ``doc_embeddings`` (``id_col`` + ``vec_col``, one row per
    candidate doc) and ``bench_embeddings`` to ALSO drop docs whose
    embedding max-cosine against any benchmark embedding reaches
    ``semantic_threshold`` — catching paraphrased eval leakage the
    n-gram stage can't see (similarity.semantic_decontaminate; same
    broadcast-bench / map-side-max shape as q116)."""
    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}

    # 1. quality gate: inline projection filter, no self-join
    kept = docs.filter(corpus.gopher_keep(text_col))

    # 2. exact dedup: lowest id per text fingerprint. One shuffle on
    # the digest; row_number (not a min+join) keeps it single-pass.
    w = Window.partitionBy(text.fingerprint(text_col)).orderBy(F.col(id_col))
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 3. decontamination: anti-join the contaminated ids (docs sharing
    # any word-n-gram with the benchmark). The overlap set is small —
    # broadcast it so the corpus side never shuffles here.
    # The contaminated set is computed from KEPT (pre-dedup), not
    # DEDUPED: contamination is a pure function of the text, and dedup
    # keys on the text fingerprint, so a surviving row's id is in
    # contaminated(kept) iff its text overlaps — identical results,
    # but the broadcast branch skips re-running the dedup window
    # (Spark shares no subplans across branches; measured ~25% off the
    # whole chain at sf0.1). The extra ids from dropped duplicates are
    # harmless in an id anti-join.
    contaminated = corpus.decontaminate(
        kept, bench, id_col=id_col, text_col=text_col, n=decontam_n
    ).select(id_col)
    clean = deduped.join(F.broadcast(contaminated), id_col, "left_anti")

    # 3b (optional). semantic decontamination: ids whose embedding
    # sits within semantic_threshold cosine of ANY bench embedding are
    # anti-joined out. The flagged set is benchmark-neighborhood-sized,
    # so it broadcasts like the n-gram overlap set above.
    if (doc_embeddings is None) != (bench_embeddings is None):
        raise ValueError(
            "semantic decontamination needs BOTH doc_embeddings and "
            "bench_embeddings (or neither)"
        )
    if doc_embeddings is not None and bench_embeddings is not None:
        from incubator_gobblin_spark.functions import similarity

        sem_ids = (
            similarity.semantic_decontaminate(
                doc_embeddings,
                bench_embeddings,
                threshold=semantic_threshold,
                id_col=id_col,
                vec_col=vec_col,
            )
            .filter(F.col("contaminated") == 1)
            .select(id_col)
        )
        clean = clean.join(F.broadcast(sem_ids), id_col, "left_anti")

    # 4. deterministic split assignment (md5-range membership)
    with_split = corpus.assign_split(clean, id_col, splits)

    # 5. per-source cap in md5 order (salted two-phase top-k)
    return corpus.cap_per_group(
        with_split, source_col, cap_per_source, key=id_col, salt_parts=salt_parts
    )


def curation_report(curated: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-(split, source) corpus accounting over :func:`curate`'s
    output: document count and total characters — the summary a
    mixture designer consumes. Single grouped aggregation."""
    return curated.groupBy("split", source_col).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )


def land_curated(
    spark,
    lake_sink,
    curated: DataFrame,
    text_col: str = "text",
    run_id: str | None = None,
    max_conflict_retries: int = 4,
) -> str | None:
    """Land curated rows in a manifest lake keyed by content
    fingerprint via an insert-only MERGE — the ONE place the
    incremental-curation landing contract lives (the batch job's
    ``curate.lake.dir`` mode and the streaming ``to_curate`` sink both
    call this, so the merge keys/mode/retry posture cannot drift):
    cross-batch duplicate texts keep their first lake copy, a
    re-submitted run id is a no-op, and a concurrent lake commit
    (compaction, a batch re-cap job) triggers a bounded recompute
    instead of killing the caller."""
    keyed = curated.withColumn("fp", text.fingerprint(text_col))
    return lake_sink.merge_into(
        spark,
        keyed,
        on=["fp"],
        run_id=run_id,
        matched="ignore",
        max_conflict_retries=max_conflict_retries,
    )
