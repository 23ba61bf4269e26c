"""Invariants of the end-to-end curation job (jobs/curate.py). Value
parity with DuckDB is q106 in tests/test_oracle_parity.py; here we pin
the set-level guarantees each downstream consumer relies on."""

import pyspark.sql.functions as F
import pytest

from incubator_gobblin_spark.functions import corpus, text
from incubator_gobblin_spark.jobs import curate as curate_job
from incubator_gobblin_spark.session import load_table


@pytest.fixture(scope="module")
def curated(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = curate_job.curate(train, bench).cache()
    out.count()
    return out


def test_curate_output_is_nonempty_with_split(curated):
    assert curated.count() > 0
    assert set(
        r.split for r in curated.select("split").distinct().collect()
    ) <= {"train", "val", "test"}


def test_curate_respects_per_source_cap(curated):
    over = (
        curated.groupBy("source")
        .count()
        .filter(F.col("count") > 50)
        .count()
    )
    assert over == 0


def test_curate_no_duplicate_fingerprints(curated):
    dups = (
        curated.select(text.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0


def test_curate_no_contaminated_docs(curated, spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    overlap = corpus.decontaminate(
        curated, bench, id_col="doc_id", text_col="text", n=3
    )
    assert overlap.count() == 0


def test_curate_only_quality_docs(curated):
    # every surviving row passes the inline Gopher gate
    bad = curated.filter(~corpus.gopher_keep("text")).count()
    assert bad == 0


def test_curate_deterministic_under_repartition(spark, sf_dir, curated):
    docs = load_table(spark, sf_dir, "documents").repartition(17, "lang")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    again = curate_job.curate(train, bench)
    ids = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.split) for r in df.select("doc_id", "split").collect()
    )
    assert ids(again) == ids(curated)


def test_curate_semantic_stage_drops_embedding_leaks(spark, sf_dir):
    """Optional stage 3b: a candidate whose embedding sits at cosine 1.0
    to a bench embedding must be dropped; an orthogonal one survives;
    the default (no embeddings) path is untouched."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    base = curate_job.curate(train, bench)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    assert base_ids, "need survivors to plant a leak"
    leak_id = min(base_ids)
    other_id = max(base_ids)
    doc_emb = spark.createDataFrame(
        [(leak_id, [1.0, 0.0]), (other_id, [0.0, 1.0])],
        "doc_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(10**9, [2.0, 0.0])], "doc_id long, embedding array<double>"
    )
    out = curate_job.curate(
        train, bench, doc_embeddings=doc_emb, bench_embeddings=bench_emb,
        semantic_threshold=0.99,
    )
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert leak_id not in out_ids
    assert other_id in out_ids
    # docs without an embedding row are untouched
    assert out_ids == base_ids - {leak_id}


def test_curate_semantic_stage_requires_both_sides(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = spark.createDataFrame(
        [(1, [1.0])], "doc_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="BOTH"):
        curate_job.curate(
            docs.filter(F.col("doc_id") % 97 != 0),
            docs.filter(F.col("doc_id") % 97 == 0),
            doc_embeddings=emb,
        )
