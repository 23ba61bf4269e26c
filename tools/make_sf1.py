#!/usr/bin/env python
"""Deterministic sf1 soak data: scale the driver's sf0.1 tables 10x.

The driver ships sf0.001/0.01/0.1; the soak target is ~10x bench scale
(6M-row lineitem, 50k documents, 20k embeddings). Each table is ten
id-shifted copies of sf0.1, perturbed so the SCALED corpus keeps the
original's duplicate/near-dup structure instead of multiplying it:

- documents: copy k>0 appends a copy-tag token to every text, so
  near-dup clusters exist WITHIN each copy but not across copies —
  LSH candidate counts scale ~10x (linear), not 100x (a quadratic
  artifact of verbatim replication that no real corpus has).
- embeddings: copy k>0 adds k*1e-3 to every coordinate — same
  reasoning for cosine near-dups.
- lineitem: plain id shift (aggregation queries don't self-join).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1_soak)
Idempotent: skips tables whose parquet already exists. bench.py calls
``generate(spark, out)`` directly when the soak dataset is absent, so
the per-round sf1 section regenerates itself on a fresh machine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SRC = "/root/testdata/sf0.1"
COPIES = 10
ID_OFFSET = 10_000_000


def generate(spark, out: str, src: str = SRC) -> None:
    """Write the scaled tables under ``out`` (idempotent per table)."""
    from pyspark.sql import functions as F

    from incubator_gobblin_spark.session import load_table

    os.makedirs(out, exist_ok=True)

    def done(t: str) -> bool:
        return os.path.exists(os.path.join(out, f"{t}.parquet"))

    def union_all(parts):
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    if not done("documents"):
        docs = load_table(spark, src, "documents")
        parts = []
        for k in range(COPIES):
            text = (
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" copytag{k}"))
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * ID_OFFSET)).alias("doc_id"),
                    text.alias("text"),
                    "lang",
                    "source",
                    F.length(text).cast("long").alias("n_chars"),
                )
            )
        union_all(parts).repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )

    if not done("embeddings"):
        emb = load_table(spark, src, "embeddings")
        parts = []
        for k in range(COPIES):
            vec = (
                F.col("embedding")
                if k == 0
                else F.transform(
                    "embedding", lambda x, _k=k: x + F.lit(_k * 1e-3)
                ).cast("array<float>")
            )
            parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(k * ID_OFFSET)).alias("vec_id"),
                    vec.alias("embedding"),
                    "label",
                )
            )
        union_all(parts).repartition(8).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings.parquet")
        )

    if not done("lineitem"):
        li = load_table(spark, src, "lineitem")
        parts = [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * ID_OFFSET))
            for k in range(COPIES)
        ]
        union_all(parts).repartition(64).write.mode("overwrite").parquet(
            os.path.join(out, "lineitem.parquet")
        )


def main() -> None:
    from incubator_gobblin_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_soak"
    spark = get_spark(
        app_name="make-sf1", master="local[32]", shuffle_partitions=32
    )
    generate(spark, out)
    print("sf1 data ready at", out)
    spark.stop()


if __name__ == "__main__":
    main()
