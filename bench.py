#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is timed as a full action (count of the result — forces the
whole plan, returns one long to the driver; no toPandas materialization
cost polluting the engine measurement). One untimed warmup query first
absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from incubator_gobblin_spark.plans import queries as Q  # noqa: E402
from incubator_gobblin_spark.session import get_spark, load_table  # noqa: E402

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "q01_pricing_summary",     # scan + 8-agg hash aggregation
    "q03_revenue_by_nation",   # multi-way broadcast star join
    "q05_purge_anti_join",     # broadcast left-anti purge
    "q08_dedup_argmax",        # compaction dedup (max_by hash-agg)
    "q09_topk_per_group",      # window top-k
    "q13_running_total",       # running window frame
    "q18_union",               # set op
    "q21_explode_tokens",      # 1:N explode + agg
    "q28_text_stats",          # text analysis columns
    "q31_minhash_candidates",  # minhash LSH fuzzy dedup
    "q33_ann_cosine_topk",     # brute-force ANN
    "q52_embedding_neardup_lsh",  # embedding near-dup, LSH scale path
    "q53_asof_join",           # as-of join (union+window, one shuffle)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark(
        app_name="gobblin-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    # warmup: JVM + JIT + codegen + parquet decode + shuffle machinery.
    # A bare count() is metadata-only and warms nothing; this untimed
    # pass touches every engine path the headline queries use (columnar
    # decode, hash agg, shuffle exchange, window, higher-order funcs).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)"))
    ).count()
    li.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("l_suppkey").orderBy(F.desc("l_orderkey"))
        ),
    ).filter(F.col("_rn") == 1).count()
    orders = load_table(spark, sf_dir, "orders")
    li.join(
        F.broadcast(orders.select("o_orderkey", "o_custkey")),
        li.l_orderkey == F.col("o_orderkey"),
    ).groupBy("o_custkey").count().count()
    docs = load_table(spark, sf_dir, "documents")
    # the interpreted higher-order-function evaluator JITs slowly; three
    # passes bring it to steady state
    for _ in range(3):
        docs.select(
            F.sum(
                F.aggregate(
                    F.transform(F.split("text", " "), lambda w: F.xxhash64(w)),
                    F.lit(0).cast("long"),
                    lambda a, b: a.bitwiseXOR(b),
                ).bitwiseAND(F.lit(1023))
            )
        ).collect()

    registry = Q.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # best-of-2: the first run pays one-time janino/JIT compilation of
        # this query's generated code, which is amortized across reruns in
        # any real deployment; the min is the engine's steady-state cost
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
