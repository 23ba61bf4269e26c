"""Jobs-per-merge bench: batched bpe_train vs the sequential reference.

Prints ONE JSON line. The batched trainer is measured AT 64 merges; the
sequential reference loop is measured at a smaller merge count (it costs
~3 Spark jobs and one cached frame PER MERGE — at 64 merges it OOMs a
default-heap driver, which is exactly the scale-killer the batched
trainer removes), and the comparison is normalized to jobs-per-merge.
Merge-list equality between the two is pinned by tests/test_corpus.py.

Usage: python tools/bench_bpe.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from incubator_gobblin_spark.functions import corpus as C

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
SAMPLE_DOCS = 500
BATCHED_MERGES = 64
SEQUENTIAL_MERGES = 8


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench-bpe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .limit(SAMPLE_DOCS)
        .cache()
    )
    docs.count()

    def measure(group, fn):
        sc.setJobGroup(group, group)
        t0 = time.time()
        out = fn()
        sec = time.time() - t0
        sc.setJobGroup("", "")
        return out, len(sc.statusTracker().getJobIdsForGroup(group)), sec

    bat, bat_jobs, bat_sec = measure(
        "bpe-batched", lambda: C.bpe_train(docs, "text", BATCHED_MERGES)
    )
    seq, seq_jobs, seq_sec = measure(
        "bpe-sequential",
        lambda: C.bpe_train_sequential(docs, "text", SEQUENTIAL_MERGES),
    )
    assert bat[: len(seq)] == seq, "merge lists diverged — batching bug"
    bat_jpm = bat_jobs / len(bat)
    seq_jpm = seq_jobs / len(seq)
    print(
        json.dumps(
            {
                "metric": "bpe_jobs_per_merge_ratio",
                "value": round(seq_jpm / bat_jpm, 2),
                "unit": "x_fewer_jobs",
                "sf": SF_DIR,
                "sample_docs": SAMPLE_DOCS,
                "batched": {
                    "merges": len(bat),
                    "jobs": bat_jobs,
                    "jobs_per_merge": round(bat_jpm, 3),
                    "sec": round(bat_sec, 1),
                },
                "sequential_reference": {
                    "merges": len(seq),
                    "jobs": seq_jobs,
                    "jobs_per_merge": round(seq_jpm, 3),
                    "sec": round(seq_sec, 1),
                    "note": (
                        "measured at 8 merges; at 64 it OOMs a "
                        "default-heap driver (64 chained cached frames)"
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
