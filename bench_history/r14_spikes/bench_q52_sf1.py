"""A/B q52 at sf1 (noop sink): old HOF pair expansion vs new Arrow stage."""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location("old_similarity", "/tmp/old_similarity.py")
old_sim = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_sim)

from incubator_gobblin_spark.functions import similarity as new_sim
from incubator_gobblin_spark.plans.queries import load_table
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .appName("bench_q52_sf1")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = load_table(spark, "/tmp/sf1_soak", "embeddings")
emb.count()  # warm file listing / footer caches


def run(mod, tag):
    spark.sparkContext.setJobDescription(f"q52 sf1 {tag}")
    t0 = time.time()
    df = mod.cosine_near_dup_pairs(emb, dim=64, threshold=0.35, num_bits=64, bands=8)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


# interleaved A/B, 3 rounds each
for i in range(3):
    o = run(old_sim, "old")
    n = run(new_sim, "new")
    print(f"round {i}: old={o:.2f}s new={n:.2f}s")
spark.stop()
