"""Bit-exact parity check: new Arrow cosine_near_dup_pairs vs old HOF form.

Compares full collected rows (id_l, id_r, float.hex(sim)) at sf0.001,
sf0.01, sf0.1 for the q52 call shape AND the q68 union construction,
plus a synthetic ragged/NaN corpus.
"""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location("old_similarity", "/tmp/old_similarity.py")
old_sim = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_sim)

from incubator_gobblin_spark.functions import similarity as new_sim
from incubator_gobblin_spark.plans.queries import load_table
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .appName("parity_q52")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")


def rows(df):
    return sorted(
        (r.id_l, r.id_r, None if r.sim is None else float(r.sim).hex())
        for r in df.collect()
    )


fail = False
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    emb = load_table(spark, f"/root/testdata/{sf}", "embeddings")
    t0 = time.time()
    old = rows(old_sim.cosine_near_dup_pairs(emb, dim=64, threshold=0.35, num_bits=64, bands=8))
    t1 = time.time()
    new = rows(new_sim.cosine_near_dup_pairs(emb, dim=64, threshold=0.35, num_bits=64, bands=8))
    t2 = time.time()
    ok = old == new
    fail |= not ok
    print(f"{sf} q52: old={len(old)} rows {t1-t0:.2f}s | new={len(new)} rows {t2-t1:.2f}s | match={ok}")
    if not ok:
        so, sn = set(old), set(new)
        print("  only-old:", list(so - sn)[:5])
        print("  only-new:", list(sn - so)[:5])

    # q68 union construction
    emb2 = emb.select("vec_id", "embedding")
    shifted = emb2.select((F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding")
    u = emb2.unionByName(shifted)
    old = rows(old_sim.cosine_near_dup_pairs(u, dim=64, threshold=0.35, num_bits=64, bands=8))
    new = rows(new_sim.cosine_near_dup_pairs(u, dim=64, threshold=0.35, num_bits=64, bands=8))
    ok = old == new
    fail |= not ok
    print(f"{sf} q68-union: old={len(old)} new={len(new)} match={ok}")

# synthetic ragged + NaN + zero-len corpus (old path drops cross-length and
# keeps NaN per Spark NaN ordering; new path must agree)
import random

random.seed(7)
data = []
for i in range(400):
    data.append((i, [random.gauss(0, 1) for _ in range(4)]))
data.append((900, [float("nan")] * 4))
data.append((901, [float("nan")] * 4))
data.append((902, []))  # zero norm: filtered before banding
syn = spark.createDataFrame(data, "vec_id bigint, embedding array<float>")
old = rows(old_sim.cosine_near_dup_pairs(syn, dim=4, threshold=0.35, num_bits=16, bands=4, max_bucket_size=512))
new = rows(new_sim.cosine_near_dup_pairs(syn, dim=4, threshold=0.35, num_bits=16, bands=4, max_bucket_size=512))
ok = old == new
fail |= not ok
print(f"synthetic ragged/NaN: old={len(old)} new={len(new)} match={ok}")
if not ok:
    so, sn = set(old), set(new)
    print("  only-old:", list(so - sn)[:8])
    print("  only-new:", list(sn - so)[:8])

print("PARITY_FAIL" if fail else "PARITY_OK")
spark.stop()
