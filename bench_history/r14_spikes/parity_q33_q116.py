"""Bit-exact parity: new Arrow cosine_topk / semantic_decontaminate vs
old (HEAD) formulations, at 3 SFs plus synthetic edge corpora."""
import importlib.util
import random
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
    .appName("parity_q33_q116")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def rows(df):
    def h(v):
        return v.hex() if isinstance(v, float) else v
    return sorted(tuple(None if x is None else h(x) for x in r) for r in df.collect())


fail = False


def check(tag, old_df, new_df):
    global fail
    t0 = time.time(); o = rows(old_df); t1 = time.time(); nw = rows(new_df); t2 = time.time()
    ok = o == nw
    fail |= not ok
    print(f"{tag}: old={len(o)} {t1-t0:.2f}s | new={len(nw)} {t2-t1:.2f}s | match={ok}")
    if not ok:
        so, sn = set(o), set(nw)
        print("  only-old:", list(so - sn)[:4])
        print("  only-new:", list(sn - so)[:4])


for sf in ("sf0.001", "sf0.01", "sf0.1"):
    emb = load_table(spark, f"/root/testdata/{sf}", "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    check(f"{sf} q33-shape",
          old_sim.cosine_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5),
          new_sim.cosine_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5))
    bench = emb.filter(F.col("vec_id") % 37 == 1).select("vec_id", "embedding")
    check(f"{sf} q116-shape",
          old_sim.semantic_decontaminate(emb, bench, threshold=0.85),
          new_sim.semantic_decontaminate(emb, bench, threshold=0.85))

# synthetic: NaN vectors, zero vectors, null vector, null element, ragged lengths,
# duplicate ids, empty bench / empty queries
random.seed(11)
data = []
for i in range(300):
    d = random.choice([4, 4, 6])
    data.append((i, [random.gauss(0, 1) for _ in range(d)]))
data += [
    (900, [float("nan")] * 4),
    (901, [0.0, 0.0, 0.0, 0.0]),
    (902, None),
    (903, [1.0, None, 0.5, 0.25]),
    (10, [9.9, 8.8, 7.7, 6.6]),  # duplicate id
]
syn = spark.createDataFrame(data, "vec_id bigint, embedding array<float>")
synq = syn.filter(F.col("vec_id").isin(0, 1, 2, 900, 902, 903))

# the zero-norm vector 901 makes BOTH formulations raise (ANSI
# DIVIDE_BY_ZERO in the old Column division; replicated in the Arrow
# stage) — assert raise-parity, then drop it for the value check
def raises(df):
    try:
        df.collect()
        return False
    except Exception as e:
        return "DIVIDE_BY_ZERO" in str(e) or "zero" in str(e).lower()

r_old = raises(old_sim.cosine_topk(syn, synq, id_col="vec_id", vec_col="embedding", k=4))
r_new = raises(new_sim.cosine_topk(syn, synq, id_col="vec_id", vec_col="embedding", k=4))
print(f"syn q33 zero-norm raise parity: old={r_old} new={r_new} match={r_old == r_new}")
fail |= r_old != r_new

syn_nz = syn.filter(F.col("vec_id") != 901)
check("syn q33-shape (no zero vec)",
      old_sim.cosine_topk(syn_nz, synq, id_col="vec_id", vec_col="embedding", k=4),
      new_sim.cosine_topk(syn_nz, synq, id_col="vec_id", vec_col="embedding", k=4))
check("syn q116-shape",
      old_sim.semantic_decontaminate(syn, synq, threshold=0.5),
      new_sim.semantic_decontaminate(syn, synq, threshold=0.5))
empty_q = syn.filter(F.col("vec_id") < 0)
check("empty-queries q33",
      old_sim.cosine_topk(syn, empty_q, id_col="vec_id", vec_col="embedding", k=4),
      new_sim.cosine_topk(syn, empty_q, id_col="vec_id", vec_col="embedding", k=4))
check("empty-bench q116",
      old_sim.semantic_decontaminate(syn, empty_q, threshold=0.5),
      new_sim.semantic_decontaminate(syn, empty_q, threshold=0.5))

print("PARITY_FAIL" if fail else "PARITY_OK")
spark.stop()
