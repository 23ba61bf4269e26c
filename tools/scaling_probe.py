#!/usr/bin/env python
"""Core-scaling probe at sf1 (r13 VERDICT ask 4).

At sf0.1 every headline query is 0.1-2.3 s and fixed job/driver
overhead dominates, so 8-vs-32-core ratios all sit near 1 — a
measurement-resolution limit, not a harness bug. This probe times the
bench.SOAK set (the most expensive corpus/vector queries) against the
10x sf1 dataset at two core counts and reports wall ratios, which is
where core scaling is actually observable.

Each core count runs in its OWN subprocess (a SparkSession's master is
fixed at creation; reusing one session would silently ignore the
second core count — the exact `suspect_cpus_ignored` failure the
driver checks bench.py for). The child honors the same env-var
contract as bench.py: SPARK_GRAFT_CPUS decides local[N] and the
shuffle-partition default.

Usage: python tools/scaling_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARK_GRAFT_ROOT"])
from bench import SOAK
from incubator_gobblin_spark.plans import queries as Q
from incubator_gobblin_spark.session import get_spark, load_table

cpus = os.environ["SPARK_GRAFT_CPUS"]
sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_soak")
spark = get_spark(
    app_name=f"scaling-probe-{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
)
# untimed warmup: JVM/codegen + the sf1 file listing
load_table(spark, sf1_dir, "lineitem").groupBy("l_suppkey").count().count()
registry = Q.queries()
out = {}
for name in SOAK:
    runs = []
    for _ in range(2):
        spark.sparkContext.setJobDescription(f"scaling {cpus}c {name}")
        t0 = time.perf_counter()
        registry[name](spark, sf1_dir).count()
        runs.append(time.perf_counter() - t0)
    out[name] = {"cold": round(runs[0], 3), "steady": round(min(runs), 3)}
print("SCALING_JSON:" + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_ROOT"] = ROOT
    res = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    for line in res.stdout.splitlines():
        if line.startswith("SCALING_JSON:"):
            return json.loads(line[len("SCALING_JSON:"):])
    raise RuntimeError(
        f"probe at {cpus} cores produced no result:\n{res.stdout[-2000:]}"
        f"\n{res.stderr[-2000:]}"
    )


def main() -> None:
    hi, lo = 32, 8
    r_hi = run_at(hi)
    r_lo = run_at(lo)
    table = {}
    for name in r_hi:
        s_hi, s_lo = r_hi[name]["steady"], r_lo[name]["steady"]
        table[name] = {
            f"steady_{hi}c": s_hi,
            f"steady_{lo}c": s_lo,
            "lo_over_hi": round(s_lo / s_hi, 2) if s_hi else None,
        }
    out = {
        "metric": "sf1_core_scaling",
        "cpus_hi": hi,
        "cpus_lo": lo,
        "ideal_lo_over_hi": round(hi / lo, 2),
        "per_query": table,
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "SCALING_sf1_r14.json"
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
