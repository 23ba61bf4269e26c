#!/usr/bin/env python
"""Interleaved same-host A/B between two committed trees' bench.py runs
(the BENCH_AB_r11 method, VERDICT r12 ask 2): alternate A,B pairs on a
quiet host, compare SHARED-query subtotals, report per-query min-deltas
for the focus queries the per-round noise check skipped.

Usage: python tools/ab_bench.py <treeA> <treeB> <pairs> <out.json>
Each tree must be a checkout with its own bench.py; runs use the same
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS contract as the driver.
"""

import json
import subprocess
import sys


def run_bench(tree: str) -> dict:
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [
        ln for ln in p.stdout.splitlines() if ln.startswith("{")
    ][-1]
    return json.loads(line)


def main():
    tree_a, tree_b, pairs, out_path = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
    )
    runs_a, runs_b = [], []
    for i in range(pairs):
        print(f"pair {i + 1}/{pairs}: A", file=sys.stderr, flush=True)
        runs_a.append(run_bench(tree_a))
        print(f"pair {i + 1}/{pairs}: B", file=sys.stderr, flush=True)
        runs_b.append(run_bench(tree_b))
    shared = sorted(
        set(runs_a[0]["queries"]) & set(runs_b[0]["queries"])
    )
    sub_a = [
        round(sum(r["queries"][q] for q in shared), 3) for r in runs_a
    ]
    sub_b = [
        round(sum(r["queries"][q] for q in shared), 3) for r in runs_b
    ]
    per_query = {}
    for q in shared:
        a_min = min(r["queries"][q] for r in runs_a)
        b_min = min(r["queries"][q] for r in runs_b)
        per_query[q] = {
            "a_min": round(a_min, 3),
            "b_min": round(b_min, 3),
            "ratio_min": round(b_min / a_min, 3) if a_min else None,
        }
    out = {
        "metric": "bench_ab_interleaved",
        "tree_a": tree_a,
        "tree_b": tree_b,
        "pairs": pairs,
        "shared_queries": len(shared),
        "a_shared_subtotals": sub_a,
        "b_shared_subtotals": sub_b,
        "interleaved_ratio_min": round(min(sub_b) / min(sub_a), 3),
        "per_query_min": per_query,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"ratio_min": out["interleaved_ratio_min"]}))


if __name__ == "__main__":
    main()
