"""Connected-components / duplicate-cluster resolution tests.

The oracle-parity gate covers q80/q81 end-to-end; these tests hit the
algorithm directly: pointer-jumping convergence on long paths (the case
plain label propagation would need O(n) rounds for), multi-component
graphs, degenerate inputs, and a randomized cross-check against a
driver-side union-find.
"""

import random

import pytest
from pyspark.sql import functions as F

from incubator_gobblin_spark.functions.graph import (
    connected_components,
    dedup_by_pairs,
)


def _components(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(e, **kw).collect()
    return {r.id: r.component for r in rows}


def test_long_chain_converges(spark):
    # a 200-vertex path: diameter 199, pointer jumping must close it
    # well inside the default round cap (~log2(199) + neighbour rounds)
    comps = _components(spark, [(i, i + 1) for i in range(199)])
    assert set(comps.values()) == {0}
    assert len(comps) == 200


def test_multiple_components_and_canonical_min(spark):
    comps = _components(
        spark, [(5, 3), (3, 9), (20, 21), (21, 22), (22, 20), (7, 40)]
    )
    assert comps[3] == comps[5] == comps[9] == 3
    assert comps[20] == comps[21] == comps[22] == 20
    assert comps[7] == comps[40] == 7


def test_empty_and_degenerate_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert connected_components(e).count() == 0
    # self-loops and null endpoints are dropped, not propagated
    comps = _components(spark, [(1, 1), (None, 2), (3, None), (4, 5)])
    assert comps == {4: 4, 5: 4}


def test_randomized_vs_union_find(spark):
    rng = random.Random(7)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for v in (a, b):
            expected[v] = find(v)
    # union-find roots are not guaranteed minimal per component without
    # full path compression over members; normalize both sides to the
    # min member of each root group
    by_root = {}
    for v, r in expected.items():
        by_root.setdefault(r, []).append(v)
    norm = {v: min(by_root[r]) for v, r in expected.items()}

    comps = _components(spark, edges)
    assert comps == norm


def test_dedup_by_pairs_keeps_canonical_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 10, 11, 99)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "id_l long, id_r long"
    )
    kept = sorted(
        r.doc_id for r in dedup_by_pairs(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 10, 99]


def test_nonconvergence_raises(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=1)


def test_component_output_schema_matches_input_type(spark):
    e = spark.createDataFrame([(1, 2)], "src int, dst int")
    out = connected_components(e)
    assert [f.name for f in out.schema.fields] == ["id", "component"]
