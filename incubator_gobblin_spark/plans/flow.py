"""Multi-hop flow compilation: a DAG of pipelines.

Reference surface (SURVEY.md §3.3): Gobblin-as-a-Service compiles a
FlowSpec into a path of JobSpecs through a FlowGraph — BFS from source
node to sink node (gobblin-service/.../modules/flow/MultiHopFlowCompiler.java:78,
flowgraph/pathfinder/BFSPathFinder.java:54); each edge runs one §3.1 job.

Spark-first: each node is one Pipeline run (or any Python callable);
the runner topologically orders the DAG and runs nodes whose
dependencies committed. Per SURVEY §3.3 the control plane stays thin —
scheduling/clustering belongs to the resource manager (Airflow, cron,
k8s), not the engine; what the engine owes is correct ordering, fail-
fast skip of downstream nodes, and per-node results surfaced.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from enum import Enum
from graphlib import CycleError, TopologicalSorter
from typing import Any


class NodeStatus(Enum):
    PENDING = "pending"
    SUCCEEDED = "succeeded"
    FAILED = "failed"
    SKIPPED = "skipped"  # an upstream dependency failed


@dataclass
class FlowNode:
    """One hop: a callable (typically ``lambda: pipeline.run()``) plus
    its upstream dependencies."""

    name: str
    run: Callable[[], Any]
    depends_on: Sequence[str] = field(default_factory=tuple)


@dataclass
class FlowResult:
    status: dict[str, NodeStatus]
    results: dict[str, Any]
    errors: dict[str, Exception]

    @property
    def succeeded(self) -> bool:
        return all(s is NodeStatus.SUCCEEDED for s in self.status.values())


def compile_order(nodes: Sequence[FlowNode]) -> list[str]:
    """Topological execution order (the BFSPathFinder analogue for an
    explicit DAG; raises on cycles and on unknown dependencies)."""
    byname = {n.name: n for n in nodes}
    if len(byname) != len(nodes):
        raise ValueError("duplicate node names")
    for n in nodes:
        for d in n.depends_on:
            if d not in byname:
                raise ValueError(f"node {n.name!r} depends on unknown {d!r}")
    ts = TopologicalSorter({n.name: set(n.depends_on) for n in nodes})
    try:
        return list(ts.static_order())
    except CycleError as e:
        raise ValueError(f"flow has a cycle: {e.args[1]}") from e


def run_flow(nodes: Sequence[FlowNode]) -> FlowResult:
    """Run the DAG in dependency order. A failed node fails fast for its
    descendants (SKIPPED) but unrelated branches still run — the same
    per-dataset isolation as SafeDatasetCommit (gobblin-runtime
    .../SafeDatasetCommit.java:64)."""
    byname = {n.name: n for n in nodes}
    order = compile_order(nodes)
    status: dict[str, NodeStatus] = {n: NodeStatus.PENDING for n in byname}
    results: dict[str, Any] = {}
    errors: dict[str, Exception] = {}
    for name in order:
        node = byname[name]
        if any(status[d] is not NodeStatus.SUCCEEDED for d in node.depends_on):
            status[name] = NodeStatus.SKIPPED
            continue
        try:
            results[name] = node.run()
            status[name] = NodeStatus.SUCCEEDED
        except Exception as e:  # noqa: BLE001 - surfaced in FlowResult
            errors[name] = e
            status[name] = NodeStatus.FAILED
    return FlowResult(status=status, results=results, errors=errors)
