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


# ---------------------------------------------------------------------------
# Multi-hop path finding (the FlowGraph compiler's front half)
# ---------------------------------------------------------------------------

#: wildcard descriptor value (the reference's DatasetDescriptor "any")
ANY = "any"


def descriptor_contains(general: Mapping[str, str], specific: Mapping[str, str]) -> bool:
    """``general`` accepts ``specific`` (DatasetDescriptor.contains
    semantics): every non-wildcard property of ``general`` must be
    matched exactly; properties absent from ``specific`` count as
    wildcards and only match a wildcard."""
    return all(
        v == ANY or specific.get(k, ANY) == v for k, v in general.items()
    )


def _specialize_output(
    current: Mapping[str, str], output: Mapping[str, str]
) -> dict[str, str]:
    """The edge's concrete output descriptor for THIS traversal
    (AbstractPathFinder.makeOutputDescriptorSpecific): wildcard output
    properties inherit the concrete value flowing in; declared
    transformations override."""
    out = dict(current)
    out.update({k: v for k, v in output.items() if v != ANY})
    return out


@dataclass(frozen=True)
class FlowEdge:
    """One hop of the flow multigraph (flowgraph/FlowEdge.java): a job
    template moving/transforming a dataset from ``src`` node to
    ``dest`` node, accepting ``input_descriptor`` and emitting
    ``output_descriptor`` (wildcards allowed in both). Multiple edges
    may connect the same node pair."""

    edge_id: str
    src: str
    dest: str
    input_descriptor: Mapping[str, str]
    output_descriptor: Mapping[str, str]
    active: bool = True


@dataclass(frozen=True, eq=False)
class FlowEdgeContext:
    """An edge visited WITH the descriptor state of that visitation —
    the BFS visited-set key (BFSPathFinder class doc: a multigraph walk
    must key on (edge, descriptors), not on vertices, to terminate).
    Identity is (edge_id, descriptors) — edges themselves carry
    unhashable descriptor mappings."""

    edge: FlowEdge
    input_descriptor: tuple[tuple[str, str], ...]
    output_descriptor: tuple[tuple[str, str], ...]

    def _key(self) -> tuple:
        return (self.edge.edge_id, self.input_descriptor, self.output_descriptor)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, FlowEdgeContext) and self._key() == other._key()
        )

    def __hash__(self) -> int:
        return hash(self._key())


def _freeze(d: Mapping[str, str]) -> tuple[tuple[str, str], ...]:
    return tuple(sorted(d.items()))


def find_path(
    edges: Sequence[FlowEdge],
    src: str,
    dest: str,
    src_descriptor: Mapping[str, str],
    dest_descriptor: Mapping[str, str],
    inactive_nodes: set[str] | None = None,
) -> list[FlowEdgeContext] | None:
    """Shortest multi-hop path from ``src`` to ``dest`` whose flowing
    dataset descriptor ends compatible with ``dest_descriptor`` —
    BFSPathFinder.findPathUnicast re-expressed:

    - the graph is a MULTIGRAPH (parallel edges legal); the visited map
      keys on (edge, descriptor) contexts, which guarantees termination
      on cyclic graphs;
    - at each expansion, edges whose output already satisfies the
      destination descriptor go to the FRONT of the queue
      (getNextEdges' prioritizedEdgeList) so transformations happen as
      close to the source as possible;
    - inactive nodes/edges are skipped; an inactive src or dest returns
      None (no path), matching the reference's base condition 1;
    - src == dest with a compatible descriptor returns [] (base
      condition 2).

    Returns the edge-context path, or None when unreachable."""
    inactive = inactive_nodes or set()
    if src in inactive or dest in inactive:
        return None
    if src == dest and descriptor_contains(dest_descriptor, src_descriptor):
        return []
    by_src: dict[str, list[FlowEdge]] = {}
    for e in edges:
        by_src.setdefault(e.src, []).append(e)

    def next_edges(node: str, current: Mapping[str, str]) -> list[FlowEdgeContext]:
        prioritized: list[FlowEdgeContext] = []
        for e in by_src.get(node, []):
            if not e.active or e.dest in inactive:
                continue
            if not descriptor_contains(e.input_descriptor, current):
                continue
            out = _specialize_output(current, e.output_descriptor)
            ctx = FlowEdgeContext(e, _freeze(current), _freeze(out))
            if descriptor_contains(dest_descriptor, out):
                prioritized.insert(0, ctx)
            else:
                prioritized.append(ctx)
        return prioritized

    from collections import deque

    parent: dict[FlowEdgeContext, FlowEdgeContext | None] = {}
    queue: deque[FlowEdgeContext] = deque()
    for ctx in next_edges(src, dict(src_descriptor)):
        parent[ctx] = None
        queue.append(ctx)
    while queue:
        ctx = queue.popleft()
        out = dict(ctx.output_descriptor)
        if ctx.edge.dest == dest and descriptor_contains(dest_descriptor, out):
            path = [ctx]
            while parent[path[0]] is not None:
                path.insert(0, parent[path[0]])
            return path
        for child in next_edges(ctx.edge.dest, out):
            if child not in parent:
                parent[child] = ctx
                queue.append(child)
    return None


def flow_from_path(
    path: Sequence[FlowEdgeContext],
    make_job: Callable[[FlowEdgeContext], Callable[[], Any]],
) -> list[FlowNode]:
    """Compile a found path into the linear FlowNode chain
    :func:`run_flow` executes (MultiHopFlowCompiler's back half: one
    JobSpec per edge, each depending on the previous hop)."""
    nodes: list[FlowNode] = []
    prev: str | None = None
    for ctx in path:
        name = f"{ctx.edge.edge_id}:{ctx.edge.src}->{ctx.edge.dest}"
        nodes.append(
            FlowNode(
                name=name,
                run=make_job(ctx),
                depends_on=[prev] if prev else [],
            )
        )
        prev = name
    return nodes
