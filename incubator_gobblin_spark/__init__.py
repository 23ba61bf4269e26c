"""incubator_gobblin_spark — a PySpark-native data-integration engine.

A from-scratch re-expression of the capabilities of Apache Gobblin
(reference: apache/incubator-gobblin) on the Spark DataFrame / SQL /
Structured Streaming stack:

- per-record dataflow pipeline (extract -> convert -> quality-check ->
  fork -> write -> publish) as a lazy DataFrame transform chain
  (see ``pipeline.Pipeline``);
- watermark-driven incremental ingestion with a JSON state store
  (``state``, ``operators.watermark``);
- lake lifecycle jobs: compaction/dedup, retention, GDPR purge
  (``jobs``);
- LLM-training-data operators: exact/fuzzy dedup, similarity search,
  text analysis, multimodal column plumbing (``functions``).

Everything is declarative DataFrame code so Catalyst handles pushdown,
pruning, join selection, and whole-stage codegen; Python UDFs appear
only where Spark genuinely lacks the semantics (Arrow-batched).
"""

__version__ = "0.1.0"

from incubator_gobblin_spark.session import get_spark  # noqa: F401
