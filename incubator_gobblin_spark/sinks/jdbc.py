"""JDBC sink with staging-table atomic publish.

Reference surface:
- JdbcWriter batches INSERTs into a *staging* table; JdbcPublisher then
  moves staging -> final inside one transaction so a failed job never
  leaves partial rows visible
  (gobblin-modules/gobblin-sql/.../writer/JdbcWriter.java:67,
  publisher/JdbcPublisher.java:52, buffered inserters writer/commands/*).
- Batch-insert sizing guidance: gains plateau at batch >= 1000
  (gobblin-docs/sinks/Gobblin-JDBC-Writer.md:184).

Spark-first: ``df.write.jdbc`` already does parallel batched inserts
(one connection per partition, ``batchsize`` rows per round trip); what
the engine adds is the publish protocol — write to a run-scoped staging
table, then one INSERT ... SELECT + DROP inside the database, which is
the only way to make a multi-connection parallel load atomic. SQL
generation is split from execution so the protocol is testable without
a live server (tests drive it through DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class JdbcPublishPlan:
    """The three statements of the staging->final publish protocol.
    Run them on ONE connection, in order, inside one transaction."""

    create_final_like_staging: str
    insert_final_from_staging: str
    drop_staging: str


def staging_table_name(final_table: str, run_id: str) -> str:
    """Run-scoped staging table (JdbcWriter's task-scoped staging table);
    run_id must be SQL-identifier-safe."""
    return f"{final_table}_staging_{run_id}"


def publish_plan(
    final_table: str, staging_table: str, replace: bool = False
) -> JdbcPublishPlan:
    """Publish statements (JdbcPublisher.publish:52 semantics):
    append mode inserts staging into final; replace mode additionally
    truncates final first (snapshot tables). INSERT ... SELECT is one
    atomic statement in every target the reference supported."""
    insert = f"INSERT INTO {final_table} SELECT * FROM {staging_table}"
    if replace:
        insert = f"DELETE FROM {final_table}; " + insert
    return JdbcPublishPlan(
        create_final_like_staging=(
            f"CREATE TABLE IF NOT EXISTS {final_table} AS "
            f"SELECT * FROM {staging_table} WHERE 1=0"
        ),
        insert_final_from_staging=insert,
        drop_staging=f"DROP TABLE {staging_table}",
    )


def write_jdbc_staged(
    df: DataFrame,
    url: str,
    final_table: str,
    run_id: str,
    properties: dict[str, str] | None = None,
    batch_size: int = 1000,
    num_partitions: int | None = None,
    replace: bool = False,
) -> JdbcPublishPlan:
    """Parallel batched load into the staging table, returning the publish
    plan for the caller to run after task-level quality gates pass (the
    write/publish split is the whole point: quality checks run between).

    ``batch_size`` defaults to the reference's measured sweet spot
    (>=1000, Gobblin-JDBC-Writer.md:184). ``num_partitions`` caps insert
    connections — at warehouse scale the database, not Spark, is the
    bottleneck; 8-16 connections saturate most servers.
    """
    staging = staging_table_name(final_table, run_id)
    out = df.coalesce(num_partitions) if num_partitions else df
    out.write.mode("overwrite").option("batchsize", batch_size).jdbc(
        url, staging, properties=properties or {}
    )
    return publish_plan(final_table, staging, replace=replace)
