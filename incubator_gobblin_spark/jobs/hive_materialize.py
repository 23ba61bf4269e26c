"""Hive/catalog materialization: CTAS flatten + table/partition registration.

Reference surface:
- HiveAvroORCQueryGenerator emits the DDL + ``INSERT OVERWRITE TABLE ...
  SELECT <flattened projection>`` that converts nested Avro lake data to
  flat ORC Hive tables
  (gobblin-data-management/.../conversion/hive/query/HiveAvroORCQueryGenerator.java).
- HiveRegister / HiveRegistrationPublisher register published paths as
  tables/partitions (gobblin-hive-registration/.../hive/HiveRegister.java:61,
  createTableIfNotExists:181, addPartitionIfNotExists:192;
  gobblin-core/.../publisher/HiveRegistrationPublisher.java).

Spark-first: the conversion is ``CREATE TABLE ... USING <fmt> AS
SELECT`` against the session catalog — Catalyst plans the flattening
projection, the write is the ordinary distributed file write; no
generated HiveQL strings to escape. Registration of already-published
paths is the catalog API (external table + ADD PARTITION), same split
as the reference: data movement vs metadata-only registration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from incubator_gobblin_spark.formats.avro_ocf import resolve_format

from incubator_gobblin_spark.operators.converters import flatten_all


def materialize(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    fmt: str = "orc",
    partition_by: Sequence[str] = (),
    flatten: bool = True,
    overwrite: bool = True,
) -> None:
    """CTAS the DataFrame into a catalog-managed table, flattening nested
    structs first (ORC-for-Hive consumers in the reference's era were
    flat-schema; flatten_all is the AvroFlattener analogue).

    Partitioned output uses ``partitionBy`` so the catalog records the
    partition columns — downstream readers get partition pruning."""
    out = flatten_all(df) if flatten else df
    writer = out.write.format(resolve_format(fmt))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode("overwrite" if overwrite else "errorifexists").saveAsTable(table)


def register_external_table(
    spark: SparkSession,
    table: str,
    path: str,
    fmt: str = "parquet",
) -> None:
    """Register an already-published path as an external table
    (HiveRegister.createTableIfNotExists:181 — metadata only, no scan)."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} USING {fmt} LOCATION '{path}'"
    )


def add_partition(
    spark: SparkSession,
    table: str,
    partition_spec: dict[str, str],
    path: str | None = None,
) -> None:
    """ALTER TABLE ... ADD IF NOT EXISTS PARTITION
    (HiveRegister.addPartitionIfNotExists:192). ``path`` pins an external
    location; omitted means the table-rooted layout."""
    spec = ", ".join(f"{k}='{v}'" for k, v in partition_spec.items())
    sql = f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({spec})"
    if path:
        sql += f" LOCATION '{path}'"
    spark.sql(sql)


def repair_partitions(spark: SparkSession, table: str) -> None:
    """MSCK REPAIR: discover hive-layout partition directories under the
    table location (bulk HiveRegistrationPublisher for backfills)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")
