"""File-based sources.

Reference surface: FileBasedSource/FileBasedExtractor list files and
iterate records (gobblin-core .../source/extractor/filebased/
FileBasedSource.java:58, FileBasedExtractor.java:52); format variants
(TextFileBasedSource.java:34, CsvFileDownloader, GZIPFileDownloader,
SimpleJsonExtractor); DatePartitionedAvroFileExtractor scans date-layout
directories between date watermarks
(.../source/extractor/DatePartitionedAvroFileExtractor.java:28).

Spark-first: file listing, split planning, codec handling, and schema
are all ``spark.read`` built-ins; WorkUnits are Spark's own input
splits. What the engine adds is (a) nanosecond-timestamp tolerance for
parquet written by pandas/arrow, (b) date-partition-layout pruning
helpers that turn a watermark interval into partition-path filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (pandas/arrow default),
    which Spark refuses to read as timestamps. Footer-only inspection —
    no data read, driver-side, O(1)."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:  # pragma: no cover - pyarrow always present in-container
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` tolerant of TIMESTAMP(NANOS) columns: those
    are read as long (legacy conf) and converted to microsecond
    timestamps in the plan (floor division — exact when the writer's
    sub-microsecond digits are zero, which holds for ms/us-sourced
    data round-tripped through arrow ns)."""
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get(_NANOS_CONF, "false")
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(_NANOS_CONF, prev)
    for c in ns_cols:
        # integer `div` (not `/`): float division of an int64 nanosecond
        # value loses low bits above 2^53.
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited text (TextFileBasedSource.java:34). Gzip et al.
    are transparent to Spark's file readers."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan (CsvFileDownloader / CsvToJsonConverter surface). Explicit
    schema preferred; inference is a full extra pass at scale."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines scan (SimpleJsonExtractor)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_date_partitioned(
    spark: SparkSession,
    root: str,
    fmt: str = "parquet",
    partition_pattern: str = "yyyy/MM/dd",
    low=None,
    high=None,
    partition_col: str = "_partition_date",
) -> DataFrame:
    """Scan a ``root/yyyy/MM/dd`` date-layout directory tree between date
    watermarks (DatePartitionedAvroFileExtractor semantics: low-exclusive,
    high-inclusive like every watermark interval).

    The partition date is derived from ``input_file_name`` and filtered —
    with hive-style layouts prefer real partition columns (then Catalyst
    partition-prunes); for bare date layouts this still avoids reading
    row data of skipped files thanks to file-level filter pushdown on the
    derived column being evaluated before row decode.
    """
    depth = partition_pattern.count("/") + 1
    df = spark.read.format(fmt).option("recursiveFileLookup", "true").load(root)
    segs = F.slice(F.split(F.input_file_name(), "/"), -1 - depth, depth)
    date_str = F.array_join(segs, "/")
    spark_fmt = partition_pattern
    df = df.withColumn(
        partition_col, F.to_date(F.unix_timestamp(date_str, spark_fmt).cast("timestamp"))
    )
    if low is not None:
        df = df.filter(F.col(partition_col) > F.lit(low))
    if high is not None:
        df = df.filter(F.col(partition_col) <= F.lit(high))
    return df
