"""Source connectors: lake file scans (parquet/csv/json/avro/text),
watermark-partitioned JDBC, Kafka offset-range batch — the Spark-first
re-expression of the reference's Source/Extractor surface."""
