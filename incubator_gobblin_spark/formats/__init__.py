"""Wire/file format codecs (Avro object-container files, registry
envelopes) — the reference's serde layer re-expressed for Spark."""
