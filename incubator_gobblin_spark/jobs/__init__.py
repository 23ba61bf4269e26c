"""Lake lifecycle jobs — the Gobblin differentiators: compaction/dedup,
retention, GDPR purge, dataset copy. Each is a thin orchestration over
the operator library + sinks."""
