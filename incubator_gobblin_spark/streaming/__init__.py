"""Structured Streaming surface: micro-batch pipelines with the same
converter/quality chain as batch, fork via foreachBatch, event-time
windows, and checkpointed delivery semantics."""
