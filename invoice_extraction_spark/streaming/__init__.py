"""Structured Streaming: checkpointed incremental extraction runs."""
