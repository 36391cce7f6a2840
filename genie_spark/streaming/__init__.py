"""Incremental ingestion via Structured Streaming."""
