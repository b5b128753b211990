"""Structured Streaming incremental ingest (O-2 analogue)."""
