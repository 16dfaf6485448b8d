"""Incremental micro-batch ingest (reference parity) and Structured
Streaming equivalents (engine extension)."""
