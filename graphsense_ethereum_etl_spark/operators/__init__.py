"""Operator library: entity transform pipelines (reference parity) plus the
north-star extensions (dedup, similarity search, text analysis, multimodal)."""
