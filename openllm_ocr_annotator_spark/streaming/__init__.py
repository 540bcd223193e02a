"""Structured Streaming surface (optional — the reference is batch-only)."""
