"""Sinks / exports (SURVEY §2.2)."""
