"""Spark operators: the engine's dataflow verbs (SURVEY.md §2)."""
