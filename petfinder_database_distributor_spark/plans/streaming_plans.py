"""Incremental-pipeline queries (Structured Streaming, SURVEY.md §2.8).
Populated in M5."""
