"""Structured Streaming restatement of the reference's incremental pipeline
(SURVEY.md §2.8 T1–T7, S7)."""
