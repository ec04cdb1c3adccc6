"""Dataflow operators (SURVEY.md §2): filters, dedup/upsert/merge,
extraction/enumeration, fuzzy dedup, similarity search, text analysis,
multimodal plumbing. Each operator is ``f(df|spark, params) -> DataFrame``
built from native expressions; no driver-side materialization."""
