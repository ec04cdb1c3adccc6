"""Composed query plans, one module per area:

- ``reference_ops``   — SURVEY.md §2 operator inventory on the driver tables
- ``relational``      — TPC-H-ish relational coverage (joins/agg/windows)
- ``llm_pipeline``    — north-star layer: dedup, similarity, text, multimodal
- ``streaming_plans`` — incremental pipeline (Structured Streaming)

Importing a module registers its queries in
:mod:`petfinder_database_distributor_spark.registry`.
"""
