"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``MaximilianIsing/Petfinder-Database-Distributor``
(read-only at /root/reference), re-expressed Spark-first.

Layout:

- ``session``    — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``schema``     — explicit StructTypes (pets table, testdata tables)
- ``functions``  — scalar expression factories (reference §2.5 X1–X9)
- ``operators``  — dataflow operators: filters, dedup/upsert, extraction,
                   fuzzy dedup, similarity search, text analysis, multimodal
- ``plans``      — composed relational plans (flagship pipeline, TPC-H-ish)
- ``sources``    — readers/writers (schema-first parquet/CSV, export encode)
- ``streaming``  — incremental pipeline (Structured Streaming, foreachBatch merge)

Design stance (SURVEY.md §7.0): every operator is a function
``f(df|spark, params) -> DataFrame`` built from native Spark expressions —
no UDF where an expression exists, no ``collect()`` inside operators, no
driver-side row loops; broadcast only bounded sides; shuffle partitioning
parameterized so the same code runs at sf0.001 and at 100 TB.
"""

__version__ = "0.1.0"
