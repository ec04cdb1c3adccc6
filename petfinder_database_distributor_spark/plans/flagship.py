"""The flagship end-to-end distributor pipeline (SURVEY.md §7.1 M0).

One composed plan exercising the reference's whole data path on driver
tables: ingest → derive/clean → validate (null-ratio F2) → key-dedup (D1)
→ summarize. This is what ``__spark_entry__.entry`` runs at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.dedup import key_dedup
from petfinder_database_distributor_spark.operators.filters import null_ratio_filter
from petfinder_database_distributor_spark.plans.reference_ops import (
    _BOOL_FIELDS,
    _EVENTS_FIELDS_SQL,
    _FAILED_SQL,
    _STRING_FIELDS,
    _events_with_fields,
)
from petfinder_database_distributor_spark.registry import register


@register(
    "flagship_distributor_pipeline",
    oracle=f"""
    WITH t AS ({_EVENTS_FIELDS_SQL}),
    validated AS (SELECT * FROM t WHERE {_FAILED_SQL} < 0.5 * 4),
    deduped AS (
      SELECT * FROM validated
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1
    )
    SELECT event_type,
           count(*) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM deduped GROUP BY event_type
    """,
    doc="Flagship: ingest → derive → validate (F2) → key-dedup (D1) → summarize — the distributor pipeline end-to-end",
)
def flagship_distributor_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _events_with_fields(spark, sf_dir)
    validated = null_ratio_filter(raw, _STRING_FIELDS, _BOOL_FIELDS, drop_ratio=0.5)
    deduped = key_dedup(validated, ["user_id"], [F.col("event_id")])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
    )
