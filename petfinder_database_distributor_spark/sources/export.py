"""S3/S5/S8/S9 — the reference's on-disk and serving encodings.

On disk everything is a string (SURVEY.md §1.3): booleans as
``'True'/'False'``, null as ``''``, newlines escaped to the literal two
chars ``\\n`` so one row is one CSV line. Internally the engine keeps real
types (nullable BooleanType IS the tri-state) and applies the encoding only
at the export boundary; the scan decodes it back. Round-tripping through
these two functions is the identity on the typed table — tested in
tests/test_export.py.

Serving (S8/S9, ``server.py:463-518``) maps to emitters over the same
encoded projection: per-row JSON objects / a single-header CSV. The HTTP
layer itself (auth F6, routes) lives in
:mod:`petfinder_database_distributor_spark.serving.http_server` — a
stdlib tier over the artifacts these functions write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from petfinder_database_distributor_spark.functions.scalars import (
    bool_to_string,
    escape_newlines,
)


def encode_for_export(
    df: DataFrame,
    string_cols: list[str],
    bool_cols: list[str],
    text_cols: list[str] = (),
    order_col: str | None = None,
    column_order: list[str] | None = None,
) -> DataFrame:
    """P4+X4+X5 export projection: emit exactly the declared columns in
    order, all strings — nulls as '', tri-state booleans as
    'True'/'False'/'', long-text columns newline-escaped. ``column_order``
    fixes the emitted order (P4's declared-schema ordering — the reference
    interleaves boolean and string columns); default is strings then
    booleans. ``order_col`` (the explicit ingest_seq, SURVEY.md §7.3.4)
    restores insertion order at the boundary; DataFrames are unordered
    everywhere else."""
    encoded: dict[str, Column] = {}
    for c in string_cols:
        e = F.coalesce(F.col(c).cast("string"), F.lit(""))
        if c in text_cols:
            e = escape_newlines(e)
        encoded[c] = e.alias(c)
    for c in bool_cols:
        encoded[c] = bool_to_string(F.col(c)).alias(c)
    ordering = column_order if column_order is not None else [*string_cols, *bool_cols]
    cols = [encoded[c] for c in ordering]
    out = df.select(*([F.col(order_col)] if order_col else []), *cols)
    if order_col:
        out = out.orderBy(order_col)
    return out


def decode_from_export(df: DataFrame, bool_cols: list[str]) -> DataFrame:
    """S3 scan-side decode: ``'True'/'False'`` → boolean, ``''`` → null —
    restoring the tri-state exactly (False is a present value, only ''
    was missing; pet_scraper.py:305-322)."""
    out = df
    for c in bool_cols:
        out = out.withColumn(
            c,
            F.when(F.col(c) == "True", F.lit(True))
            .when(F.col(c) == "False", F.lit(False))
            .otherwise(F.lit(None).cast("boolean")),
        )
    return out


def write_csv_table(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S5/S9 CSV sink. ``single_file`` mirrors the reference's one-file
    serving artifact (coalesce(1) — driver-adjacent, only for small
    exports); at scale leave partitioned and let the web tier stream parts.
    Spark's file commit protocol provides the tmp+rename atomicity the
    reference hand-rolled (O5)."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.option("header", True).option("quoteAll", False).csv(path)


def read_csv_table(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S3 CSV scan with explicit schema (never inferSchema)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def json_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """S8 serving projection: one compact JSON object per row (field order =
    declared column order). The route wrapper {"count": n, "pets": [...]}
    is a driver-side concatenation of exactly these strings + A1's count."""
    return df.select(F.to_json(F.struct(*[F.col(c) for c in cols])).alias("payload"))
