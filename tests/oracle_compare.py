"""Local replica of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle over the same parquet tables and compare
row-count + column names + order-insensitive values EXACTLY (floats must be
bit-identical — our plans use decimal-exact aggregation to guarantee it).
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import duckdb
import pandas as pd

from petfinder_database_distributor_spark.schema import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bool,)):
        return "T" if v else "F"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalars
        return _canon_cell(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_parity(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    actual = spark_df.toPandas()
    assert sorted(actual.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(actual.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(actual) == len(oracle_pdf), (
        f"{name}: row count spark={len(actual)} oracle={len(oracle_pdf)}"
    )
    a = canonical_rows(actual)
    b = canonical_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
