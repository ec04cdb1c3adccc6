"""Every registered query must hash-match its DuckDB oracle (the driver's
t2 gate, replicated locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.registry import load_all
from tests.conftest import SF_SMALL
from tests.oracle_compare import assert_parity, run_oracle

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_SMALL)
    oracle_pdf = run_oracle(spec.oracle, SF_SMALL)
    assert_parity(spark_df, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = SPECS[name].fn(spark, SF_SMALL)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
