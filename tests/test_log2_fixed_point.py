"""The fixed-point log2 kernel behind text_perplexity_bucket exists
because pow/log are not cross-libm reproducible — so the kernel itself
must be pinned two ways: (1) the Spark column chain and the DuckDB CTE
chain produce IDENTICAL integers for the same inputs (the cross-engine
theorem the oracle relies on), and (2) the integers it produces are
actually log2 — within the error bound of a 20-fractional-bit digit
recurrence — so the perplexity scores MEAN something."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from petfinder_database_distributor_spark.plans.mining import (
    _PPL_FRAC_BITS,
    _PPL_P_BITS,
    _log2fp_cost,
    _log2fp_sql_ctes,
)


def _duck_costs(ts: list[int]) -> dict[int, int]:
    vals = ", ".join(f"({t})" for t in ts)
    sql = f"""
    WITH tv(tq) AS (VALUES {vals}),
    {_log2fp_sql_ctes("tv")}
    SELECT tq, cost_fp FROM ppl_cost
    """
    return dict(duckdb.sql(sql).fetchall())


def test_cross_engine_bit_equality_on_boundaries(spark):
    # powers of two (exact logs), their neighbors, and the domain edges
    ts = sorted(
        {1, 2, 3, (1 << _PPL_P_BITS), (1 << _PPL_P_BITS) - 1}
        | {(1 << k) + d for k in range(1, _PPL_P_BITS) for d in (-1, 0, 1)}
    )
    duck = _duck_costs(ts)
    df = spark.createDataFrame([(t,) for t in ts], "tq long")
    ours = {r["tq"]: r["cost_fp"] for r in _log2fp_cost(df).collect()}
    assert ours == duck


def test_powers_of_two_are_exact(spark):
    # -log2(2^k / 2^30) = 30 - k exactly; the recurrence must hit it
    ts = [1 << k for k in range(_PPL_P_BITS + 1)]
    df = spark.createDataFrame([(t,) for t in ts], "tq long")
    got = {r["tq"]: r["cost_fp"] for r in _log2fp_cost(df).collect()}
    for k, t in enumerate(ts):
        assert got[t] == (_PPL_P_BITS - k) << _PPL_FRAC_BITS


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 1 << _PPL_P_BITS), min_size=1, max_size=24))
def test_duckdb_kernel_tracks_true_log2(ts):
    """DuckDB side alone (cheap — no Spark in the hypothesis loop; the
    cross-engine equality test above transfers the property): the fixed-
    point cost is the TRUNCATED 20-bit representation of -log2(t/2^30),
    so it must sit within 2 ulp below the real value and never above by
    more than 1 ulp (truncation direction of the digit recurrence)."""
    duck = _duck_costs(list(set(ts)))
    for t, cost in duck.items():
        true_cost = (_PPL_P_BITS - math.log2(t)) * (1 << _PPL_FRAC_BITS)
        assert cost == pytest.approx(true_cost, abs=2.0), (t, cost, true_cost)


def test_spark_matches_duckdb_on_random_sample(spark):
    import random

    rng = random.Random(20260815)
    ts = sorted({rng.randrange(1, 1 << _PPL_P_BITS) for _ in range(200)})
    duck = _duck_costs(ts)
    df = spark.createDataFrame([(t,) for t in ts], "tq long")
    ours = {r["tq"]: r["cost_fp"] for r in _log2fp_cost(df).collect()}
    assert ours == duck
