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


def _never_driver_sampled() -> list[str]:
    """Registered names with no row in any CORRECTNESS_r*.json yet — the
    set whose only external signal is this local gate, so (round-5 verdict
    #7) they get the driver's exact sf0.01 scale here, not just sf0.001."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            sampled.update(json.load(open(f)))
        except (OSError, ValueError):  # torn/absent artifact — be lenient
            continue
    return sorted(n for n in SPECS if n not in sampled)


@pytest.mark.sf001
@pytest.mark.parametrize("name", _never_driver_sampled())
def test_oracle_parity_driver_scale(spark, name):
    """The standing bar for never-driver-sampled queries: hash parity at
    the driver's own sf0.01 (8/8 hand spot-checks passed in round 5 — this
    makes that check exhaustive and repeatable; select with -m sf001)."""
    from tests.conftest import SF_ORACLE

    spec = SPECS[name]
    spark_df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert spark_df.count() >= 0
        return
    oracle_pdf = run_oracle(spec.oracle, SF_ORACLE)
    assert_parity(spark_df, oracle_pdf, name)


def _driver_rows_by_round() -> dict[str, int]:
    """name -> newest round with any driver row, from CORRECTNESS_r*.json."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", f)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            names = json.load(open(f))
        except (OSError, ValueError):  # torn/absent artifact — be lenient
            continue
        for n in names:
            newest[n] = max(newest.get(n, 0), rnd)
    return newest


def test_driver_row_cadence():
    """The rotation rule as CI (r9 verdict #6): every registered query's
    newest external driver row must be no older than the steady-state
    rotation bound — ceil(n_registered / 50) rounds, the fastest full
    rotation a 50-slot window permits (the original 2-round aspiration
    stopped being arithmetically satisfiable past 150 registered
    queries) — OR be scheduled in the upcoming window (PRIORITY head).
    Additionally the window must DRAIN the oldest cohort: any name whose
    row would exceed the bound after this round has to be in the head,
    and never-sampled names (new registrations) always are. Red here
    means the planned PRIORITY doesn't drain the backlog — fix the
    window, not the test."""
    import math

    from petfinder_database_distributor_spark.registry import PRIORITY

    newest = _driver_rows_by_round()
    current_round = max(newest.values()) + 1  # newest artifact + this round
    bound = math.ceil(len(SPECS) / 50)
    window = set(PRIORITY[:50])
    missing = [n for n in PRIORITY if n not in SPECS]
    assert not missing, f"PRIORITY names not registered: {missing}"
    stale = sorted(
        n
        for n in SPECS
        if newest.get(n, 0) < current_round - bound and n not in window
    )
    assert not stale, (
        f"{len(stale)} queries' newest driver row predates round "
        f"{current_round - bound} and the planned window won't refresh "
        f"them: {stale}"
    )
    never = sorted(n for n in SPECS if n not in newest and n not in window)
    assert not never, f"never-sampled registrations outside the window: {never}"
