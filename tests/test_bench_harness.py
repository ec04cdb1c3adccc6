"""bench.py fault isolation (round-3 post-mortem: an exception in one query
aborted the entire bench and the round lost its artifact). The timing loop
must survive failing queries — at plan time AND at action time — record
null + a one-line error for them, and still produce timings for everything
else. The driver's per-round BENCH_r{N}.json depends on this behavior."""

from __future__ import annotations

import json

from bench import run_queries
from tests.conftest import SF_SMALL


class FakeSpec:
    def __init__(self, fn):
        self.fn = fn


def ok_query(spark, sf_dir):
    return spark.range(10)


def plan_time_boom(spark, sf_dir):
    raise ValueError("broken at plan construction")


def action_time_boom(spark, sf_dir):
    from pyspark.sql import functions as F

    # Analyzes fine; every task throws at execution (the round-3 failure
    # mode was this class: valid-looking plan, dead at the action).
    return spark.range(10).select(
        F.assert_true(F.col("id") < 0, F.lit("dead at action")).alias("x")
    )


def test_bench_isolates_failures_and_times_the_rest(spark):
    specs = {
        "good_one": FakeSpec(ok_query),
        "bad_plan": FakeSpec(plan_time_boom),
        "bad_action": FakeSpec(action_time_boom),
        "good_two": FakeSpec(ok_query),
    }
    names = list(specs)
    timings, errors = run_queries(spark, specs, names, SF_SMALL, passes=2)

    assert timings["good_one"] is not None and timings["good_two"] is not None
    assert timings["bad_plan"] is None and timings["bad_action"] is None
    assert "ValueError" in errors["bad_plan"]
    assert "bad_action" in errors  # surfaced, class varies by Spark wrapping
    assert "\n" not in errors["bad_plan"] and len(errors["bad_plan"]) <= 200

    # The output contract downstream of the loop: total over non-null only,
    # JSON-serializable with nulls in place.
    total = round(sum(t for t in timings.values() if t is not None), 4)
    line = json.dumps({"value": total, "queries": timings, "errors": errors})
    parsed = json.loads(line)
    assert parsed["queries"]["bad_plan"] is None


def test_compact_summary_fits_tail_capture_and_parses(spark):
    """Round-4 verdict #1: the driver archives only the last 2000 chars of
    stdout, so bench must end with a < 1.8 KB self-contained JSON line
    (total + headline + top-15 + error count) that parses on its own."""
    from bench import HEADLINE, compact_summary

    # Worst realistic case: ~100 long-named queries, all timed, plus errors.
    timings = {f"some_quite_long_query_name_number_{i:03d}": i / 7.0 for i in range(100)}
    for h in HEADLINE:
        timings[h] = 1.23
    errors = {"broken_one": "ValueError: x" * 10}
    line = compact_summary(timings, errors, total=123.45, sf=0.1)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["value"] == 123.45
    assert set(parsed["headline"]) == set(HEADLINE)
    assert len(parsed["top15"]) == 15
    assert parsed["n_errors"] == 1
    # Every value in top15 is among the largest timings (sorted desc).
    assert min(parsed["top15"].values()) >= sorted(
        (t for t in timings.values() if t is not None), reverse=True
    )[14]


def test_calibration_probe_records_floor_and_load(spark):
    """Round-7 verdict #3: the r7 driver bench read 3.2x an idle re-run of
    identical code and the artifact couldn't prove load vs regression. The
    parsed block now carries a machine-load calibration: a fixed reference
    job's best-of-3 floor plus os.getloadavg(), and the compact tail line
    keeps it even under the shed-to-fit loop."""
    from bench import calibration, compact_summary

    cal = calibration(spark)
    assert cal["floor_sec"] > 0
    assert len(cal["loadavg"]) == 3
    timings = {f"q{i}": i / 7.0 for i in range(100)}
    line = compact_summary(timings, {}, total=1.0, sf=0.1, calibration=cal)
    assert len(line) <= 1800
    assert json.loads(line)["calibration"]["floor_sec"] == cal["floor_sec"]


def test_bench_failed_query_not_retried_in_pass_two(spark):
    calls = {"n": 0}

    def counting_boom(spark_, sf_dir):
        calls["n"] += 1
        raise RuntimeError("always fails")

    specs = {"boom": FakeSpec(counting_boom)}
    run_queries(spark, specs, ["boom"], SF_SMALL, passes=2)
    assert calls["n"] == 1, "a failed query must not pay the second pass"


def test_write_self_record_roundtrip_and_readonly(tmp_path):
    """r15: the full per-query record lands in a JSON file the driver's
    2000-char stdout capture can't truncate; an unwritable target
    degrades silently (the stdout record still stands)."""
    import json

    from bench import write_self_record

    out = {"metric": "headline_queries_wall", "value": 1.23,
           "queries": {"q": 0.5}, "sf": 0.1}
    p = write_self_record(out, path=str(tmp_path / "BENCH_SELF.json"))
    assert p is not None
    assert json.loads(open(p).read()) == out
    assert write_self_record(out, path=str(tmp_path / "nodir" / "x.json")) is None
