"""Sketch + observability operators that can't hash-match a DuckDB oracle:
HLL approximate distinct (error-bounded vs exact) and observe() metrics
(A2 running counters surfaced from a batch action without a second scan)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.schema import load_table
from tests.conftest import SF_SMALL


def test_approx_count_distinct_error_bounded(spark):
    ev = load_table(spark, SF_SMALL, "events")
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"]), (
            f"{r['event_type']}: approx {r['approx']} vs exact {r['exact']}"
        )


def test_observe_metrics_counters(spark):
    # A2: pipeline counters ride the action itself (no second scan),
    # the batch analog of streaming observe()/lastProgress.
    ev = load_table(spark, SF_SMALL, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents_seen"),
    )
    n = observed.count()
    assert obs.get["rows_seen"] == n
    exact = ev.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s")
    ).collect()[0]["s"]
    assert obs.get["cents_seen"] == exact
