"""Physical-layout operators: bucketing for co-located (shuffle-free) joins
and date-partitioned layout for dynamic partition pruning.

At 100 TB the dominant join cost is the shuffle that co-locates both sides
on the join key. Bucketing pays that shuffle ONCE at write time: both
tables are hash-partitioned into the same number of buckets on the key and
each bucket file is sorted, so a later equi-join reads matching buckets
side-by-side and sort-merge-joins them with NO Exchange in the plan (the
reference's in-memory set index, ``server.py:75-88``, is the degenerate
1-bucket version of the same idea — pre-organize by key so lookups don't
rescan). ``tests/test_plan_quality.py`` asserts the no-Exchange property.

Bucket count is a parameter: at test scale 8; on a cluster pick
``max(parallelism, table_bytes / target_file_size)`` and keep it IDENTICAL
on both sides — mismatched bucket counts fall back to a shuffle.

Dynamic partition pruning (the third pillar of the 100 TB join story,
next to bucketing and the AQE runtime Bloom filter): a fact table
partitioned on the join key + a selectively-filtered broadcast dim lets
Spark push the dim's surviving keys into the fact scan's PartitionFilters
at RUNTIME — whole date partitions are never read. ``j6_dpp_join`` below
demonstrates it; the plan shape (``dynamicpruning`` expression inside the
fact scan's PartitionFilters) is pinned in tests/test_plan_quality.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.registry import register
from petfinder_database_distributor_spark.schema import finite_measures, load_table
from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT

N_BUCKETS = 8


def bucketize(
    spark: SparkSession, sf_dir: str, table: str, key: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Write ``table`` bucketed+sorted by ``key`` as an external table under
    scratch and return a DataFrame reading it (bucket metadata attached)."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_").replace("-", "_")
    name = f"bkt_{table}_{tag}"
    path = f"{SCRATCH_ROOT}/bucketed/{name}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(path, ignore_errors=True)
    (
        load_table(spark, sf_dir, table)
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return spark.table(name)


def bucketed_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join itself (exposed for the plan-quality test)."""
    orders = bucketize(spark, sf_dir, "orders", "o_custkey")
    customer = bucketize(spark, sf_dir, "customer", "c_custkey")
    return orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))


@register(
    "j5_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           CAST(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DECIMAL(32,2))
                AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    doc="Bucketed co-located join: both sides written bucketBy(8, custkey) + "
    "sortBy, then equi-joined — the join stage has zero Exchange (asserted "
    "in test_plan_quality.py); the only shuffle left is the final small agg. "
    "This is the write-once-join-many layout a 100 TB fact/dim store uses",
)
def j5_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = bucketed_orders_customer(spark, sf_dir)
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(32,2)")
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning
# ---------------------------------------------------------------------------

def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table date-partitioned (``partitionBy(event_date)``)
    once per sf_dir — the write-once layout a 100 TB event store uses so
    time-scoped queries and fact/dim joins read only the partitions they
    need. Staged under scratch with the usual _ok-marker + source-mtime
    reuse guard (same protocol as the streaming chunk staging)."""
    from petfinder_database_distributor_spark.streaming.incremental import (
        staged_once,
    )

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_").replace("-", "_")
    path = f"{SCRATCH_ROOT}/dpp/events_{tag}"

    def build(path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)
        # Partition keys are non-null by contract: a NULL ts would land in
        # __HIVE_DEFAULT_PARTITION__ and crash the date-typed read-back; the
        # oracle's day() predicate drops NULL-ts rows anyway, so the
        # exclusion is parity-neutral.
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("ts").isNotNull())
            .withColumn("event_date", F.to_date("ts"))
        )
        ev.write.partitionBy("event_date").mode("overwrite").parquet(path)

    return staged_once(path, f"{sf_dir.rstrip('/')}/events.parquet", build)


@register(
    "j6_dpp_join",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           count(*) AS n_events,
           CAST(CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DECIMAL(32,2))
                AS DOUBLE) AS total_value
    FROM events
    WHERE day(CAST(ts AS DATE)) <= 7 AND (value IS NULL OR (isfinite(value) AND abs(value) < 1000000000000.0))
    GROUP BY 1
    """,
    doc="Dynamic partition pruning: events staged partitionBy(event_date), "
    "joined to a filtered broadcast calendar dim (first week of each "
    "month) — Spark injects the dim's surviving dates into the fact scan's "
    "PartitionFilters at runtime, so non-matching date partitions are "
    "never read. With bucketing (j5) and the AQE runtime Bloom filter, "
    "the third pillar of the 100 TB join story; plan shape pinned in "
    "tests/test_plan_quality.py",
)
def j6_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = finite_measures(dpp_events_calendar_join(spark, sf_dir))
    return joined.groupBy(
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(32,2)")
        .cast("double")
        .alias("total_value"),
    )


def dpp_events_calendar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prunable join itself (exposed for the plan-quality test): date-
    partitioned fact × selectively-filtered calendar dim. The dim filter
    (day-of-month <= 7) is not statically derivable on the fact side, so
    only dynamic pruning can skip partitions; the broadcast hint is
    justified at any scale — a calendar is ~4k rows per decade.

    Calendar bounds come from the staged layout's own partition
    directory names (a driver-side listing, zero Spark jobs) rather than
    a hard-coded range — a fixed decade would silently inner-join away
    any event dated outside it while the oracle kept it."""
    path = partitioned_events_path(spark, sf_dir)
    dates = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("event_date=")
    )
    if not dates:
        # empty events table: zero date partitions staged — the prunable
        # join over nothing is the empty frame with the join's schema
        # (degenerate-input contract; the oracle's filtered aggregate
        # over zero events is empty too)
        return spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string, event_date date, d date",
        )
    dim = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit(dates[0])), F.to_date(F.lit(dates[-1]))
                )
            ).alias("d")
        )
        .filter(F.dayofmonth("d") <= 7)
    )
    fact = spark.read.parquet(path)
    return fact.join(F.broadcast(dim), fact.event_date == dim.d)


@register(
    "j7_runtime_bloom_join",
    oracle="""
    SELECT count(*)::BIGINT AS n_lineitems,
           CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DECIMAL(32,4)) AS DOUBLE) AS urgent_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    doc="AQE runtime Bloom filter — the fourth pillar of the 100 TB join "
    "story next to broadcast, bucketing (j5) and DPP (j6): when a "
    "selective dim is too big to broadcast but its key set fits a Bloom "
    "filter, Spark builds the filter from the dim side at runtime and "
    "injects bloom_filter_might_contain onto the fact scan, discarding "
    "most fact rows BEFORE the join shuffle. The semantics are a plain "
    "equi-join (this query is correct with or without injection); the "
    "injection itself fires above size thresholds a test-scale corpus "
    "never meets, so tests/test_plan_quality.py pins the plan shape "
    "under lowered thresholds via runtime_bloom_join_plan().",
)
def j7_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # decimal-exact revenue: cast each factor BEFORE multiplying (the
    # repo-wide float discipline — a double product rounded to decimal
    # differs in the last cent between engines)
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount").cast("decimal(8,6)")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(rev).cast("decimal(32,4)").cast("double").alias("urgent_revenue"),
    )


def runtime_bloom_join_plan(spark: SparkSession, sf_dir: str) -> str:
    """Build the j7 join under thresholds that let the runtime Bloom filter
    fire at test scale (application-side floor dropped to 0, broadcast
    disabled so the join keeps the shuffle shape the filter exists for)
    and return the formatted plan. Confs are restored afterwards."""
    import io
    from contextlib import redirect_stdout

    from petfinder_database_distributor_spark.streaming.incremental import (
        scoped_conf,
    )

    with scoped_conf(
        spark,
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
        spark__sql__autoBroadcastJoinThreshold="-1",
    ):
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        return buf.getvalue()
