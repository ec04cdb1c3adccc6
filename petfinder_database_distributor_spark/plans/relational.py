"""Relational coverage beyond the reference's narrow surface (SURVEY.md
§2.11 / §7.1 M6): joins, group-by aggregation, windows, top-k — the
operators a user of a general engine needs, demonstrated TPC-H-style on the
driver tables.

Float discipline: aggregates over DOUBLE go through DECIMAL (exact,
order-independent sums) and cast back to DOUBLE, so Spark and DuckDB agree
bit-for-bit regardless of partial-aggregation order. Pattern used on BOTH
sides: ``CAST(sum(CAST(x AS DECIMAL(p,s)) ...) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.registry import register
from petfinder_database_distributor_spark.schema import finite_measures, load_table


def _dec(c, p=18, s=6):
    """Exact-sum cast. Precisions are chosen so every product stays within
    DECIMAL(38): DuckDB silently falls back to order-dependent DOUBLE math
    when a decimal multiply would exceed width 38, which breaks bit-parity."""
    return c.cast(f"decimal({p},{s})")


def _dec8(c):
    """Narrow cast for rate-like factors (discount/tax, |x| < 100)."""
    return c.cast("decimal(8,6)")


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(32,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DECIMAL(32,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DECIMAL(32,4)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(8,6))) * (1 + CAST(l_tax AS DECIMAL(8,6)))), 6) AS DECIMAL(32,6)) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: scan → filter (pushed down) → hash agg with map-side partials",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec(F.col("l_extendedprice")) * (1 - _dec8(F.col("l_discount")))
    charge = disc * (1 + _dec8(F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"))).cast("decimal(32,2)").cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"))).cast("decimal(32,2)").cast("double").alias("sum_base_price"),
            F.sum(disc).cast("decimal(32,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(32,6)").cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DECIMAL(32,4)) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter → broadcast join small side → shuffle join fact → agg → top-k",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice")) * (1 - _dec8(F.col("l_discount")))
    return (
        # customer is the small side after the segment filter → broadcast:
        # no shuffle of orders for this join; lineitem↔orders is the one
        # real shuffle (co-partitioned on orderkey by AQE).
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("decimal(32,4)").cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_nation_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DECIMAL(32,4)) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style multi-way star join: all dims broadcast, single pass over the fact table",
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec(F.col("l_extendedprice")) * (1 - _dec8(F.col("l_discount")))
    dims = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            supplier.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(32,4)").cast("double").alias("revenue"))
    )


@register(
    "w1_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
    doc="Window top-k per group: row_number over partition, deterministic tie-break — one shuffle on the partition key",
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "rn")
    )


@register(
    "w2_running_totals",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(sum(CAST(value AS DECIMAL(25,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events WHERE ts IS NOT NULL AND (value IS NULL OR (isfinite(value) AND abs(value) < 1000000000000.0))
    """,
    doc="Window running aggregate + lag: per-user ordered frame (decimal-exact running sum)",
)
def w2_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered-window contract: NULL-ts rows are excluded — Spark orders
    # NULLS FIRST, DuckDB NULLS LAST, so they silently shift every
    # running sum after them
    ev = finite_measures(
        load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,6)")).over(frame).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "g1_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DECIMAL(32,2)) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping-sets aggregation (hierarchical subtotals in one shuffle)",
)
def g1_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("decimal(32,2)").cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "j1_semi_anti_join",
    oracle="""
    SELECT 'semi' AS side, count(*) AS n FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    UNION ALL
    SELECT 'anti' AS side, count(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
    doc="Semi/anti join pair (EXISTS / NOT EXISTS plan shapes)",
)
def j1_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    semi = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    anti = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
    return semi.agg(F.count(F.lit(1)).alias("n")).select(F.lit("semi").alias("side"), "n").unionAll(
        anti.agg(F.count(F.lit(1)).alias("n")).select(F.lit("anti").alias("side"), "n")
    )
