"""Physical-layout operators: bucketing for co-located (shuffle-free) joins.

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
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.registry import register
from petfinder_database_distributor_spark.schema import load_table
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
           CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DECIMAL(32,2))
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
