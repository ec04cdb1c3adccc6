"""Z-order layout: prove the pruning claim, not just the stats query.

Writing data repartitionByRange(morton) + sortWithinPartitions(morton)
must yield DISJOINT per-partition morton ranges — that is exactly the
property that turns parquet file-level min/max statistics into two-
dimensional pruning at 100 TB (a reader filtering on either user bucket
or time-of-day touches only the files whose morton interval intersects
the query's curve segments)."""

from __future__ import annotations

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.plans.mining import _morton_sql
from petfinder_database_distributor_spark.schema import load_table
from tests.conftest import SF_SMALL


def test_range_partition_by_morton_gives_disjoint_ranges(spark):
    ev = load_table(spark, SF_SMALL, "events")
    z = ev.select(
        (F.col("user_id") % 1024).alias("x"),
        F.expr("cast((hour(ts) * 60 + minute(ts)) div 2 AS bigint)").alias("y"),
    ).select("x", "y", F.expr(_morton_sql("x", "y", "shiftright({v}, {i})")).alias("morton"))

    parts = (
        z.repartitionByRange(8, "morton")
        .sortWithinPartitions("morton")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("morton").alias("lo"), F.max("morton").alias("hi"), F.count("*").alias("n"))
        .orderBy("pid")
        .collect()
    )
    assert sum(r["n"] for r in parts) == ev.count()
    ranges = [(r["lo"], r["hi"]) for r in parts if r["n"] > 0]
    for (lo, hi) in ranges:
        assert lo <= hi
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping morton ranges: {ranges}"

    # and the curve really is 2-D local: within any single morton range
    # bucket (the stats query's grouping), both dimensions are bounded to
    # a quadrant, not the full 1024 span.
    stats = (
        z.groupBy(F.expr("morton div 32768").alias("bucket"))
        .agg(F.min("x").alias("min_x"), F.max("x").alias("max_x"),
             F.min("y").alias("min_y"), F.max("y").alias("max_y"))
        .collect()
    )
    # bucket fixes morton bits 19..15 = (y9 x9 y8 x8 y7): x's top two and
    # y's top three bits are constant inside a bucket.
    for r in stats:
        assert r["max_x"] - r["min_x"] <= 255
        assert r["max_y"] - r["min_y"] <= 127


def test_snapshot_zorder_prunes_both_dimensions(spark):
    """After OPTIMIZE ZORDER, the snapshot DataSource prunes files for a
    range predicate on EITHER Morton dimension — the two-column data-
    skipping payoff single-column clustering can't give."""
    import shutil

    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.plans.mining import _morton_sql
    from petfinder_database_distributor_spark.sources.snapshot import (
        snapshot_write,
        snapshot_zorder,
    )
    from petfinder_database_distributor_spark.sources.snapshot_datasource import (
        register_snapshot_source,
    )
    from petfinder_database_distributor_spark.streaming.incremental import (
        SCRATCH_ROOT,
    )

    register_snapshot_source(spark)
    d = f"{SCRATCH_ROOT}/zorder_prune_test"
    shutil.rmtree(d, ignore_errors=True)
    df = spark.createDataFrame(
        [(i, (i * 37) % 1024, (i * 91) % 720) for i in range(4096)],
        "k long, x long, y long",
    )
    snapshot_write(spark, d, df)
    snapshot_zorder(
        spark,
        d,
        F.expr(_morton_sql("x", "y", "shiftright({v}, {i})")),
        target_files=8,
        stats_cols=["x", "y"],
    )
    base = spark.read.format("snapshot").load(d)
    total = base.rdd.getNumPartitions()
    assert total == 8
    x_narrow = base.filter(F.col("x").between(0, 127))
    y_narrow = base.filter(F.col("y").between(0, 89))
    assert x_narrow.rdd.getNumPartitions() < total
    assert y_narrow.rdd.getNumPartitions() < total
    # exactness survives pruning
    assert x_narrow.count() == df.filter(F.col("x").between(0, 127)).count()
    assert y_narrow.count() == df.filter(F.col("y").between(0, 89)).count()
    shutil.rmtree(d, ignore_errors=True)
