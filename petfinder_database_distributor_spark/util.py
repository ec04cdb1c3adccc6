"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the cluster's parallelism.

    Why: CPU-heavy narrow operators (xpath projection, shingle hashing,
    mapInPandas decode) pipeline inside the scan stage — if the scan yields
    one partition (small single-row-group parquet files do), the whole
    operator serializes onto one core. At real scale the input already has
    >= cores partitions and this is a no-op: no shuffle is inserted, so the
    100 TB plan is unchanged.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
