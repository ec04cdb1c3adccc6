"""Join operators Spark lacks as primitives, composed from DataFrame ops
(north-star generalization layer; the reference itself has only the
anti/cross-join patterns — SURVEY.md §2.11).

- as-of join: the union+window technique — one shuffle on (keys), no
  per-key driver loops, no range explosion. Scales because the window sort
  is per-key and both inputs shuffle exactly once.
- range join (point-in-interval): bucketized equi-join — intervals explode
  into fixed-width buckets, points compute their bucket, the join runs on
  (bucket) as a plain hash join with a residual predicate. Turns an
  O(n·m) theta-join (BroadcastNestedLoop) into a shuffle-bounded equi-join;
  the broadcast-NLJ stays the right plan only when one side is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same key group (``backward``; the
    trades/quotes join). Implementation: tag both sides, union, and take
    ``last(value, ignorenulls)`` over a per-key window ordered by
    (ts, side) — right rows sort before left rows at equal ts, so ties
    match (<= semantics, like DuckDB/pandas ASOF).

    One shuffle total (the window partitioning); left rows with no prior
    right row keep nulls (left-outer semantics).

    Tie determinism AND single-row matches: several right rows can share
    (key, ts), so the window order appends the right-value STRUCT (nulls
    first), making the match the lexicographic MAX of the value tuple among
    equal-ts right rows — stable across partitionings and engines. The
    value columns travel as ONE struct and ``last(ignorenulls)`` is taken
    of that struct, so every ``matched_*`` column comes from the same right
    row (per-column ``last`` would back-fill a column that is NULL in the
    winning row from an earlier row, silently mixing two rows)."""
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    # left_ts travels as __ts and is renamed back at the end — excluding it
    # here keeps the output free of duplicate columns.
    from pyspark.sql import types as T

    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rv_type = T.StructType([right.schema[c] for c in right_value_cols])
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("__rv"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", F.col("__rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tagged.unionByName(r_tagged).select(
        *keys,
        "__ts",
        "__side",
        *lcols,
        F.last("__rv", ignorenulls=True).over(w).alias("__rv_m"),
    )
    return (
        matched.filter(F.col("__side") == 1)
        .select(
            *keys,
            "__ts",
            *lcols,
            *[F.col(f"__rv_m.{c}").alias(f"matched_{c}") for c in right_value_cols],
        )
        .withColumnRenamed("__ts", left_ts)
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join ([lo, hi) semantics) as a bucketized
    equi-join. Each interval is exploded into ceil(len/width) bucket rows;
    each point lands in exactly one bucket; the equi-join on (bucket) is a
    plain shuffled hash join and the residual ``lo <= p < hi`` removes
    same-bucket false positives. Pick ``bucket_width`` near the typical
    interval length: shuffle blow-up is then ~2× rows instead of |p|·|i|."""
    exploded = intervals.select(
        "*",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bucket_width).cast("long"),
                ((F.col(hi_col) - 1) / bucket_width).cast("long"),
            )
        ).alias("__bucket"),
    )
    bucketed_points = points.withColumn(
        "__bucket", (F.col(point_col) / bucket_width).cast("long")
    )
    residual: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    return bucketed_points.join(exploded, on="__bucket").filter(residual).drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int,
    salt_source: str,
) -> DataFrame:
    """Skew-defeating equi-join: the hot key's rows no longer land in one
    shuffle partition. Left rows get a deterministic salt (hash of
    ``salt_source`` mod n_salts); the right side is replicated n_salts×
    with every salt value; the join runs on (key, salt). Right-side
    replication costs n_salts× its size — use for small-to-medium right
    sides with a skewed left, or let AQE's skew-join handle it when
    statistics suffice (this is the manual shape for when they don't)."""
    salted_left = left.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    )
    salted_right = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    return salted_left.join(salted_right, on=[key, "__salt"]).drop("__salt")
