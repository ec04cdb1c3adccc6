"""Explicit schemas — the engine never relies on schema inference.

``PETS_SCHEMA`` mirrors the reference's fixed 17-column table
(``/root/reference/pet_scraper.py:341-361``; type semantics per SURVEY.md
§1.2–1.3: strings + six *nullable* booleans — Spark's nullable BooleanType
IS the reference's tri-state True/False/None). ``PETS_FIELDS`` preserves the
declared column order (the reference normalizes every row to exactly this
ordered set, ``pet_scraper.py:450``).

Testdata schemas cover the driver tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PETS_FIELDS: list[str] = [
    "link",
    "pet_type",
    "name",
    "location",
    "age",
    "gender",
    "size",
    "color",
    "breed",
    "spayed_neutered",
    "vaccinated",
    "special_needs",
    "kids_compatible",
    "dogs_compatible",
    "cats_compatible",
    "about_me",
    "image",
]

# The 6 tri-state boolean flags (parsed to True/False/None by the reference,
# pet_scraper.py:305-322).
PETS_BOOL_FIELDS: list[str] = [
    "spayed_neutered",
    "vaccinated",
    "special_needs",
    "kids_compatible",
    "dogs_compatible",
    "cats_compatible",
]

# The 15 fields checked by the validity / liveness filters (all except the
# primary key ``link`` and ``pet_type``, pet_scraper.py:379-385).
PETS_CHECKED_FIELDS: list[str] = [f for f in PETS_FIELDS if f not in ("link", "pet_type")]

PETS_SCHEMA = T.StructType(
    [
        T.StructField("link", T.StringType(), False),
        T.StructField("pet_type", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("age", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("size", T.StringType(), True),
        T.StructField("color", T.StringType(), True),
        T.StructField("breed", T.StringType(), True),
        T.StructField("spayed_neutered", T.BooleanType(), True),
        T.StructField("vaccinated", T.BooleanType(), True),
        T.StructField("special_needs", T.BooleanType(), True),
        T.StructField("kids_compatible", T.BooleanType(), True),
        T.StructField("dogs_compatible", T.BooleanType(), True),
        T.StructField("cats_compatible", T.BooleanType(), True),
        T.StructField("about_me", T.StringType(), True),
        T.StructField("image", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Tables whose parquet files carry naive (no-timezone) timestamp columns.
# Depending on the parquet physical type and the Spark version, such a column
# can surface three ways; load_table normalizes all of them to a plain
# TimestampType so downstream expressions (``unix_micros``, range frames,
# stream watermarks) behave identically across environments:
#   * ``timestamp``      — already the target type; no-op.
#   * ``timestamp_ntz``  — pyspark >= 4 reads parquet ``timestamp[us]``
#     (isAdjustedToUTC=false) as TIMESTAMP_NTZ; cast to ``timestamp``.
#   * ``bigint``         — parquet TIMESTAMP(NANOS) under
#     ``spark.sql.legacy.parquet.nanosAsLong`` (historical encoding).
_TS_TABLES: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one driver table; Catalyst prunes columns
    and pushes filters into this scan automatically."""
    if name in _TS_TABLES:
        # Runtime-settable SQL confs; required even when the caller (e.g. the
        # grading driver) built the SparkSession without our session factory.
        # UTC pin first: the ntz->timestamp cast below interprets the naive
        # value in the session timezone at *execution* time, and only under
        # UTC does the resulting instant agree with DuckDB's epoch_us over the
        # same naive values (ADVICE r3: a tz-dependent cast would silently
        # shift epochs instead of erroring).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TS_TABLES.get(name, ()):
        if c not in dtypes:
            continue
        if dtypes[c] == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dtypes[c] == "bigint":  # epoch-nanos; generator emits µs values
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


# ---------------------------------------------------------------------------
# Non-finite measure contract (round-11 continuation finding #2, landed
# round 12): CAST(double('NaN'|'Infinity') AS DECIMAL) is NULL in Spark 4
# (silently dropped by sums) but an Invalid Input Error in DuckDB, so ONE
# non-finite float in a measure column makes the oracle side of every
# decimal-exact aggregate ERROR while Spark quietly excludes the row — a
# red driver row from a single dirty record, and divergent results either
# way. Contract: a non-finite measurement is not an observation — rows
# whose measure is NaN/±Inf are excluded at the family entry on BOTH
# engines. NULL rows are deliberately KEPT (each query's own NULL
# contract governs them — this guard must not change NULL semantics, so
# clean-fixture and null-sweep hashes are unchanged by construction).
# ---------------------------------------------------------------------------

# Representable-range bound — WIDENED round 13 (r12 verdict #2: lift
# the envelope with wider kernels instead of fencing it). The family
# bound is the EXACT-ARITHMETIC ENVELOPE of its tightest member, and
# after widening the z-score quadratics the tightest member is the
# DECIMAL(18,6) entry cast itself:
#
#   * DECIMAL(18,6) representability: CAST(v AS DECIMAL(18,6)) RAISES
#     in DuckDB at |v| >= 1e12 (max 999,999,999,999.999999) — the hard
#     per-value wall. Double spacing at 1e12 is ~1.2e-4 > 1e-6, so the
#     6-dp rounding of any in-range double cannot tip over the wall.
#   * cents exactness: round(v*100) <= 1e14 < 2^53 — exact as a double
#     and in BIGINT (9.2e18 headroom) for every in-envelope value.
#   * z-score quadratics (the r12 binding constraint at |v|~3.8e6, now
#     DECIMAL(38,0)/HUGEINT — the embedding_dim_stats widening
#     pattern): worst term (n*c - s)^2 <= (16e14)^2 ~ 2.6e30 << 1e38.
#
# Aggregate-magnitude headroom (volume- not value-bound — GUARDED as of
# r14, the r13-advice fix): DOUBLE-typed decimal-sum outputs are
# last-bit parity-exact while |sum| * 10^scale < 2^53 (probed: DuckDB's
# decimal->double conversion mis-rounds the last bit past 2^53, Spark's
# is correctly rounded) — 9.0e13 at the contract's output scale 2;
# int64 cents totals hold to 9.2e18 cents and fail LOUDLY under ANSI
# beyond. Because groups partition rows, the decimal-exact total mass
# sum(|v|) bounds every group/window sum any registered query can form,
# so ONE flag covers the registry: validate_constraints' r14
# value_mass_parity rule reports when sum(|v|)*10^2 >= 2^53, and
# tests/test_dirty_data_contracts.py both pins every fixture's mass
# inside the envelope and witnesses the flag flipping (with cross-
# engine parity) on a beyond-mass fixture. A measurement outside the
# per-value envelope cannot flow through the exact pipeline — excluded
# like a non-finite one (loudly bounded semantics beat a one-record job
# kill at 100 TB); validate_constraints REPORTS such rows via its
# value_in_range rule.
MEASURE_RANGE = 1e12


def FINITE_SQL(col: str = "value") -> str:
    """DuckDB half of the contract: keep NULLs, drop NaN/±Inf and
    values outside the exactly-representable measure range."""
    return (
        f"({col} IS NULL OR (isfinite({col}) AND abs({col}) < {MEASURE_RANGE:.1f}))"
    )


def finite_measures(df: DataFrame, col: str = "value") -> DataFrame:
    """Spark half: same predicate, whole-stage-codegen comparisons only.

    NaN needs `isnan` (NaN != NaN comparisons are special-cased by
    Spark's NaN-ordering rules); ±Inf and the range bound are ordinary
    comparisons (the range check subsumes ±Inf, kept explicit for
    readability).
    """
    c = F.col(col)
    return df.filter(
        c.isNull()
        | (
            ~F.isnan(c)
            & (c != F.lit(float("inf")))
            & (c != F.lit(float("-inf")))
            & (F.abs(c) < F.lit(MEASURE_RANGE))
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-primary-key contract (round 14 — the fourth dirt class, same
# family as r12's zero-norm / non-finite / malformed-JSON three). The
# clean fixtures are generator-perfect: event_id and vec_id are unique.
# Real 100 TB corpora are not — a retried ingest batch or a re-shipped
# shard lands the same key twice, and a duplicate vec_id silently DOUBLES
# rows through every index join while a duplicate event_id breaks the
# dedup-replay and monotonicity assumptions. Contract: canonicalization
# keeps the FIRST occurrence per key, where "first" is defined by a
# CONTENT tiebreak — a total order over the row's other columns with
# ASC NULLS LAST pinned on both engines — NOT by file/scan order, which
# is neither deterministic under Spark's split planning nor portable to
# the oracle. Rows with a NULL key pass through untouched (they cannot
# collide; completeness rules report them). Full-content ties collapse
# to one row regardless of which copy wins — identical bytes, identical
# answer. Probed cross-engine before landing: lexicographic array
# compare (shorter-prefix-first), NaN > +Inf > finite, and NULLS LAST
# agree between Spark orderBy and DuckDB ORDER BY ... NULLS LAST.
# ---------------------------------------------------------------------------


def first_occurrence(df: DataFrame, key: str, tiebreak: list[str]) -> DataFrame:
    """Keep one row per non-null ``key``: the row that sorts first by
    ``tiebreak`` (ASC NULLS LAST per column — the deterministic,
    engine-portable definition of "first occurrence"). NULL-key rows are
    preserved as-is.

    One hash-partitioned shuffle on the key plus a within-partition sort
    (`row_number` over `Window.partitionBy(key)`); AQE's skew-join
    splitting applies to the shuffle, and map-side the scan stays a
    plain columnar read — no driver collect, no global sort. DuckDB
    twin: ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ...
    ASC NULLS LAST) = 1`` plus a UNION ALL of the NULL-key slice.
    """
    from pyspark.sql.window import Window

    cols = df.columns
    keyed = df.filter(F.col(key).isNotNull())
    order = [F.col(c).asc_nulls_last() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    canon = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )
    return canon.unionByName(df.filter(F.col(key).isNull()))


def first_occurrence_sql(table: str, key: str, tiebreak: list[str]) -> str:
    """The DuckDB twin of :func:`first_occurrence`, as a subquery string
    (kept next to the Spark side so the tiebreak order can never drift
    between engines)."""
    order = ", ".join(f"{c} ASC NULLS LAST" for c in tiebreak)
    return (
        f"(SELECT * FROM {table} WHERE {key} IS NOT NULL "
        f"QUALIFY row_number() OVER (PARTITION BY {key} ORDER BY {order}) = 1 "
        f"UNION ALL SELECT * FROM {table} WHERE {key} IS NULL)"
    )
