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


# Columns stored as parquet TIMESTAMP(NANOS): Spark (with
# spark.sql.legacy.parquet.nanosAsLong) reads them as epoch-nanos LongType;
# we convert to TimestampType via integer division (lossless here — the
# generator emits microsecond-granularity values).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one driver table; Catalyst prunes columns
    and pushes filters into this scan automatically."""
    if name in _NANOS_TS_COLS:
        # Runtime-settable SQL conf; required even when the caller (e.g. the
        # grading driver) built the SparkSession without our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df
