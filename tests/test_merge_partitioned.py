"""Dynamic-partition merge: partitions untouched by an update batch must
keep their files byte-identical (no read, no rewrite) — the property that
makes the upsert O(affected partitions) instead of O(table)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.dedup import merge_into_partitioned
from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT
from tests.conftest import SF_SMALL


def _file_state(table_dir: str, bucket: int) -> list[tuple[str, float, int]]:
    files = sorted(glob.glob(f"{table_dir}/bucket={bucket}/*.parquet"))
    return [(os.path.basename(f), os.path.getmtime(f), os.path.getsize(f)) for f in files]


def test_untouched_partitions_not_rewritten(spark):
    table_dir = f"{SCRATCH_ROOT}/test_merge_part"
    shutil.rmtree(table_dir, ignore_errors=True)
    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts", (F.col("user_id") % 8).alias("bucket")
    )
    base = ev.filter(F.col("event_id") % 4 != 3)
    merge_into_partitioned(spark, table_dir, base, ["user_id"], ["ts", "event_id"], "bucket")
    before = {b: _file_state(table_dir, b) for b in range(8)}

    updates = ev.filter((F.col("event_id") % 4 == 3) & (F.col("user_id") % 8 <= 1))
    merge_into_partitioned(spark, table_dir, updates, ["user_id"], ["ts", "event_id"], "bucket")

    for b in range(2, 8):
        assert _file_state(table_dir, b) == before[b], f"bucket {b} was rewritten"
    for b in (0, 1):
        assert _file_state(table_dir, b) != before[b], f"bucket {b} should change"

    # and the merged table is the correct upsert
    final = spark.read.parquet(table_dir)
    n_users = ev.select("user_id").distinct().count()
    assert final.count() == n_users
    assert final.groupBy("user_id").count().filter("count > 1").count() == 0
