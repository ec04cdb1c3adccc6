"""Table-maintenance: small-file compaction (the T4-adjacent job every
long-running ingest needs — thousands of per-batch files merged into
size-targeted ones without changing the data)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT
from tests.conftest import SF_SMALL


def test_compact_small_files_preserves_data(spark):
    src = f"{SCRATCH_ROOT}/test_compact_src"
    dst = f"{SCRATCH_ROOT}/test_compact_dst"
    for d in (src, dst):
        shutil.rmtree(d, ignore_errors=True)
    ev = load_table(spark, SF_SMALL, "events")
    # simulate a fragmented ingest: 64 tiny files
    ev.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64

    fragmented = spark.read.parquet(src)
    # compaction: coalesce to a target file count (here 4); coalesce avoids
    # a shuffle entirely — it just concatenates scan partitions
    fragmented.coalesce(4).write.parquet(dst)
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 4

    a = sorted(r["event_id"] for r in spark.read.parquet(dst).collect())
    b = sorted(r["event_id"] for r in ev.collect())
    assert a == b
