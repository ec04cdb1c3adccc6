"""T2 checkpoint/resume semantics (SURVEY.md §2.8): a restarted streaming
query with the same checkpointLocation processes ONLY data not yet recorded
in the offset log, and the final table equals the batch upsert."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.streaming.incremental import (
    SCRATCH_ROOT,
    latest_version,
    run_upsert_stream,
    stage_event_chunks,
)
from tests.conftest import SF_SMALL


def _expected_upsert(events_df):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events_df.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("user_id", "event_id")
    )


def _pairs(df):
    return sorted((r.user_id, r.event_id) for r in df.collect())


def test_checkpoint_resume(spark):
    full_stage = stage_event_chunks(spark, SF_SMALL, n_chunks=4)
    live = f"{SCRATCH_ROOT}/test_resume_live"
    run_dir = f"{SCRATCH_ROOT}/test_resume_run"
    shutil.rmtree(live, ignore_errors=True)
    os.makedirs(live)

    events = load_table(spark, SF_SMALL, "events")

    import glob as _glob

    def _copy_chunk(i: int) -> None:
        for src in _glob.glob(f"{full_stage}/chunk_{i}_*.parquet"):
            shutil.copy(src, f"{live}/{os.path.basename(src)}")

    # Phase 1: only chunks 0–1 exist; run to completion and "crash".
    for i in (0, 1):
        _copy_chunk(i)
    partial = run_upsert_stream(
        spark, live, run_dir, ["user_id"], ["ts", "event_id"], fresh=True
    )
    expect_partial = _expected_upsert(events.filter(F.col("event_id") % 4 <= 1))
    assert _pairs(partial.select("user_id", "event_id")) == _pairs(expect_partial)

    # Phase 2: more chunks arrive; restart with the SAME checkpoint.
    for i in (2, 3):
        _copy_chunk(i)
    final = run_upsert_stream(
        spark, live, run_dir, ["user_id"], ["ts", "event_id"], fresh=False
    )
    assert _pairs(final.select("user_id", "event_id")) == _pairs(_expected_upsert(events))

    # The offset log resumed (batch ids continued past phase 1) rather than
    # reprocessing from scratch: 4 single-file micro-batches → final v3.
    assert os.path.basename(latest_version(f"{run_dir}/table")) == "v3"
