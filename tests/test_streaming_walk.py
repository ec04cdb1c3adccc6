"""Randomized crash/resume walk for the streaming upsert pipeline (T1-T3).

The directed resume test (tests/test_streaming.py::test_checkpoint_resume)
stops once at a fixed cut with chunks arriving in chunk order; this walk
randomizes BOTH the arrival order and the crash points: a random
permutation of the staged micro-batch chunks is revealed in randomly-sized
phases, the availableNow query is killed (runs to drain) and restarted
from the SAME checkpoint between phases with a randomly varied per-trigger
pacing (max_files), and after every phase the committed table must equal
the batch upsert over exactly the revealed events — the exactly-once
contract under arrival orders and resume points the directed test never
tries."""

from __future__ import annotations

import glob
import os
import random
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.streaming.incremental import (
    SCRATCH_ROOT,
    run_upsert_stream,
    stage_event_chunks,
)
from tests.conftest import SF_SMALL

N_CHUNKS = 6


def _expected_pairs(events_df):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rows = (
        events_df.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select("user_id", "event_id")
        .collect()
    )
    return sorted((r.user_id, r.event_id) for r in rows)


@pytest.mark.parametrize(
    "seed,duplicate_overlap",
    [(5, False), (17, False), (29, True)],
    ids=["seed5", "seed17", "seed29-at-least-once"],
)
def test_random_arrival_and_resume_points_stay_exactly_once(
    spark, seed, duplicate_overlap
):
    """duplicate_overlap=True stages every event into TWO chunks (the
    at-least-once delivery the reference's dup-check defends against):
    the idempotent upsert must converge to the same batch answer no
    matter which of a row's two arrivals each random phase delivers."""
    rng = random.Random(seed)
    full_stage = stage_event_chunks(
        spark, SF_SMALL, n_chunks=N_CHUNKS, duplicate_overlap=duplicate_overlap
    )
    live = f"{SCRATCH_ROOT}/walk_resume_live_{seed}"
    run_dir = f"{SCRATCH_ROOT}/walk_resume_run_{seed}"
    shutil.rmtree(live, ignore_errors=True)
    os.makedirs(live)

    events = load_table(spark, SF_SMALL, "events")
    order = list(range(N_CHUNKS))
    rng.shuffle(order)
    # random phase sizes summing to N_CHUNKS (>= 2 phases)
    phases, left = [], N_CHUNKS
    while left:
        take = rng.randint(1, max(1, left - 1)) if left > 1 else 1
        phases.append(take)
        left -= take

    revealed: set[int] = set()
    first = True
    for size in phases:
        for cid in order[: len(revealed) + size][len(revealed):]:
            for src in glob.glob(f"{full_stage}/chunk_{cid}_*.parquet"):
                shutil.copy(src, f"{live}/{os.path.basename(src)}")
            revealed.add(cid)
        got = run_upsert_stream(
            spark,
            live,
            run_dir,
            ["user_id"],
            ["ts", "event_id"],
            fresh=first,
            max_files=rng.choice([1, 2, 3]),
        )
        first = False
        chunk_of = F.col("event_id") % N_CHUNKS
        seen = chunk_of.isin(sorted(revealed))
        if duplicate_overlap:  # each event also rides chunk (c+1) % N
            seen = seen | ((chunk_of + 1) % N_CHUNKS).isin(sorted(revealed))
        expect = _expected_pairs(events.filter(seen))
        assert (
            sorted((r.user_id, r.event_id) for r in got.select("user_id", "event_id").collect())
            == expect
        ), f"seed {seed}: drift after revealing {sorted(revealed)}"
    assert revealed == set(range(N_CHUNKS))
    shutil.rmtree(live, ignore_errors=True)
    shutil.rmtree(run_dir, ignore_errors=True)
