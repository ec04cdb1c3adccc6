"""staged_once is THE staging-guard (six call sites stage through it);
its three behaviors carry every streaming/index query's determinism:
build exactly once, refuse a staging with no completion marker (crash
mid-build), and restage when the source table is newer (regenerated
testdata must never serve stale replicas)."""

from __future__ import annotations

import os
import shutil
import time

from petfinder_database_distributor_spark.streaming.incremental import (
    _STAGE_MEMO,
    SCRATCH_ROOT,
    staged_once,
)


def _fresh(tag):
    path = f"{SCRATCH_ROOT}/stagedonce_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    for p in (f"{path}._ok",):
        if os.path.exists(p):
            os.remove(p)
    _STAGE_MEMO.discard(path)
    return path


def test_builds_once_then_reuses(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_text("source")
    past = time.time() - 10
    os.utime(src, (past, past))  # avoid a same-instant marker/src mtime tie
    path = _fresh("reuse")
    calls = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        calls.append(p)

    assert staged_once(path, str(src), build) == path
    assert staged_once(path, str(src), build) == path
    _STAGE_MEMO.discard(path)  # simulate a new process: marker must carry
    assert staged_once(path, str(src), build) == path
    assert len(calls) == 1


def test_crashed_build_is_restaged(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_text("source")
    past = time.time() - 10
    os.utime(src, (past, past))
    path = _fresh("crash")
    boom = [True]
    calls = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        calls.append(p)
        if boom[0]:
            boom[0] = False
            raise RuntimeError("crash mid-staging")

    try:
        staged_once(path, str(src), build)
    except RuntimeError:
        pass
    assert not os.path.exists(f"{path}._ok"), "marker must be written LAST"
    _STAGE_MEMO.discard(path)
    assert staged_once(path, str(src), build) == path
    assert len(calls) == 2, "the crashed staging must rebuild, never reuse"


def test_regenerated_source_invalidates_staging(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_text("v1")
    path = _fresh("mtime")
    calls = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        calls.append(p)

    staged_once(path, str(src), build)
    # the driver regenerates testdata: source newer than the marker
    future = time.time() + 10
    os.utime(src, (future, future))
    _STAGE_MEMO.discard(path)  # new process (the memo is per-process)
    staged_once(path, str(src), build)
    assert len(calls) == 2, "stale staging must rebuild after source change"


def test_orphaned_marker_restages(tmp_path):
    """A marker whose stage dir was deleted (sibling _ok left behind —
    e.g. a partial scratch cleanup) must restage, not hand every caller a
    nonexistent directory."""
    src = tmp_path / "src.parquet"
    src.write_text("source")
    past = time.time() - 10
    os.utime(src, (past, past))
    path = _fresh("orphan")
    calls = []

    def build(p):
        os.makedirs(p, exist_ok=True)
        calls.append(p)

    staged_once(path, str(src), build)
    shutil.rmtree(path)  # ...but the _ok marker survives
    assert os.path.exists(f"{path}._ok")
    _STAGE_MEMO.discard(path)  # new process
    out = staged_once(path, str(src), build)
    assert os.path.exists(out), "must rebuild, never serve a ghost dir"
    assert len(calls) == 2
