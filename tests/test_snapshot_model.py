"""Model-based randomized sequence test for the snapshot table format.

The directed suite (tests/test_snapshot_table.py) pins each operation and
a set of hand-picked interactions; this walk checks COMPOSITIONS the
directed tests don't enumerate: seeded random sequences of
write / append / delete / merge / compact / restore / vacuum, with a
pure-Python reference model tracking, per version, the file-row multiset
and the accumulated tombstone keys — exactly the two things a manifest
records. After every op the current read must equal the model; at the end
every RETAINED version's time-travel read must equal the model and every
vacuumed version must refuse.

Reference semantics (from the implementation + directed tests):
- write(df):    rows = df, tombstones = {}
- append(df):   rows += df, tombstones carry (appended rows with
                tombstoned keys stay filtered — resurrection is merge's)
- delete(keys): rows carry, tombstones += keys
- merge(upd):   rows = winner-per-key(visible ∪ upd, max order),
                tombstones = {} (folded)
- compact:      rows = visible, tombstones = {} (folded), content equal
- restore(tv):  rows = rows(tv), tombstones = tombstones(tv) (manifest
                carry-forward — including the target's tombstones)
- read(v):      rows(v) minus rows whose key is tombstoned at v
"""

from __future__ import annotations

import random
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from petfinder_database_distributor_spark.sources.snapshot import (
    snapshot_append,
    snapshot_compact,
    snapshot_delete,
    snapshot_merge,
    snapshot_read,
    snapshot_restore,
    snapshot_vacuum,
    snapshot_write,
)
from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT

SCHEMA = "k long, v long, o long"
KEYS = list(range(12))  # small key space → frequent collisions on purpose


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _visible(rows, tombs):
    return sorted(r for r in rows if r[0] not in tombs)


def _read(spark, table_dir, version=None):
    return sorted(
        tuple(r) for r in snapshot_read(spark, table_dir, version).collect()
    )


def _winner(rows):
    best = {}
    for r in rows:
        if r[0] not in best or r[2] > best[r[0]][2]:
            best[r[0]] = r
    return sorted(best.values())


@pytest.mark.parametrize("seed", [11, 42])
def test_snapshot_random_walk_matches_model(spark, seed):
    rng = random.Random(seed)
    table_dir = f"{SCRATCH_ROOT}/snapshot_model_walk_{seed}"
    shutil.rmtree(table_dir, ignore_errors=True)

    t = 0  # strictly-increasing order column — no winner ties, ever

    def batch(n):
        nonlocal t
        out = []
        for _ in range(n):
            t += 1
            out.append((rng.choice(KEYS), rng.randrange(1000), t))
        return out

    # version -> (file-row multiset, tombstone key set); None = vacuumed
    model: dict[int, tuple[list, set] | None] = {}
    first = batch(4)
    v = snapshot_write(spark, table_dir, _df(spark, first))
    model[v] = (list(first), set())

    for step in range(24):
        rows, tombs = model[v]
        op = rng.choices(
            ["append", "merge", "delete", "compact", "restore", "vacuum"],
            weights=[30, 25, 20, 8, 9, 8],
        )[0]
        if op == "append":
            b = batch(rng.randint(1, 3))
            v = snapshot_append(spark, table_dir, _df(spark, b))
            model[v] = (rows + b, set(tombs))
        elif op == "merge":
            b = batch(rng.randint(1, 3))
            v = snapshot_merge(
                spark, table_dir, _df(spark, b), key_cols=["k"], order_cols=["o"]
            )
            model[v] = (_winner(_visible(rows, tombs) + b), set())
        elif op == "delete":
            ks = sorted(rng.sample(KEYS, rng.randint(1, 3)))
            v = snapshot_delete(
                spark,
                table_dir,
                spark.createDataFrame([(k,) for k in ks], "k long"),
                ["k"],
            )
            model[v] = (list(rows), tombs | set(ks))
        elif op == "compact":
            v = snapshot_compact(spark, table_dir, target_files=1)
            model[v] = (_visible(rows, tombs), set())
        elif op == "restore":
            retained = [w for w, m in model.items() if m is not None]
            tv = rng.choice(retained)
            v = snapshot_restore(table_dir, tv)
            trows, ttombs = model[tv]
            model[v] = (list(trows), set(ttombs))
        else:  # vacuum
            keep = rng.randint(2, 4)
            dropped = snapshot_vacuum(table_dir, keep_last=keep)
            expected = sorted(w for w in model if model[w] is not None)[:-keep]
            assert dropped == expected, f"step {step}: vacuum dropped {dropped}"
            for w in dropped:
                model[w] = None
            continue  # vacuum makes no new version

        got = _read(spark, table_dir)
        rows_v, tombs_v = model[v]
        assert got == _visible(rows_v, tombs_v), (
            f"seed {seed} step {step} op {op} v{v}: read != model"
        )

    # end-state: every retained version time-travels to its model state,
    # every vacuumed version refuses
    for w, m in model.items():
        if m is None:
            with pytest.raises(FileNotFoundError):
                snapshot_read(spark, table_dir, w).collect()
        else:
            assert _read(spark, table_dir, w) == _visible(*m), f"v{w} drifted"
    shutil.rmtree(table_dir, ignore_errors=True)
