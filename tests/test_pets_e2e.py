"""End-to-end pets pipeline over the real 17-column schema (FIXTURES.md §1):
a ~200-row deterministic fixture with every row-mix the reference's rules
target, pushed through the complete composition —

  placeholder filter (F1) → null-ratio validity (F2) → key-dedup (D1)
  → column-preserving upsert (D2) → compaction delete (D3)
  → export encode → CSV → scan decode (S5→S3)

— and checked against an independent pure-Python reimplementation of the
reference's rules (the golden)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.dedup import (
    compaction_delete,
    key_dedup,
    upsert_merge,
)
from petfinder_database_distributor_spark.operators.filters import (
    null_ratio_filter,
    placeholder_name_filter,
)
from petfinder_database_distributor_spark.schema import (
    PETS_BOOL_FIELDS,
    PETS_FIELDS,
)
from petfinder_database_distributor_spark.sources.export import (
    decode_from_export,
    encode_for_export,
    read_csv_table,
    write_csv_table,
)
from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT

STRING_FIELDS = [f for f in PETS_FIELDS if f not in PETS_BOOL_FIELDS and f not in ("link",)]
CHECKED_STRINGS = [f for f in STRING_FIELDS if f != "pet_type"]


def _fixture_rows() -> list[dict]:
    """200 deterministic rows hitting every FIXTURES.md §1 mix."""
    rows = []
    placeholders = ["dog", " Cat ", "CAT", "dog "]
    for i in range(200):
        r = {f: f"{f}_{i}" for f in STRING_FIELDS}
        r["link"] = f"https://www.petfinder.com/dog/pet-{i}/details/"
        r["pet_type"] = "dog" if i % 2 == 0 else "cat"
        for b in PETS_BOOL_FIELDS:
            r[b] = True
        if i % 20 == 0:
            r["name"] = placeholders[(i // 20) % len(placeholders)]  # F1 target
        if i % 10 == 1:  # 8 of 15 missing → F2 drops (53.3%)
            for f in CHECKED_STRINGS[:8]:
                r[f] = ""
        if i % 10 == 2:  # 7 of 15 missing → F2 keeps (46.7%)
            for f in CHECKED_STRINGS[:7]:
                r[f] = ""
        if i % 10 == 3:  # all booleans False — PRESENT values, F2 keeps
            for b in PETS_BOOL_FIELDS:
                r[b] = False
        if i % 10 == 4:  # tri-state: all booleans unknown (6 of 15 missing)
            for b in PETS_BOOL_FIELDS:
                r[b] = None
        rows.append(r)
    return rows


def _golden_links(rows: list[dict]) -> set[str]:
    """Pure-Python reimplementation of F1 + F2 (reference semantics)."""
    kept = set()
    for r in rows:
        if r["name"].strip().lower() in ("dog", "cat"):
            continue
        missing = sum(
            1 for f in CHECKED_STRINGS if not (r[f] or "").strip()
        ) + sum(1 for b in PETS_BOOL_FIELDS if r[b] is None)
        if missing / 15.0 >= 0.5:
            continue
        kept.add(r["link"])
    return kept


def test_pets_pipeline_end_to_end(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(
        [tuple(r[f] for f in PETS_FIELDS) for r in rows],
        schema=", ".join(
            f"{f} {'boolean' if f in PETS_BOOL_FIELDS else 'string'}" for f in PETS_FIELDS
        ),
    )

    validated = null_ratio_filter(
        placeholder_name_filter(df), CHECKED_STRINGS, PETS_BOOL_FIELDS, 0.5
    )
    deduped = key_dedup(validated, ["link"])
    assert {r["link"] for r in deduped.select("link").collect()} == _golden_links(rows)

    # D2: partial-column update batch + brand-new rows
    upd_rows = [
        ("https://www.petfinder.com/dog/pet-6/details/", "Renamed6", None),
        ("https://www.petfinder.com/dog/pet-NEW/details/", "Newbie", "NewCity"),
    ]
    updates = spark.createDataFrame(upd_rows, "link string, name string, location string")
    full_updates = updates.select(
        "link",
        *[
            F.col(c) if c in ("name", "location") else F.lit(None).cast(
                "boolean" if c in PETS_BOOL_FIELDS else "string"
            ).alias(c)
            for c in PETS_FIELDS
            if c != "link"
        ],
    )
    merged = upsert_merge(
        deduped, full_updates, ["link"], [c for c in PETS_FIELDS if c != "link"]
    )
    got = {
        r["link"]: r
        for r in merged.filter(
            F.col("link").isin([u[0] for u in upd_rows])
        ).collect()
    }
    r6 = got["https://www.petfinder.com/dog/pet-6/details/"]
    assert r6["name"] == "Renamed6" and r6["location"] == "location_6"  # preserved
    assert r6["spayed_neutered"] is True  # absent column preserved
    rn = got["https://www.petfinder.com/dog/pet-NEW/details/"]
    assert rn["name"] == "Newbie" and rn["breed"] is None

    # D3: compaction removes dead links
    dead = merged.filter(F.col("link").rlike("pet-1[0-9]/details")).select("link")
    n_dead = dead.count()
    compacted = compaction_delete(merged, dead, ["link"])
    assert compacted.count() == merged.count() - n_dead

    # S5→S3: full on-disk round trip preserves the tri-state exactly
    path = f"{SCRATCH_ROOT}/test_pets_e2e_csv"
    shutil.rmtree(path, ignore_errors=True)
    encoded = encode_for_export(
        compacted,
        string_cols=["link", *STRING_FIELDS],
        bool_cols=PETS_BOOL_FIELDS,
        text_cols=["about_me"],
        column_order=PETS_FIELDS,  # P4: the declared 17-column order
    )
    write_csv_table(encoded, path, single_file=True)
    back = decode_from_export(
        read_csv_table(
            spark, path, ", ".join(f"{f} string" for f in PETS_FIELDS)
        ),
        PETS_BOOL_FIELDS,
    )
    assert back.count() == compacted.count()
    tri = {
        r["link"]: (r["spayed_neutered"], r["vaccinated"])
        for r in back.collect()
    }
    src = {
        r["link"]: (r["spayed_neutered"], r["vaccinated"])
        for r in compacted.collect()
    }
    assert tri == src  # True/False/None all survive the CSV boundary
