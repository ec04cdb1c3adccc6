"""Corpus-curation + layout-planning ops: boilerplate suppression must
broadcast its (tiny by construction) common-chunk set, the percentile
filter must keep ~75% of every language, and the compaction planner's
bins must be contiguous runs of the key order."""

from __future__ import annotations

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.registry import load_all
from tests.conftest import SF_ORACLE, SF_SMALL
from tests.test_plan_quality import plan_of

SPECS = load_all()


def test_boilerplate_common_set_is_broadcast(spark):
    """The common-chunk set joins back onto the corpus-sized chunk stream
    via broadcast — a shuffled join here would re-shuffle every chunk a
    second time for a dimension that is tiny by construction."""
    p = plan_of(spark, "corpus_boilerplate_strip")
    assert "BroadcastHashJoin" in p, "common-set join must broadcast"


def test_boilerplate_accounting(spark):
    """Per-doc chunk accounting: boilerplate never exceeds total chunks,
    and a full-token doc (no boilerplate) keeps every token. The planted
    near-duplicate docs guarantee a non-empty common set."""
    rows = SPECS["corpus_boilerplate_strip"].fn(spark, SF_SMALL).collect()
    assert rows, "non-empty corpus must produce rows"
    assert any(r.n_common > 0 for r in rows), (
        "the planted duplicate documents must surface boilerplate chunks"
    )
    for r in rows:
        assert 0 <= r.n_common <= r.n_chunks
        # kept_tokens counts only non-common chunks: bounded by 8/chunk
        assert r.kept_tokens <= (r.n_chunks - r.n_common) * 8


def test_percentile_filter_keeps_three_quarters_per_lang(spark):
    """Relative filtering is per-language: every language with n docs
    keeps exactly the docs whose unique (quality, doc_id) rank is at or
    above the 25th percentile — n - ceil((n-1)/4) of them."""
    kept = (
        SPECS["quality_percentile_filter"]
        .fn(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    from petfinder_database_distributor_spark.schema import load_table

    totals = (
        load_table(spark, SF_ORACLE, "documents")
        .filter(F.col("doc_id").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    for r in totals.join(kept, "lang", "left").collect():
        n, k = r.n, r.k or 0
        # percent_rank >= 0.25 over unique ranks keeps rows with
        # rank-1 >= 0.25*(n-1): n - ceil(0.25*(n-1)) rows
        import math

        expect = n - math.ceil(0.25 * (n - 1)) if n > 1 else n
        assert k == expect, f"lang {r.lang}: kept {k}, expected {expect} of {n}"


def test_compaction_bins_are_contiguous_and_sized(spark):
    """bin_id must be non-decreasing in (source, lang) order (each bin is
    a contiguous run of the layout order) and reproduce the greedy
    cumulative-size assignment exactly."""
    rows = sorted(
        SPECS["compaction_bin_pack"].fn(spark, SF_SMALL).collect(),
        key=lambda r: (r.source, r.lang),
    )
    cum, prev_bin = 0, 0
    for r in rows:
        assert r.bin_id == cum // 5000, f"{r.source}/{r.lang}: wrong bin"
        assert r.bin_id >= prev_bin, "bins must be contiguous in key order"
        prev_bin = r.bin_id
        cum += r.size_chars
    assert prev_bin > 0, "fixture must span multiple bins"


def test_percentile_filter_keeps_singleton_language(spark, tmp_path):
    """A language with exactly ONE document must be kept: percent_rank is
    0 for a 1-row partition in both engines, so without the explicit
    n_lang guard the relative cut would discard exactly the low-resource
    language it exists to protect. Verified against the oracle on a
    fixture with an injected singleton language."""
    import shutil

    import duckdb

    tmp = str(tmp_path / "singleton")
    import os

    os.makedirs(tmp)
    con = duckdb.connect()
    con.execute(f"""COPY (
      SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')
      UNION ALL SELECT 77777, 'lone document of its language', 'xx', 'src0', 29
    ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", f"{tmp}/{t}.parquet")

    from tests.oracle_compare import assert_parity, run_oracle

    spec = SPECS["quality_percentile_filter"]
    df = spec.fn(spark, tmp)
    assert_parity(df, run_oracle(spec.oracle, tmp), "quality_percentile_filter")
    kept_xx = df.filter(F.col("lang") == "xx").collect()
    assert len(kept_xx) == 1 and kept_xx[0].doc_id == 77777


def test_validate_constraints_single_scan(spark):
    """All five rules must evaluate over ONE scan of events — a per-rule
    scan (the naive UNION the oracle states) would read the corpus five
    times."""
    p = plan_of(spark, "validate_constraints")
    assert p.count("events.parquet") == 1, "rules must share one scan"


def test_validate_constraints_rule_values(spark):
    rows = {r.rule: r for r in SPECS["validate_constraints"].fn(spark, SF_SMALL).collect()}
    assert set(rows) == {
        "event_id_complete", "event_id_unique", "user_id_complete",
        "value_non_negative", "event_type_in_domain", "value_finite",
        "value_in_range", "vec_id_unique", "value_mass_parity",
    }
    # the non-finite contract's reporting rule (r12): clean fixture = 0
    assert rows["value_finite"].n_violations == 0
    # the shipped fixture is clean on these rules; the null-fixture parity
    # run (tests/test_null_robustness.py) exercises the violation paths
    assert rows["event_id_complete"].n_violations == 0
    assert rows["event_id_unique"].n_violations == 0
    # the r14 dup-key contract's reporting rule: clean fixture = 0
    assert rows["vec_id_unique"].n_violations == 0
    # the r14 aggregate-parity guard (r13 ADVICE #1): the fixture's decimal
    # mass sits orders below the 2^53 wall, so the flag must be 0
    assert rows["value_mass_parity"].n_violations == 0
    assert all(r.n_checked > 0 for r in rows.values())


def test_kanonymity_flags_only_small_groups(spark):
    rows = SPECS["kanonymity_check"].fn(spark, SF_SMALL).collect()
    assert rows, "fixture must contain risky quasi-groups"
    assert all(0 < r.group_size < 5 for r in rows)


def test_schema_evolution_union_schema(spark):
    df = SPECS["parquet_schema_evolution"].fn(spark, SF_SMALL)
    rows = df.collect()
    gen1 = [r for r in rows if r.lang is not None]
    gen2 = [r for r in rows if r.n_chars is not None]
    assert gen1 and gen2, "both generations must survive the merged read"
    assert all(r.n_chars is None for r in gen1), "gen-1 rows lack the late column"
    assert all(r.lang is None for r in gen2), "gen-2 rows lack the early column"
