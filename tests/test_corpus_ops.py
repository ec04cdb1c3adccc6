"""Round-7 corpus-curation operators: incremental ingest dedup against a
committed MinHash index, and domain token-budget sampling. The DuckDB
value-hash parity lives in test_oracle_parity; these tests pin the
MECHANICS the oracle can't see — index staging/commit lifecycle,
decision-set invariants, budget maximality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.plans.corpus_ops import (
    _corpus_index_table,
    dedup_incremental_batch,
    domain_budget_sample,
)
from petfinder_database_distributor_spark.operators.text import md5int, token_count
from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.sources.snapshot import (
    latest_version,
    snapshot_read,
)
from tests.conftest import SF_SMALL


def test_incremental_dedup_index_lifecycle(spark):
    """First call stages the corpus index as snapshot v0 and commits the
    admitted batch's signatures as v1; repeat calls reuse the staging
    (version chain does NOT grow) and return identical decisions."""
    first = {r["doc_id"]: (r["dup_of"], r["admitted"])
             for r in dedup_incremental_batch(spark, SF_SMALL).collect()}
    table = _corpus_index_table(spark, SF_SMALL)
    assert latest_version(table) == 1, "corpus v0 + one admit-merge v1"
    second = {r["doc_id"]: (r["dup_of"], r["admitted"])
              for r in dedup_incremental_batch(spark, SF_SMALL).collect()}
    assert second == first
    assert latest_version(table) == 1, "repeat calls must not re-commit"

    # v1 = corpus index ∪ admitted batch signatures, nothing else: batch
    # ids in the index are exactly the admitted ones (16 bands each), and
    # v0 (the dedup read view) contains NO batch ids at all.
    admitted = {d for d, (_, ok) in first.items() if ok}
    v0_ids = {r["doc_id"] for r in
              snapshot_read(spark, table, version=0).select("doc_id").distinct().collect()}
    assert not v0_ids & set(first), "v0 is corpus-only"
    v1 = snapshot_read(spark, table, version=1)
    v1_batch = {r["doc_id"]: r["n"] for r in
                v1.join(spark.createDataFrame([(d,) for d in sorted(first)], "doc_id long"),
                        "doc_id", "leftsemi")
                .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(v1_batch) == admitted, "index admits exactly the survivors"
    assert all(n == 16 for n in v1_batch.values()), "16 band rows per doc"


def test_incremental_dedup_decision_invariants(spark):
    """Every batch document gets exactly one decision; a rejected doc's
    representative is either a corpus id or an EARLIER batch id (the
    non-recursive first-occurrence rule — never a later id, never
    itself)."""
    dec = dedup_incremental_batch(spark, SF_SMALL).collect()
    batch_ids = {r["doc_id"] for r in dec}
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    expect = {r["doc_id"] for r in
              docs.filter(F.col("doc_id") % 5 == 0).select("doc_id").collect()}
    assert batch_ids == expect and len(dec) == len(expect)
    for r in dec:
        if r["admitted"]:
            assert r["dup_of"] is None
        else:
            assert r["dup_of"] is not None and r["dup_of"] != r["doc_id"]
            if r["dup_of"] % 5 == 0:  # batch-internal representative
                assert r["dup_of"] < r["doc_id"]


def test_incdedup_trigger_replay_idempotent(spark, tmp_path):
    """r15 append-first trigger fusion: replaying a trigger (any crash
    between the signature append and the offset commit re-runs the whole
    foreachBatch body) must not change decision VALUES. The replayed
    run probes an index that already holds its own signatures — once
    from each attempt — and cid < bid must keep them inert; the
    decisions parquet then holds duplicate rows with IDENTICAL values,
    which the read-back dropDuplicates collapses deterministically.
    (Pre-r15 this was a real hole: the unfiltered corpus probe leg
    self-matched a replayed batch at Jaccard 1.)"""
    from petfinder_database_distributor_spark.plans.corpus_ops import (
        _incdedup_trigger,
    )

    run = str(tmp_path / "incdedup_replay")
    table_dir, dec_dir = f"{run}/index", f"{run}/decisions"
    all_docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    ids = sorted(r["doc_id"] for r in all_docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    b1 = all_docs.filter(F.col("doc_id") < cut)
    b2 = all_docs.filter(F.col("doc_id") >= cut)

    _incdedup_trigger(table_dir, dec_dir, all_docs, b1)
    _incdedup_trigger(table_dir, dec_dir, all_docs, b2)
    once = {
        r["doc_id"]: (r["dup_of"], r["admitted"])
        for r in spark.read.parquet(dec_dir).dropDuplicates(["doc_id"]).collect()
    }
    assert set(once) == set(ids)

    # replay trigger 2 (crash after append + decisions, before offset commit)
    _incdedup_trigger(table_dir, dec_dir, all_docs, b2)
    dec = spark.read.parquet(dec_dir)
    # every doc's decision rows agree in VALUE (dropDuplicates is then
    # order-independent), and the collapsed set equals the clean run
    conflicting = (
        dec.groupBy("doc_id")
        .agg(F.countDistinct(F.struct("dup_of", "admitted")).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert conflicting == 0, "replayed trigger changed a decision value"
    replayed = {
        r["doc_id"]: (r["dup_of"], r["admitted"])
        for r in dec.dropDuplicates(["doc_id"]).collect()
    }
    assert replayed == once


def test_domain_budget_sample_cap_and_maximality(spark):
    """Per domain: kept tokens never exceed the equal-share budget, and
    the kept set is MAXIMAL — the next document in admit (hash) order
    would overflow the budget. Together these pin the semantics without
    restating the oracle."""
    kept = domain_budget_sample(spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    tt = docs.select(
        "doc_id", "source",
        token_count(F.col("text")).cast("long").alias("n_tok"),
        md5int(F.col("doc_id").cast("string")).alias("hkey"),
    ).collect()
    budget_row = (
        docs.select(token_count(F.col("text")).cast("long").alias("n"), "source")
        .agg(F.expr("sum(n) div (2 * count(DISTINCT source))").alias("b"))
        .collect()
    )
    budget = budget_row[0]["b"]
    kept_ids = {r["doc_id"] for r in kept}
    by_domain: dict = {}
    for r in tt:
        by_domain.setdefault(r["source"], []).append(r)
    kept_tok: dict = {}
    for r in kept:
        kept_tok[r["source"]] = kept_tok.get(r["source"], 0) + r["n_tok"]
    for dom, rows in by_domain.items():
        rows.sort(key=lambda r: (r["hkey"], r["doc_id"]))
        used = kept_tok.get(dom, 0)
        assert used <= budget, f"{dom}: {used} > budget {budget}"
        # maximality: the first non-kept doc in admit order must overflow
        cum = 0
        for r in rows:
            if r["doc_id"] in kept_ids:
                cum += r["n_tok"]
                continue
            assert cum + r["n_tok"] > budget, (
                f"{dom}: doc {r['doc_id']} was skippable but fit the budget"
            )
            break  # only the FIRST excluded doc is constrained (prefix rule)
        # prefix property: nothing kept after the first exclusion
        seen_excluded = False
        for r in rows:
            if r["doc_id"] not in kept_ids:
                seen_excluded = True
            elif seen_excluded:
                pytest.fail(f"{dom}: kept doc {r['doc_id']} after an excluded one")
