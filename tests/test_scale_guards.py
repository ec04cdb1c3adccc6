"""Scale guards on the dedup operators: the quadratic paths refuse loudly
instead of launching runaway shuffles (the posture
dedup_embedding_cosine_exact pioneered with its 100k all-pairs guard).

- ngram_jaccard_pairs (uncapped): the postings self-join produces exactly
  Σ df(s)² rows — quadratic in duplication (8x replicas → 19x wall,
  PLANS.md). A cheap df-count aggregate estimates the join size up front
  and raises above max_join_rows, pointing at df_cap.
- levenshtein_neardup_counts: deletion-variant postings scale with Σ len²,
  so a document-class text column must be rejected, not silently exploded —
  SymSpell is a short-string algorithm.
"""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
    levenshtein_neardup_counts,
    ngram_jaccard_pairs,
)
from petfinder_database_distributor_spark.schema import load_table
from tests.conftest import SF_SMALL


def test_jaccard_guard_refuses_heavy_duplication(spark):
    # 40 copies of the same text: Σdf² = (n_shingles) * 40² — tiny data,
    # huge relative blow-up; a low bound must trip before the join runs.
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="df_cap"):
        ngram_jaccard_pairs(df, "doc_id", "text", max_join_rows=1_000)
    # Same data passes with the cap (the deployable path) — and with the
    # guard bound raised (explicit override).
    assert ngram_jaccard_pairs(df, "doc_id", "text", df_cap=64).count() > 0
    assert (
        ngram_jaccard_pairs(df, "doc_id", "text", max_join_rows=10_000_000).count()
        > 0
    )


def test_jaccard_guard_passes_real_corpus(spark):
    # The registered uncapped query must keep running at test scale: the
    # default bound is far above the documents table's measured Σdf²
    # (54k at sf0.01) while still catching duplication blow-ups at scale.
    docs = load_table(spark, SF_SMALL, "documents")
    assert ngram_jaccard_pairs(docs, "doc_id", "text").count() >= 0


def test_levenshtein_guard_rejects_long_text(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="max_len"):
        levenshtein_neardup_counts(docs, "doc_id", "text")


def test_levenshtein_guard_disable_and_short_ok(spark):
    part = load_table(spark, SF_SMALL, "part")
    # part names are short — guard passes untouched
    out = levenshtein_neardup_counts(part, "p_partkey", "p_name")
    assert out.count() >= 0
    # explicit opt-out also works on short strings
    short = part.limit(50)
    assert (
        levenshtein_neardup_counts(short, "p_partkey", "p_name", max_len=None).count()
        >= 0
    )
