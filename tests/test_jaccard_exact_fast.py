"""The hot_cap (salted two-phase count-based) Jaccard path must be EXACTLY
equivalent to the raw inverted-index join — same pairs, same values — on
fixtures chosen to stress both legs: heavy replication (every shingle hot,
the salted (shingle, i, j) grid carrying real traffic) and near-threshold
pairs. The pairing argument is completeness-critical: every pair must meet
the grid at exactly (i=bucket(a), j=bucket(b)) — a double-count would
inflate intersection counts and a miss would drop a qualifying pair, and
sf0.01 parity might not catch either — so this pins equivalence on
adversarial inputs. (A prefix-filter/SSJoin variant was measured worse
under quadratic-output stress and dropped; see PLANS.md.)"""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
    ngram_jaccard_pairs,
)


def pairs_of(df):
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in df.collect()
    }


def make_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox jumps over the lazy cat near the river bank",
    "a completely different sentence about spark physical plans and shuffles",
    "a completely different sentence about spark logical plans and shuffles",
    "short one two three",
    "short one two four",
    "the quick brown fox jumps over the lazy dog near the river bend",
]


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_hot_cap_path_equals_raw_join(spark, threshold):
    docs = make_docs(spark, BASE_TEXTS)
    raw = pairs_of(
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=threshold, max_join_rows=None
        )
    )
    fast = pairs_of(
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=threshold, hot_cap=64
        )
    )
    assert fast == raw
    assert raw, "fixture must actually produce qualifying pairs"


def test_hot_cap_path_exact_under_heavy_replication(spark):
    # 8 replicas of each base text (distinct ids): every shingle's df
    # multiplies by 8, pushing prefix shingles over a tiny hot_cap so the
    # salted grid leg carries real traffic (hot_cap=4 → every df>=7 salts).
    texts = [t for t in BASE_TEXTS for _ in range(8)]
    docs = make_docs(spark, texts)
    raw = pairs_of(
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, max_join_rows=None
        )
    )
    fast = pairs_of(
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, hot_cap=4)
    )
    assert fast == raw
    # replicas are exact dups of each other: J=1.0 pairs must all be there
    assert sum(1 for v in raw.values() if v == 1.0) >= 7 * (8 * 7 // 2)


def test_df_cap_and_hot_cap_mutually_exclusive(spark):
    docs = make_docs(spark, BASE_TEXTS)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ngram_jaccard_pairs(docs, "doc_id", "text", df_cap=8, hot_cap=8)


def test_choose_jaccard_posture_decision_rule():
    from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
        JACCARD_DIRECT_MAX_POSTINGS_SQ,
        choose_jaccard_posture,
    )

    assert choose_jaccard_posture(None) == "direct"  # empty corpus
    assert choose_jaccard_posture(0) == "direct"
    assert choose_jaccard_posture(JACCARD_DIRECT_MAX_POSTINGS_SQ) == "direct"
    assert choose_jaccard_posture(JACCARD_DIRECT_MAX_POSTINGS_SQ + 1) == "salted"
    assert choose_jaccard_posture(100, direct_max=99) == "salted"
    assert choose_jaccard_posture(100, direct_max=100) == "direct"


@pytest.mark.parametrize("direct_max", [0, 10**9])
def test_auto_posture_exact_at_both_postures(spark, direct_max):
    # direct_max=0 forces the salted leg, direct_max=1e9 the direct leg;
    # the chooser must be invisible in the results either way.
    from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
        ngram_jaccard_pairs_auto,
    )

    texts = [t for t in BASE_TEXTS for _ in range(4)]
    docs = make_docs(spark, texts)
    raw = pairs_of(
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, max_join_rows=None
        )
    )
    auto = pairs_of(
        ngram_jaccard_pairs_auto(
            docs, "doc_id", "text", n=3, threshold=0.5, direct_max=direct_max
        )
    )
    assert auto == raw
    assert raw


def test_chooser_flips_posture_under_duplication(spark):
    """The posture decision on REAL measured estimates: the base fixture
    stays under the direct bound, 12x replication (every replica a full
    near-dup) pushes Σdf² over it — the flip the 8x scaling probe observed
    by timing, pinned here by assertion."""
    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
        choose_jaccard_posture,
        with_shingles,
    )

    def est_of(docs):
        sh = with_shingles(docs, "doc_id", "text", 3)
        return (
            sh.select(F.explode("sh").alias("s"))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")))
            .collect()[0][0]
        )

    base = make_docs(spark, BASE_TEXTS * 40)
    heavy = make_docs(spark, BASE_TEXTS * 40 * 12)
    e_base, e_heavy = est_of(base), est_of(heavy)
    assert e_heavy > e_base * 100, "duplication must grow Sigma-df^2 quadratically"
    assert choose_jaccard_posture(e_base) == "direct"
    assert choose_jaccard_posture(e_heavy) == "salted"
