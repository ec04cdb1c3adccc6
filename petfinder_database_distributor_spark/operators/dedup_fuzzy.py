"""Fuzzy / near-duplicate detection for LLM-data pipelines (north star):
exact (fingerprint) dedup, blocked n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB posture):
- Never all-pairs. Candidate generation is always a *blocked equi-join*
  (LSH band buckets, or size bands) so the shuffle keys are
  (band, bucket-hash) — bounded fan-in, AQE-skew-handled. Exact similarity
  runs only on candidates.
- All hashes derive from the portable ``md5int`` (operators/text.py), so
  every stage is deterministic and oracle-checkable value-for-value.
- MinHash family: h_i(x) = ((2i+1)·(x mod P) + (17i+3)) mod P over the
  Mersenne prime P = 2^31-1; banding with r rows/band means two docs become
  candidates iff some band of their signatures agrees exactly — the
  standard LSH S-curve (Leskovec et al., Mining of Massive Datasets, ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.text import (
    MERSENNE_P,
    bag_of_words_fingerprint,
    md5int,
    shingles,
    tokens,
)


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact (order/repetition-invariant) dedup: fingerprint = md5 of sorted
    distinct tokens; keeps the smallest id as representative and counts the
    group. One hash-shuffle on the fingerprint."""
    fp = df.select(
        F.col(id_col), bag_of_words_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def with_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col), shingles(toks, n).alias("sh")
    ).filter(F.size("sh") > 0)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / union


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    band_width: int = 16,
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard, with size-band blocking:
    candidates must fall in adjacent shingle-count bands (near-dups have
    near-equal lengths), so the join is a bounded equi-join instead of
    all-pairs. Returns (id_a, id_b, jaccard ≥ threshold)."""
    sh = with_shingles(df, id_col, text_col, n)
    banded = sh.withColumn("band", F.floor(F.size("sh") / band_width))
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band"
    )
    pairs = left.join(right, on="band").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(sh: Column, k: int = 32) -> Column:
    """k-wide MinHash signature over a shingle array (portable hash family,
    see module docstring)."""
    hxs = F.transform(sh, lambda s: md5int(s) % MERSENNE_P)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(hxs, lambda x: ((2 * i + 1) * x + (17 * i + 3)) % MERSENNE_P)
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: signature → band buckets → equi-join on
    (band, bucket hash) → exact Jaccard verification ≥ threshold.

    The candidate join shuffles only (band, md5-of-r-values) keys — at 100 TB
    this is the only scalable shape for unknown-similarity dedup (no
    all-pairs stage exists anywhere in the plan)."""
    r = k // bands
    sh = with_shingles(df, id_col, text_col, n)
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), k))
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.struct(
            j.alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), j * r + 1, r), lambda v: v.cast("string")
                    ),
                )
            ).alias("bh"),
        ),
    )
    buckets = sig.select(
        F.col(id_col), F.col("sh"), F.explode(band_structs).alias("bb")
    ).select(F.col(id_col), "sh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    left = buckets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "band", "bh"
    )
    right = buckets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "band", "bh"
    )
    cand = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash16(text_col: Column) -> Column:
    """16-bit SimHash over distinct tokens: bit j is set iff the sum of
    (±1 per token, + when token-hash bit j is 1) is positive. Bit positions
    are compile-time constants, so the 16 per-bit sums unroll into plain
    codegen'd expressions (no array machinery in the hot path)."""
    hxs = F.transform(F.array_distinct(tokens(text_col)), lambda t: md5int(t))

    def bit_term(mask: Column):
        return lambda acc, x: acc + F.when(x.bitwiseAND(mask) != 0, 1).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(16):
        mask = F.lit(1 << j).cast("long")
        bit_sum = F.aggregate(hxs, F.lit(0).cast("long"), bit_term(mask))
        out = out + F.when(bit_sum > 0, mask).otherwise(F.lit(0).cast("long"))
    return out


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 2
) -> DataFrame:
    """SimHash near-dup candidates: equi-join on the 16-bit signature's two
    8-bit halves (a pair within hamming distance ≤ 2 of a 16-bit code agrees
    exactly on at least one half when the flipped bits land in one half —
    the classic multi-index pigeonhole trick), then verify exact hamming
    distance via bit_count(xor)."""
    sims = df.select(F.col(id_col), simhash16(F.col(text_col)).alias("simhash"))
    halves = sims.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half"), (F.col("simhash") % 256).alias("key")),
                F.struct(
                    F.lit(1).alias("half"),
                    F.floor(F.col("simhash") / 256).cast("long").alias("key"),
                ),
            )
        ).alias("hk"),
    ).select(F.col(id_col), "simhash", F.col("hk.half").alias("half"), F.col("hk.key").alias("key"))
    left = halves.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "half", "key"
    )
    right = halves.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "half", "key"
    )
    cand = (
        left.join(right, on=["half", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
