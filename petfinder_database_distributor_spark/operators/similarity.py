"""Similarity search over embedding columns (north star): brute-force
cosine top-k as the exact baseline, SRP-LSH (random-hyperplane) bucketing as
the scale path.

Scale design:
- Brute force broadcasts the (small) query set and computes scores map-side
  over the corpus — one window shuffle on query_id for top-k. Right shape
  up to ~10^3 queries; beyond that, the LSH path bounds candidates per
  query by bucket.
- Hyperplanes are FORMULA-derived (deterministic integers), not RNG —
  reproducible across engines, so even the ANN path is oracle-checkable.
- Dot products run element-ordered (zip_with → sequential aggregate), i.e.
  the same IEEE operation order DuckDB's list_inner_product uses — results
  are bit-identical, no rounding fudge needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "query_id",
    cid: str = "vec_id",
    qvec: str = "qvec",
    cvec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query (excluding self-matches by id).

    queries: (query_id, qvec)   corpus: (vec_id, embedding)
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(qid),
        F.col(cid),
        cosine(as_double(F.col(qvec)), as_double(F.col(cvec))).alias("cos"),
    ).filter(F.col(qid) != F.col(cid))
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, cid, "rank", F.round(F.col("cos"), 6).alias("cos_r"))
    )


def srp_bucket(vec: Column, n_bits: int = 8, dim: int = 64) -> Column:
    """Signed-random-projection bucket id: n_bits sign bits of dot products
    against deterministic formula hyperplanes
    plane[i][j] = ((i*73856093 + j*19349663) mod 2001 - 1000) / 1000."""
    def plane(i: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: ((i * 73856093 + j * 19349663) % 2001 - 1000) / 1000.0,
        )

    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out + F.when(
            dot(vec, plane(i)) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    qid: str = "query_id",
    cid: str = "vec_id",
    qvec: str = "qvec",
    cvec: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's SRP bucket — candidates per query
    drop from |corpus| to |corpus|/2^n_bits; the join is an equi-join on the
    bucket id (shuffle keyed and bounded), which is what survives at 100 TB."""
    cq = queries.withColumn("bucket", srp_bucket(as_double(F.col(qvec)), n_bits, dim))
    cc = corpus.withColumn("bucket", srp_bucket(as_double(F.col(cvec)), n_bits, dim))
    joined = cq.join(cc, on="bucket").filter(F.col(qid) != F.col(cid))
    scored = joined.select(
        F.col(qid),
        F.col(cid),
        cosine(as_double(F.col(qvec)), as_double(F.col(cvec))).alias("cos"),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, cid, "rank", F.round(F.col("cos"), 6).alias("cos_r"))
    )
