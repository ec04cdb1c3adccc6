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


def quantize(vec: Column, scale: int = 1000) -> Column:
    """Integer-quantize an embedding (round(x*scale)). Quantization makes
    every centroid update EXACT: integer sums are order-independent, so
    k-means iterations are bit-identical across engines and cluster sizes —
    the property that lets an ITERATIVE algorithm be oracle-checked."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _qd(qcol: Column) -> Column:
    return qcol.cast("array<double>")


def _assign(vecs: DataFrame, centroids: DataFrame, vid: str) -> DataFrame:
    """Nearest centroid by cosine (ties → smaller centroid_id). Centroids
    broadcast (k rows); one window shuffle on the vector id."""
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        F.col(vid),
        "qe",
        "centroid_id",
        cosine(_qd(F.col("qe")), F.col("cvec")).alias("cos"),
    )
    w = Window.partitionBy(vid).orderBy(F.col("cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(vid), "qe", "centroid_id")
    )


def _update(assigned: DataFrame, scale: int) -> DataFrame:
    """Elementwise-mean centroid update from exact integer sums."""
    dims = assigned.select(
        "centroid_id", F.posexplode("qe").alias("pos", "v")
    ).groupBy("centroid_id", "pos").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return dims.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
            lambda e: e["s"].cast("double") / (e["n"] * scale),
        ).alias("cvec")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    iters: int = 2,
    nprobe: int = 4,
    scale: int = 1000,
    qid: str = "query_id",
    cid: str = "vec_id",
    qvec: str = "qvec",
    cvec: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: k-means inverted file + multi-probe search.

    Train ``n_clusters`` centroids with ``iters`` Lloyd rounds
    (deterministic init: the first n_clusters corpus ids), assign every
    corpus vector to its cell (the inverted file), then each query probes
    its ``nprobe`` nearest cells and ranks only those candidates exactly.

    Scale shape: training touches each vector iters+1 times (broadcast
    centroids, no pairwise joins); search cost drops from |corpus| to
    ~nprobe/n_clusters of it per query. Centroid math is exact (integer
    sums, see quantize), so results are deterministic and oracle-checked.
    """
    qcorpus = corpus.select(F.col(cid), quantize(F.col(cvec), scale).alias("qe"))
    centroids = qcorpus.filter(F.col(cid) < n_clusters).select(
        F.col(cid).cast("int").alias("centroid_id"), _qd(F.col("qe")).alias("cvec")
    )
    for _ in range(iters):
        assigned = _assign(qcorpus, centroids, cid)
        centroids = _update(assigned, scale)
    ivf = _assign(qcorpus, centroids, cid)  # the inverted file

    qq = queries.select(F.col(qid), quantize(F.col(qvec), scale).alias("qe"))
    probe_scored = qq.crossJoin(F.broadcast(centroids)).select(
        F.col(qid),
        F.col("qe").alias("q_qe"),
        "centroid_id",
        cosine(_qd(F.col("qe")), F.col("cvec")).alias("pcos"),
    )
    wp = Window.partitionBy(qid).orderBy(F.col("pcos").desc(), F.col("centroid_id"))
    probes = (
        probe_scored.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= nprobe)
        .select(F.col(qid), "q_qe", "centroid_id")
    )
    cand = probes.join(ivf, on="centroid_id").filter(F.col(qid) != F.col(cid))
    scored = cand.select(
        F.col(qid),
        F.col(cid),
        cosine(_qd(F.col("q_qe")), _qd(F.col("qe"))).alias("cos"),
    )
    w = Window.partitionBy(qid).orderBy(F.col("cos").desc(), F.col(cid))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid, cid, "rank", F.round(F.col("cos"), 6).alias("cos_r"))
    )
