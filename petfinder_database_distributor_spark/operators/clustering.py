"""Distributed clustering / graph-ranking kernels for the LLM-data layer.

Two iterative algorithms, both built integer-exact so every result is
bit-identical to the DuckDB oracle (the same portability discipline as the
sketch family):

* :func:`kmeans_int8` — Lloyd's k-means over int8-quantized embeddings.
  Distances are integer squared-L2 and centroid updates use portable floor
  division, so the fixed-iteration result is deterministic across engines.
  The 100 TB shape: assignment is a PURE PROJECTION (centroids are k×dim
  literals baked into the expression tree — vectors are never duplicated
  through a join), and the only shuffle per iteration is the bounded
  (k × dim)-key centroid update. Per-iteration driver state is k centroid
  rows — the same bounded-scalar class as the connected-components
  convergence witness.

* :func:`pagerank_integer` — fixed-iteration PageRank with ranks held as
  integers in units of 1/SCALE. Contributions use integer division
  (`rank div outdeg`), so no float summation order can perturb the result.
  Fully declarative: no driver-side collect; each iteration is one
  edges⋈outdeg⋈ranks join plus one groupBy(dst) — the classic O(iters)
  bulk-synchronous shape. Dangling-node mass is dropped (ranks are a
  deterministic contraction, not a normalized distribution) — the common
  bulk-processing variant, stated in the output contract.

Reference scope note: the reference engine has no clustering/graph layer —
these extend the north-star LLM-pipeline surface (SURVEY.md §2 north-star
table) like the dedup/sketch families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Python-semantics floor division for possibly-negative integer columns.
# Spark's `div` truncates toward zero and DuckDB's `//` floors; routing
# both engines through (a - pymod(a, b)) / b — where pymod is the
# always-nonnegative remainder — makes them agree on every input. The
# final division is exact (the numerator is a multiple of b), so `div`
# (Spark) and `//` (DuckDB) coincide.
FLOORDIV_SQL = "(({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) {op} ({b})"


def _floordiv(a: str, b: str) -> str:
    """Spark-side portable floor division as a SQL expression string."""
    return FLOORDIV_SQL.format(a=a, b=b, op="div")


def quantize_int8(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization (scale = max|x|/127, q = floor(x/s + .5))
    — the same portable kernel as the ``embedding_quantize_int8`` query,
    returned as an integer vector for exact downstream arithmetic."""
    e = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(e, lambda x: F.floor(x / scale + F.lit(0.5))),
    ).otherwise(F.transform(e, lambda x: F.lit(0).cast("long")))
    return emb.select(F.col(id_col).alias("vec_id"), q.alias("q"))


def _assign(qdf: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid assignment as a pure projection: one
    (dist, cluster) struct per centroid, ``array_min`` picks the smallest
    distance with ties broken toward the smallest cluster id (struct
    ordering is lexicographic — the oracle's ORDER BY dist, cluster)."""
    structs = []
    for cid, vec in cents:
        carr = F.array(*[F.lit(int(v)).cast("long") for v in vec])
        dist = F.aggregate(
            F.zip_with(F.col("q"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(dist.alias("dist"), F.lit(int(cid)).cast("int").alias("cluster"))
        )
    best = F.array_min(F.array(*structs))
    return qdf.select(
        "vec_id",
        "q",
        best.getField("cluster").alias("cluster"),
        best.getField("dist").alias("dist"),
    )


def _update(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """Centroid update: posexplode → groupBy (cluster, pos) — a bounded
    k×dim-key aggregation regardless of input size — then floor-mean per
    coordinate. Returns the k (or fewer: empty clusters vanish, in both
    engines, by GROUP BY) new centroids as driver literals."""
    agg = (
        assigned.select("cluster", F.posexplode("q").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .withColumn("v", F.expr(_floordiv("s", "n")))
    )
    rows = (
        agg.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda st: st.getField("v"),
            ).alias("c")
        )
        .collect()
    )
    return sorted((r["cluster"], list(r["c"])) for r in rows)


def kmeans_int8(
    emb: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over int8-quantized embeddings.

    Seeds are the k smallest ``vec_id`` vectors (deterministic, no RNG);
    ``iters`` rounds of (assign → floor-mean update); the returned frame is
    the FINAL assignment (vec_id, cluster, dist) against the post-update
    centroids. Runs ``iters`` bounded Spark jobs at call time (k×dim longs
    collected per round — the documented bounded-scalar exception, like the
    components convergence witness)."""
    qdf = quantize_int8(emb)
    seed_rows = qdf.orderBy("vec_id").limit(k).collect()
    cents = [
        (i, list(r["q"])) for i, r in enumerate(sorted(seed_rows, key=lambda r: r["vec_id"]))
    ]
    for _ in range(iters):
        cents = _update(_assign(qdf, cents))
    return _assign(qdf, cents).select("vec_id", "cluster", "dist")


def pagerank_integer(
    edges: DataFrame, iters: int = 3, scale: int = 10**12, top: int = 20
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list
    (columns ``src``, ``dst``; caller pre-dedups).

    rank₀(v) = SCALE div N;  rankₜ₊₁(v) = (15·(SCALE div N)) div 100
    + (85·Σ_{u→v} rankₜ(u) div outdeg(u)) div 100. All quantities are
    nonnegative integers, so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree and the result is bit-exact cross-engine.
    Dangling mass is dropped (documented contraction). Output: top-``top``
    nodes ordered (rank DESC, node ASC) via TakeOrderedAndProject."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nstats = nodes.agg(F.count("*").alias("n_nodes"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = f"(15 * (cast({scale} as bigint) div n_nodes)) div 100"
    ranks = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", F.expr(f"cast({scale} as bigint) div n_nodes").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("contrib"),
            )
        )
        inc = contrib.groupBy("node").agg(F.sum("contrib").alias("inc"))
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(F.broadcast(nstats))
            .select(
                "node",
                F.expr(f"({base}) + ((85 * coalesce(inc, 0)) div 100)").alias("rank"),
            )
        )
    return ranks.orderBy(F.desc("rank"), F.asc("node")).limit(top)
