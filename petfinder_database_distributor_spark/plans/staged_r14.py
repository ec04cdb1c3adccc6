"""Round-14 staged queries — implemented and oracle-verified in round 13,
registered next round (the stage-then-promote discipline of
plans/staged_r12.py / staged_r13.py: the r13 driver window is an exact
50-slot fit of the six r13 promotions + the r8 cohort drain + the
refreshed-oracle TPC-H names, so these EIGHT carry the full registration
bar — (fn, oracle, doc) triple, sf0.001+sf0.01 hash parity on every
pytest run via tests/test_staged_r14.py, AND the four degenerate-shape
sweeps of tests/test_staged_gate.py (empty / one-row / dirty /
all-empty-text), which as of r13 are a hard precondition of promotion —
without displacing window names).

The eight queries extend the pillars where coverage is thinnest after
round 13:

* ``sample_kcenter_bucketed`` — the SCALE TWIN of sample_kcenter_greedy
  (r12 verdict #7): greedy k-center serializes k full corpus scans; this
  variant hash-samples a ~128-candidate set in ONE pass, runs the exact
  greedy over the bounded candidates, and measures the true corpus
  covering radius in one more pass — 2 scans total at any k.
* ``sketch_kmv_distinct`` — K-Minimum-Values / theta sketch (Bar-Yossef
  et al. 2002), the fourth portable distinct sketch beside HLL/CMS/Bloom,
  with the union-mergeability witness: per-group registers merged into
  the global register must equal the directly-built global register.
* ``text_paragraph_dedup`` — corpus-wide exact line-level deduplication
  (the RefinedWeb/C4 exact-dedup unit): keep the first occurrence of
  every normalized line, score each document by its share of
  already-seen lines.
* ``graph_bfs_layers`` — bounded-round breadth-first search over the
  bipartite part–supplier co-purchase graph (the missing traversal
  primitive beside k-core / PageRank / triangles); Spark runs the
  bounded frontier loop, the oracle unrolls the SAME rounds.
* ``json_kv_profile`` — semi-structured schema profiling: flatten every
  valid props object into (key, value) pairs and profile per-key
  presence, numeric-parse rate, and value range — the discovery query
  every JSON ingest starts with.
* ``text_zipf_fit`` — integer-exact Zipf slope fit over the top-64 term
  frequencies via the fixed-point log2 kernel (plans/mining.py) and an
  exact integer least squares — the vocabulary-health diagnostic
  (natural corpora fit slope ~ -1; synthetic or boilerplate-heavy
  corpora deviate hard).
* ``sample_stratified_neyman`` — Neyman-optimal stratified-sample
  allocation with an integer-exact L1 dispersion proxy and
  largest-remainder apportionment (sums to budget exactly).
* ``stream_sketch_kmv`` — the KMV register maintained over an unbounded
  stream via per-batch reduce + driver-side monoid merge (O(k) state
  forever); the batch oracle hash-checks the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.operators.text import (
    MD5INT_SQL,
    md5int,
    tokens,
)
from petfinder_database_distributor_spark.schema import finite_measures, load_table

# ---------------------------------------------------------------------------
# sample_kcenter_bucketed
# ---------------------------------------------------------------------------

_KCB_K = 8
# expected candidate-set size: S = max(1, n // _KCB_TARGET) keeps ~128
# candidates at EVERY corpus scale — the whole point of the variant
_KCB_TARGET = 128
# loud hard bound on the driver pull (ORDER BY vec_id LIMIT, i.e.
# TakeOrderedAndProject — never an unbounded collect even if the hash
# sample comes in heavy); at the expected 128 it never binds
_KCB_CAP = 4096


def _kcb_oracle() -> str:
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        _KC_DIST_SQL,
        _KC_QE_SQL,
    )

    d = _KC_DIST_SQL
    h = MD5INT_SQL.format(x="vec_id::VARCHAR")
    ctes = [
        f"q AS (SELECT vec_id, {_KC_QE_SQL} AS qe FROM embeddings"
        " WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)",
        f"nn AS (SELECT greatest(1, count(*) // {_KCB_TARGET}) AS s,"
        " min(vec_id) AS mn FROM q)",
        f"cand AS (SELECT q.vec_id, q.qe FROM q, nn"
        f" WHERE ({h}) % nn.s = 0 OR q.vec_id = nn.mn"
        f" ORDER BY q.vec_id LIMIT {_KCB_CAP})",
        "s0 AS (SELECT vec_id, qe FROM cand ORDER BY vec_id LIMIT 1)",
        "d0 AS (SELECT c.vec_id, c.qe, c.vec_id = s0.vec_id AS picked, "
        + d.format(a="c.qe", b="s0.qe")
        + " AS mind FROM cand c, s0)",
    ]
    for i in range(1, _KCB_K):
        ctes.append(
            f"s{i} AS (SELECT vec_id, qe, mind FROM d{i - 1}"
            f" WHERE NOT picked ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        ctes.append(
            f"d{i} AS (SELECT d.vec_id, d.qe,"
            f" d.picked OR d.vec_id = s.vec_id AS picked,"
            f" least(d.mind, " + d.format(a="d.qe", b="s.qe") + ") AS mind"
            f" FROM d{i - 1} d, s{i} s)"
        )
    sel = ["SELECT 1::BIGINT AS sel_rank, vec_id, qe, 0::BIGINT AS dist_sq FROM s0"]
    sel += [
        f"SELECT {i + 1}::BIGINT, vec_id, qe, mind::BIGINT FROM s{i}"
        for i in range(1, _KCB_K)
    ]
    union = "\n      UNION ALL ".join(sel)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    sel AS ({union}),
    rad AS (SELECT coalesce(max(m), 0)::BIGINT AS r FROM (
      SELECT q.vec_id, min({d.format(a="q.qe", b="sel.qe")}) AS m
      FROM q, sel GROUP BY q.vec_id))
    SELECT sel_rank, vec_id, dist_sq, rad.r AS corpus_radius_sq
    FROM sel, rad
    """
    )


def sample_kcenter_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-Center coreset selection WITHOUT the k-round corpus loop — the
    100 TB twin of sample_kcenter_greedy (r12 verdict #7). Greedy
    farthest-point sampling is a 2-approximation but serializes k FULL
    corpus scans; the MapReduce-style variant here (the
    sample-then-solve composition of Ene/Im/Moseley 2011's k-center
    pattern) does the whole job in TWO corpus passes at any k: (1) ONE
    hash-sampled candidate pass — md5int(vec_id) % S == 0 with
    S = max(1, n // 128), so the candidate set is ~128 vectors at every
    corpus scale (plus the min-id vector so it is provably non-empty,
    TakeOrderedAndProject-capped at 4096 as a loud driver-pull bound);
    (2) the EXACT integer greedy over that bounded set (driver-side,
    same quantized squared-L2 and vec_id tie-breaks as the greedy twin);
    (3) ONE corpus pass measuring the TRUE covering radius of the chosen
    centers — max over all vectors of min squared distance to a center
    (broadcast of 8 rows; coalesced to 0 on an empty corpus) — the
    quality certificate against the greedy's radius. Deterministic end
    to end (hash sampling, integer distances, lexical ties), hence
    oracle-checkable: the oracle replays the identical sample + unrolled
    greedy + radius. At 100 TB: two embarrassingly-parallel scans and a
    <=4096-row driver pull replace k serialized scans — the 8x scale
    probe must come in at or under the greedy's 1.7x."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        _kc_dist,
        _kc_qe,
    )

    q = emb.select("vec_id", _kc_qe(F.col("embedding")).alias("qe"))
    nn = q.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"count(*) div {_KCB_TARGET}"),
        ).alias("s"),
        F.min("vec_id").alias("mn"),
    )
    h = md5int(F.col("vec_id").cast("string"))
    cand_rows = (
        q.crossJoin(F.broadcast(nn))
        .filter((h % F.col("s") == 0) | (F.col("vec_id") == F.col("mn")))
        .select("vec_id", "qe")
        .orderBy("vec_id")
        .limit(_KCB_CAP)
        .collect()
    )
    if not cand_rows:
        return spark.createDataFrame(
            [],
            "sel_rank bigint, vec_id bigint, dist_sq bigint,"
            " corpus_radius_sq bigint",
        )
    # exact greedy over the bounded candidate set — pure-Python integers,
    # bit-identical to the oracle's unrolled SQL greedy (same seed, same
    # squared-L2, same (dist desc, vec_id) ties)
    cand = sorted(
        ((int(r["vec_id"]), [int(x) for x in r["qe"]]) for r in cand_rows)
    )

    def dist2(a: list[int], b: list[int]) -> int:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    selected = [(1, cand[0][0], 0, cand[0][1])]
    remaining = dict(cand[1:])
    mind = {v: dist2(vec, cand[0][1]) for v, vec in remaining.items()}
    for i in range(2, _KCB_K + 1):
        if not remaining:
            break
        pick = max(remaining, key=lambda v: (mind[v], -v))
        # (dist desc, vec_id asc) ties — max on (mind, -vec_id)
        selected.append((i, pick, mind[pick], remaining[pick]))
        pvec = remaining.pop(pick)
        del mind[pick]
        for v, vec in remaining.items():
            d = dist2(vec, pvec)
            if d < mind[v]:
                mind[v] = d
    centers = [(r, v, d) for r, v, d, _ in selected]
    center_vecs = [vec for _, _, _, vec in selected]
    radius_col = F.least(
        *[_kc_dist("qe", c) for c in center_vecs]
    ) if len(center_vecs) > 1 else _kc_dist("qe", center_vecs[0])
    rad = q.agg(
        F.coalesce(F.max(radius_col), F.lit(0)).cast("long").alias("r")
    )
    sel_df = spark.createDataFrame(
        centers, "sel_rank bigint, vec_id bigint, dist_sq bigint"
    )
    return sel_df.crossJoin(F.broadcast(rad)).select(
        "sel_rank", "vec_id", "dist_sq", F.col("r").alias("corpus_radius_sq")
    )


# ---------------------------------------------------------------------------
# sketch_kmv_distinct
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_M = 1 << 60  # md5int hash space


def _kmv_oracle() -> str:
    h = MD5INT_SQL.format(x="user_id::VARCHAR")
    est = (
        f"CASE WHEN cnt < {_KMV_K} THEN cnt"
        f" ELSE (({_KMV_K} - 1)::HUGEINT * {_KMV_M} // kth)::BIGINT END"
    )
    return f"""
    WITH hx AS (SELECT DISTINCT event_type AS scope, {h} AS h
                FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    ranked AS (SELECT scope, h,
                      row_number() OVER (PARTITION BY scope ORDER BY h) AS rk
               FROM hx),
    groups AS (SELECT scope, count(*) AS cnt,
                      max(h) FILTER (WHERE rk <= {_KMV_K}) AS kth
               FROM ranked GROUP BY scope),
    allh AS (SELECT DISTINCT h FROM hx),
    allr AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM allh),
    allg AS (SELECT 'ALL' AS scope, count(*) AS cnt,
                    max(h) FILTER (WHERE rk <= {_KMV_K}) AS kth
             FROM allr HAVING count(*) > 0)
    SELECT scope, cnt::BIGINT AS n_exact, {est} AS est_distinct,
           CASE WHEN cnt >= {_KMV_K} THEN kth ELSE NULL END AS kth_hash
    FROM (SELECT * FROM groups UNION ALL SELECT * FROM allg)
    """


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002; the theta
    sketch of Apache DataSketches) over events.user_id, per event_type
    and merged: keep the k=64 smallest 60-bit hashes per group; estimate
    distinct = (k-1) * M / h_k when the register is full, exact count
    below k. The fourth portable sketch beside HLL/CMS/Bloom, and the
    one with the cleanest MERGE story: the union of two registers'
    k-minima contains the union's k-minima, so merged == direct-built —
    the 'ALL' row here is computed from the same hash set the per-group
    registers see, and tests/test_staged_r14.py pins merged-register ==
    direct-register equality explicitly. Integer-exact end to end
    (md5int hashes, HUGEINT/decimal(38,0) for the (k-1)*2^60 numerator
    that overflows int64), so both engines agree bit-for-bit; exact
    distinct (n_exact) rides along as the error witness. Plan shape: one
    distinct hash-agg (map-side partial), per-group top-k through a
    PARTITIONED window over distinct hashes, global top-k through
    orderBy().limit() (TakeOrderedAndProject) — at 100 TB the register
    per group is 64 longs (512 bytes), the whole point of a sketch."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    hx = ev.select(
        F.col("event_type").alias("scope"),
        md5int(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("scope").orderBy("h")
    groups = (
        hx.withColumn("rk", F.row_number().over(w))
        .groupBy("scope")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(F.when(F.col("rk") <= _KMV_K, F.col("h"))).alias("kth"),
        )
    )
    allh = hx.select("h").distinct()
    allg = (
        allh.orderBy("h")
        .limit(_KMV_K)
        .agg(
            F.max("h").alias("kth"),
        )
        .crossJoin(F.broadcast(allh.agg(F.count(F.lit(1)).alias("cnt"))))
        .filter(F.col("cnt") > 0)
        .select(F.lit("ALL").alias("scope"), "cnt", "kth")
    )
    both = groups.unionByName(allg)
    est = F.when(F.col("cnt") < _KMV_K, F.col("cnt")).otherwise(
        F.expr(
            f"CAST(CAST({_KMV_K - 1} AS DECIMAL(38,0)) * {_KMV_M} div kth AS BIGINT)"
        )
    )
    return both.select(
        "scope",
        F.col("cnt").cast("long").alias("n_exact"),
        est.cast("long").alias("est_distinct"),
        F.when(F.col("cnt") >= _KMV_K, F.col("kth")).alias("kth_hash"),
    )


# ---------------------------------------------------------------------------
# text_paragraph_dedup
# ---------------------------------------------------------------------------

_PD_KEEP_MILLI = 300  # keep docs whose duplicate-line share is < 30%


def _paragraph_oracle() -> str:
    h = MD5INT_SQL.format(x="ln")
    return f"""
    WITH lines AS (
      SELECT doc_id, u.i - 1 AS line_idx, trim(d.ls[u.i]) AS ln
      FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
            FROM documents WHERE doc_id IS NOT NULL) d,
           unnest(range(1, len(d.ls) + 1)) u(i)
      WHERE trim(d.ls[u.i]) <> ''),
    ranked AS (
      SELECT doc_id, line_idx,
             row_number() OVER (PARTITION BY {h}
                                ORDER BY doc_id, line_idx) AS occ
      FROM lines),
    per_doc AS (
      SELECT doc_id, count(*) AS n_lines,
             sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM ranked GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_lines, 0)::BIGINT AS n_lines,
           coalesce(p.n_dup, 0)::BIGINT AS n_dup_lines,
           CASE WHEN coalesce(p.n_lines, 0) > 0
                THEN (p.n_dup * 1000 // p.n_lines) ELSE 0 END::BIGINT
             AS dup_ratio_milli,
           (CASE WHEN coalesce(p.n_lines, 0) > 0
                 THEN (p.n_dup * 1000 // p.n_lines) ELSE 0 END
            < {_PD_KEEP_MILLI}) AS keep
    FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
    LEFT JOIN per_doc p USING (doc_id)
    """


def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide EXACT line-level deduplication — the C4/RefinedWeb
    exact-dedup unit (Raffel et al. 2020 dedup three-sentence spans;
    Penedo et al. 2023 dedup at document+line granularity): every
    non-empty trimmed line is hashed (portable 60-bit md5int), the FIRST
    occurrence corpus-wide (ordered by doc_id, then line index — a total
    deterministic order) is the keeper, and every later occurrence marks
    its document. Output is the per-document audit row: non-empty line
    count, already-seen-line count, the duplicate share in milli, and
    the keep verdict (< 30% duplicated lines) — zero-line documents
    survive with n_lines = 0 and keep = true (nothing to hold against
    them). Plan shape: ONE posexplode of the corpus's lines, ONE
    hash-PARTITIONED window (partition = line hash, so first-occurrence
    ranking shuffles on the dedup key exactly once and no partition
    exceeds a line's global frequency), one per-doc hash re-agg, and a
    left join back to the doc spine. At 100 TB that is the canonical
    exact-dedup shape: shuffle on content hash, rank, re-agg — no
    all-pairs anything; boilerplate lines (the hot hashes) skew their
    partitions at worst linearly in their frequency."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.coalesce(F.col("text"), F.lit("")), "\n", -1))
            .alias("line_idx", "raw"),
        )
        .select("doc_id", "line_idx", F.trim(F.col("raw")).alias("ln"))
        .filter(F.col("ln") != "")
    )
    w = Window.partitionBy(md5int(F.col("ln"))).orderBy("doc_id", "line_idx")
    ranked = lines.select(
        "doc_id", F.row_number().over(w).alias("occ")
    )
    per_doc = ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_dup"),
    )
    ratio = F.when(
        F.coalesce(F.col("n_lines"), F.lit(0)) > 0,
        F.expr("n_dup * 1000 div n_lines"),
    ).otherwise(F.lit(0))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_lines"),
            ratio.cast("long").alias("dup_ratio_milli"),
            (ratio < _PD_KEEP_MILLI).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# graph_bfs_layers
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 4
_BFS_SEED_MAX = 10  # seed nodes: parts with partkey < 10 present in the graph


def _bfs_oracle() -> str:
    ctes = [
        "e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem"
        " WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL)",
        f"f0 AS (SELECT DISTINCT 'P' AS node_type, p AS node_id, 0 AS dist"
        f" FROM e WHERE p < {_BFS_SEED_MAX})",
        "v0 AS (SELECT node_type, node_id FROM f0)",
    ]
    for i in range(1, _BFS_ROUNDS + 1):
        prev, side = f"f{i - 1}", ("S" if i % 2 == 1 else "P")
        join_on = "e.p = f.node_id" if side == "S" else "e.s = f.node_id"
        nxt_id = "e.s" if side == "S" else "e.p"
        ctes.append(
            f"f{i} AS (SELECT DISTINCT '{side}' AS node_type,"
            f" {nxt_id} AS node_id, {i} AS dist"
            f" FROM e JOIN {prev} f ON {join_on}"
            f" WHERE NOT EXISTS (SELECT 1 FROM v{i - 1} v"
            f"  WHERE v.node_type = '{side}' AND v.node_id = {nxt_id}))"
        )
        ctes.append(
            f"v{i} AS (SELECT node_type, node_id FROM v{i - 1}"
            f" UNION ALL SELECT node_type, node_id FROM f{i})"
        )
    union = "\n      UNION ALL ".join(
        f"SELECT node_type, node_id, dist::BIGINT AS dist FROM f{i}"
        for i in range(_BFS_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round breadth-first search over the bipartite
    part-supplier co-purchase graph — the traversal primitive the graph
    family lacked beside k-core (peeling), PageRank (power iteration),
    and triangles (joins): from the seed layer (part nodes with
    partkey < 10 that appear in any lineitem), expand 4 alternating
    frontier rounds (part -> supplier -> part -> ...), recording each
    node's FIRST discovery distance — the reachability/lineage query of
    supply-chain and curation graphs ('everything within k hops of the
    flagged nodes'). Spark runs the bounded frontier loop — each round
    is ONE equi-join of the frontier against the edge list plus one
    anti-join against the visited set, all key-partitioned shuffles —
    and the oracle UNROLLS the identical rounds, so parity holds by
    construction round for round (the same bounded-unroll discipline as
    graph_kcore_decomposition). Distances are exact integers; frontier
    dedup is DISTINCT on (type, id). At 100 TB: 4 shuffle-join rounds
    over an edge list that never amplifies beyond its true degree, a
    visited set that only grows by frontier size, and no driver-side
    state at all — the textbook Pregel-without-Pregel BFS shape."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    e = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    f0 = (
        e.filter(F.col("p") < _BFS_SEED_MAX)
        .select(
            F.lit("P").alias("node_type"),
            F.col("p").alias("node_id"),
            F.lit(0).alias("dist"),
        )
        .distinct()
    )
    layers = [f0]
    visited = f0.select("node_type", "node_id")
    frontier = f0
    for i in range(1, _BFS_ROUNDS + 1):
        side = "S" if i % 2 == 1 else "P"
        join_key, nxt = ("p", "s") if side == "S" else ("s", "p")
        # r14 optimization: the frontier is distinct BY CONSTRUCTION (f0
        # is a distinct; every later frontier is an anti-join of a
        # distinct expansion) and single-typed, so the join-key
        # projection needs no second distinct shuffle (guide §2.4).
        nxt_nodes = (
            e.join(
                frontier.select(F.col("node_id").alias(join_key)),
                join_key,
            )
            .select(
                F.lit(side).alias("node_type"),
                F.col(nxt).alias("node_id"),
                F.lit(i).alias("dist"),
            )
            .distinct()
        )
        fresh = nxt_nodes.join(
            visited, ["node_type", "node_id"], "left_anti"
        ).localCheckpoint(eager=True)
        layers.append(fresh)
        visited = visited.unionByName(
            fresh.select("node_type", "node_id")
        ).localCheckpoint(eager=True)
        frontier = fresh
    out = layers[0]
    for lay in layers[1:]:
        out = out.unionByName(lay)
    return out.select(
        "node_type", "node_id", F.col("dist").cast("long").alias("dist")
    )


# ---------------------------------------------------------------------------
# json_kv_profile
# ---------------------------------------------------------------------------

# MAP-cast form (r13 self-probe find, pre-registration): the first cut
# re-extracted each key via a '$."<key>"' path string, which (a) breaks
# on keys containing a double quote, and (b) reads only the FIRST value
# of a duplicate key while Spark's from_json map carries BOTH entries
# (MapData does not enforce key uniqueness; explode emits each entry —
# the collect-to-dict display hides this) — two latent hash divergences
# on dirty JSON. TRY_CAST(props::JSON AS MAP(VARCHAR, VARCHAR)) yields
# the IDENTICAL value canonicalization as Spark's map<string,string>
# (probed: 'abc' / '7' / '1.5' / 'true' / NULL / compact '{"x":1}' /
# '[1,2]'), handles any key bytes, NULLs on every non-object shape
# exactly like from_json, and keeps duplicate entries just like
# MapData — so the contract is simply DUPLICATES PRESERVED.
_JSON_KV_ORACLE = """
    WITH m AS (
      SELECT TRY_CAST(CASE WHEN json_valid(props) THEN props END::JSON
                      AS MAP(VARCHAR, VARCHAR)) AS mp
      FROM events),
    kv AS (
      SELECT map_keys(mp)[u.i] AS key, map_values(mp)[u.i] AS v
      FROM m, unnest(range(1, cardinality(mp)::BIGINT + 1)) u(i)
      WHERE mp IS NOT NULL)
    SELECT key,
           count(*)::BIGINT AS n_present,
           sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_vals,
           sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_numeric,
           count(DISTINCT v)::BIGINT AS n_distinct_vals,
           min(v) AS min_val,
           max(v) AS max_val
    FROM kv GROUP BY key
    """


def json_kv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured SCHEMA PROFILING over the events.props JSON column
    — the discovery query every JSON ingest starts with ('what keys
    exist, how often, what types do their values parse as, what range do
    they span'): every VALID props object is flattened into (key, value)
    pairs (Spark: from_json to map<string,string> + explode — scalars
    coerce to their canonical text, malformed/array/scalar JSON to a
    NULL map, i.e. zero rows, duplicate keys carried as SEPARATE entries
    — MapData does not dedupe and explode emits each — exactly matching
    the oracle's TRY_CAST-to-MAP form probed value-by-value; JSON nulls
    survive as NULL values), then profiled
    per key: presence count, JSON-null count, numeric-parse count
    (TRY_CAST to double on BOTH engines — the malformed-JSON contract's
    try-everything discipline), distinct-value count, and the
    lexicographic value range. Dirty inputs are first-class: the dirty
    fixture's '{bad json' / 'not json at all' / '' rows contribute
    nothing on either engine, its '{"k": "abc"}' row lands in
    n_present - n_numeric. Plan shape: ONE JVM-side JSON parse +
    map-explode (no Python, no UDF) feeding ONE hash aggregate keyed on
    the JSON key — at 100 TB a single shuffle whose key cardinality is
    the SCHEMA size (tens of keys), with count(DISTINCT v) the only
    expander (two-phase partial distinct under AQE)."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "v")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_vals"),
        F.sum(F.when(F.col("v").try_cast("double").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_numeric"),
        F.countDistinct("v").cast("long").alias("n_distinct_vals"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 64
_ZIPF_CLAMP = 1 << 30  # the log2 kernel's domain ceiling
_ZIPF_FRAC = 20  # the kernel's fixed-point fraction bits (mining._PPL_FRAC_BITS)


def _zipf_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL
    from petfinder_database_distributor_spark.plans.mining import _log2fp_sql_ctes

    log2_of = f"(30 * {1 << _ZIPF_FRAC} - {{c}})"
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (SELECT u.x AS term, count(*)::BIGINT AS tf
           FROM toks, unnest(toks.t) u(x) GROUP BY 1),
    top AS (SELECT term, tf,
                   least(tf, {_ZIPF_CLAMP}) AS tfc,
                   row_number() OVER (ORDER BY tf DESC, term) AS rk
            FROM tf ORDER BY tf DESC, term LIMIT {_ZIPF_TOPK}),
    vals AS (SELECT DISTINCT tq FROM (
       SELECT rk AS tq FROM top UNION SELECT tfc FROM top)),
    {_log2fp_sql_ctes("vals", prefix="zf")},
    xy AS (SELECT t.rk, t.tf,
                  {log2_of.format(c="cx.cost_fp")} AS x,
                  {log2_of.format(c="cy.cost_fp")} AS y
           FROM top t
           JOIN zf_cost cx ON cx.tq = t.rk
           JOIN zf_cost cy ON cy.tq = t.tfc),
    s AS (SELECT count(*)::HUGEINT AS n,
                 sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                 sum(x::HUGEINT * y)::HUGEINT AS sxy,
                 sum(x::HUGEINT * x)::HUGEINT AS sxx
          FROM xy),
    fit AS (SELECT n, (n * sxy - sx * sy) AS num,
                   (n * sxx - sx * sx) AS den
            FROM s WHERE (n * sxx - sx * sx) > 0)
    SELECT n::BIGINT AS n_terms,
           (CASE WHEN num < 0 THEN -((1000 * -num) // den)
                 ELSE (1000 * num) // den END)::BIGINT AS slope_milli,
           (SELECT term FROM top WHERE rk = 1) AS top_term,
           (SELECT tf FROM top WHERE rk = 1)::BIGINT AS top_tf,
           (SELECT max(tf) > {_ZIPF_CLAMP} FROM top) AS freq_clamped
    FROM fit
    """


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Zipf's-law slope fit over the top-64 term
    frequencies — the vocabulary-health diagnostic of corpus curation
    (natural language fits log(freq) ~ slope * log(rank) with slope
    ~ -1; template/boilerplate-heavy or synthetic corpora deviate hard,
    so the slope is a one-number corpus fingerprint to track across
    ingest batches). NOTHING here is float: ranks and (2^30-clamped,
    loudly flagged) frequencies run through the same 20-bit fixed-point
    square-and-shift log2 kernel as the perplexity family
    (plans/mining.py::_log2fp_cost — pow/log are NOT cross-libm
    reproducible; this is), and the least-squares slope is exact integer
    arithmetic — slope_milli = trunc(1000 * (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2)) with decimal(38,0)/HUGEINT products (the cross terms
    overflow int64 at ~8e20) and an explicit sign-split so BOTH engines
    truncate toward zero (Spark div truncates, DuckDB // floors — they
    disagree on negatives, and a Zipf slope IS negative). Degenerate
    corpora (< 2 distinct top terms => zero fit variance) yield ZERO
    rows on both engines. Plan shape: one corpus-sized term-frequency
    hash agg with map-side partials; the top-64 rides orderBy().limit()
    (TakeOrderedAndProject); the kernel and the fit run over a <=128-row
    register frame (window over 64 rows — the plan-quality allowlist's
    register-table class). At 100 TB the only corpus-sized work is the
    tf agg — identical posture to text_vocab_coverage."""
    from petfinder_database_distributor_spark.plans.mining import _log2fp_cost

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top = (
        tf.orderBy(F.col("tf").desc(), "term")
        .limit(_ZIPF_TOPK)
        .select(
            "term",
            "tf",
            F.least(F.col("tf"), F.lit(_ZIPF_CLAMP)).alias("tfc"),
            F.row_number()
            .over(Window.orderBy(F.col("tf").desc(), "term"))
            .cast("long")
            .alias("rk"),
        )
        .localCheckpoint(eager=True)  # 64-row register frame, 3 consumers
    )
    vals = (
        top.select(F.col("rk").alias("tq"))
        .union(top.select(F.col("tfc").alias("tq")))
        .distinct()
    )
    cost = _log2fp_cost(vals)
    log2_of = (F.lit(30 * (1 << _ZIPF_FRAC)) - F.col("cost_fp")).cast("long")
    cx = cost.select(F.col("tq").alias("rk"), log2_of.alias("x"))
    cy = cost.select(F.col("tq").alias("tfc"), log2_of.alias("y"))
    xy = top.join(cx, "rk").join(cy, "tfc")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
    )
    fit = s.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    ).filter(F.col("den") > 0)
    slope = F.when(
        F.col("num") < 0,
        -F.expr("CAST((1000 * -num) div den AS BIGINT)"),
    ).otherwise(F.expr("CAST((1000 * num) div den AS BIGINT)"))
    top1 = top.filter(F.col("rk") == 1).select(
        F.col("term").alias("top_term"), F.col("tf").alias("top_tf")
    )
    flag = top.agg((F.max("tf") > _ZIPF_CLAMP).alias("freq_clamped"))
    return (
        fit.crossJoin(F.broadcast(top1))
        .crossJoin(F.broadcast(flag))
        .select(
            F.col("n").cast("long").alias("n_terms"),
            slope.cast("long").alias("slope_milli"),
            "top_term",
            F.col("top_tf").cast("long").alias("top_tf"),
            "freq_clamped",
        )
    )


# ---------------------------------------------------------------------------
# sample_stratified_neyman
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000  # total sample size to allocate across strata


_NEYMAN_ORACLE = f"""
    WITH ev AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
        AND isfinite(value) AND abs(value) < 1000000000000.0),
    st AS (
      SELECT event_type, count(*)::HUGEINT AS n, sum(c)::HUGEINT AS s
      FROM ev GROUP BY 1),
    disp AS (
      SELECT e.event_type, st.n,
             sum(abs(st.n * e.c - st.s))::HUGEINT AS adev
      FROM ev e JOIN st USING (event_type)
      GROUP BY e.event_type, st.n),
    wts AS (
      SELECT event_type, n::BIGINT AS n_rows,
             (adev // (n * n))::BIGINT AS mad_cents,
             (n * (adev // (n * n)))::HUGEINT AS w
      FROM disp),
    tot AS (SELECT sum(w)::HUGEINT AS wsum FROM wts),
    base AS (
      SELECT w.event_type, w.n_rows, w.mad_cents,
             (({_NEY_BUDGET}::HUGEINT * w.w) // tot.wsum)::BIGINT AS base_n,
             (({_NEY_BUDGET}::HUGEINT * w.w) % tot.wsum)::HUGEINT AS rem,
             row_number() OVER (
               ORDER BY (({_NEY_BUDGET}::HUGEINT * w.w) % tot.wsum) DESC,
                        w.event_type) AS rrank
      FROM wts w, tot WHERE tot.wsum > 0),
    short AS (SELECT ({_NEY_BUDGET} - sum(base_n))::BIGINT AS leftover FROM base)
    SELECT event_type, n_rows, mad_cents,
           (base_n + CASE WHEN rrank <= short.leftover THEN 1 ELSE 0 END)::BIGINT
             AS alloc_n,
           (rrank <= short.leftover) AS got_bonus
    FROM base, short
    """


def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-style OPTIMAL stratified-sample allocation (Neyman 1934:
    sample stratum h proportionally to N_h * sigma_h — high-variance
    strata get more budget than proportional allocation gives them),
    made integer-exact end to end by an L1 dispersion proxy: sigma_h is
    replaced with the mean absolute deviation in cents, computed as
    sum(|n*c - S|) div n^2 — all integer (no sqrt, whose operand here
    would exceed 2^53 and hit the probed DuckDB decimal->double
    last-bit mis-rounding; MAD is proportional to sigma for a fixed
    distribution shape, so the allocation ORDER matches Neyman's). The
    1000-row budget is apportioned over w_h = n_h * mad_h by LARGEST
    REMAINDER (Hamilton — the domain_budget_temperature pattern), so
    sum(alloc_n) == 1000 exactly; an all-constant corpus (every
    stratum's dispersion zero => wsum = 0) yields ZERO rows on both
    engines — the r13 wsum-guard contract. HUGEINT/decimal(38,0)
    products throughout (n*c and budget*w overflow int64 inside the
    widened measure envelope). Plan shape: TWO corpus-sized hash aggs
    (moments, then deviations against the broadcast stratum moments) —
    map-side partials both; every window after runs over the
    |event_type|-row register frame. At 100 TB this is the survey-
    sampling design pass every labeling/eval pipeline budgets with."""
    ev = (
        finite_measures(
            load_table(spark, sf_dir, "events").filter(
                F.col("event_type").isNotNull() & F.col("value").isNotNull()
            )
        )
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
    )
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
    )
    disp = (
        ev.join(F.broadcast(st), "event_type")
        .select(
            "event_type",
            "n",
            F.abs(F.col("n") * F.col("c") - F.col("s")).alias("ad"),
        )
        .groupBy("event_type", "n")
        .agg(F.sum("ad").cast("decimal(38,0)").alias("adev"))
    )
    wts = disp.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        F.expr("CAST(adev div (n * n) AS BIGINT)").alias("mad_cents"),
        F.expr("CAST(n * (adev div (n * n)) AS DECIMAL(38,0))").alias("w"),
    )
    tot = wts.agg(F.sum("w").cast("decimal(38,0)").alias("wsum"))
    base = (
        wts.crossJoin(F.broadcast(tot))
        .filter(F.col("wsum") > F.lit(0))
        .select(
            "event_type",
            "n_rows",
            "mad_cents",
            F.expr(
                f"CAST((CAST({_NEY_BUDGET} AS DECIMAL(38,0)) * w) div wsum"
                " AS BIGINT)"
            ).alias("base_n"),
            F.expr(
                f"CAST((CAST({_NEY_BUDGET} AS DECIMAL(38,0)) * w) % wsum"
                " AS DECIMAL(38,0))"
            ).alias("rem"),
        )
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "event_type"))
        .alias("rrank"),
    )
    short = ranked.agg(
        (F.lit(_NEY_BUDGET) - F.sum("base_n")).cast("long").alias("leftover")
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "event_type",
            "n_rows",
            "mad_cents",
            (
                F.col("base_n")
                + F.when(F.col("rrank") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_n"),
            (F.col("rrank") <= F.col("leftover")).alias("got_bonus"),
        )
    )


# ---------------------------------------------------------------------------
# stream_sketch_kmv
# ---------------------------------------------------------------------------

_KMV_STREAM_ORACLE = f"""
    WITH hx AS (SELECT DISTINCT {{h}} AS h
                FROM events WHERE user_id IS NOT NULL),
    allr AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM hx),
    allg AS (SELECT count(*) AS cnt,
                    max(h) FILTER (WHERE rk <= {_KMV_K}) AS kth
             FROM allr HAVING count(*) > 0)
    SELECT 'ALL' AS scope,
           CASE WHEN cnt < {_KMV_K} THEN cnt
                ELSE (({_KMV_K} - 1)::HUGEINT * {_KMV_M} // kth)::BIGINT
           END AS est_distinct,
           CASE WHEN cnt >= {_KMV_K} THEN kth ELSE NULL END AS kth_hash
    FROM allg
    """.format(h=MD5INT_SQL.format(x="user_id::VARCHAR"))


def stream_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct sketch maintained over an UNBOUNDED stream with
    O(k) state — the DataSketches-theta production shape that
    dropDuplicates-style streaming distinct (state grows with the key
    universe) cannot give: each micro-batch reduces to its own 64-hash
    register (distinct + TakeOrderedAndProject inside foreachBatch),
    which merges into the running register driver-side — the union's
    k-minima, 64 longs FOREVER, the sketch-merge monoid
    sketch_kmv_distinct's test proves equal to direct construction. The
    final register's estimate therefore equals the batch sketch
    bit-for-bit, so a batch oracle hash-checks a STREAMING query (the
    stream_sketch_hll discipline; mergeability is exactly why these
    sketches exist at 100 TB — per-executor partial registers merge the
    same way). Below k the register IS the exact distinct set, so
    est_distinct is exact there by construction; an empty stream yields
    the typed zero-row frame."""
    import uuid as _uuid

    from petfinder_database_distributor_spark.streaming.incremental import (
        STREAM_SHUFFLE_PARTITIONS,
        read_event_stream,
        scoped_conf,
        stage_event_chunks,
    )

    stage = stage_event_chunks(spark, sf_dir, n_chunks=4)
    stream = read_event_stream(spark, stage, max_files=2).filter(
        F.col("user_id").isNotNull()
    )
    register: list[int] = []

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        local = (
            batch_df.select(
                md5int(F.col("user_id").cast("string")).alias("h")
            )
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
            .collect()
        )
        merged = sorted(set(register) | {int(r["h"]) for r in local})
        register[:] = merged[:_KMV_K]

    with scoped_conf(
        spark, spark__sql__shuffle__partitions=STREAM_SHUFFLE_PARTITIONS
    ):
        # temporary checkpoint (auto-created, auto-deleted): the register
        # rebuilds from scratch per call, so there is no resume state
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .queryName(f"kmv_{_uuid.uuid4().hex[:10]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not register:
        return spark.createDataFrame(
            [], "scope string, est_distinct bigint, kth_hash bigint"
        )
    cnt = len(register)
    if cnt < _KMV_K:
        est, kth = cnt, None
    else:
        kth = register[-1]
        est = (_KMV_K - 1) * _KMV_M // kth
    return spark.createDataFrame(
        [("ALL", est, kth)], "scope string, est_distinct bigint, kth_hash bigint"
    )


# ---------------------------------------------------------------------------
# STAGED manifest — tests/test_staged_r14.py verifies every triple at
# sf0.001 AND sf0.01 on every pytest run; tests/test_staged_gate.py adds
# the four degenerate-shape sweeps; round 14 promotes them.
# ---------------------------------------------------------------------------


def _staged() -> dict[str, tuple]:
    return {
        "sample_kcenter_bucketed": (
            sample_kcenter_bucketed,
            _kcb_oracle(),
            sample_kcenter_bucketed.__doc__,
        ),
        "sketch_kmv_distinct": (
            sketch_kmv_distinct,
            _kmv_oracle(),
            sketch_kmv_distinct.__doc__,
        ),
        "text_paragraph_dedup": (
            text_paragraph_dedup,
            _paragraph_oracle(),
            text_paragraph_dedup.__doc__,
        ),
        "graph_bfs_layers": (
            graph_bfs_layers,
            _bfs_oracle(),
            graph_bfs_layers.__doc__,
        ),
        "json_kv_profile": (
            json_kv_profile,
            _JSON_KV_ORACLE,
            json_kv_profile.__doc__,
        ),
        "text_zipf_fit": (
            text_zipf_fit,
            _zipf_oracle(),
            text_zipf_fit.__doc__,
        ),
        "sample_stratified_neyman": (
            sample_stratified_neyman,
            _NEYMAN_ORACLE,
            sample_stratified_neyman.__doc__,
        ),
        "stream_sketch_kmv": (
            stream_sketch_kmv,
            _KMV_STREAM_ORACLE,
            stream_sketch_kmv.__doc__,
        ),
    }


STAGED = _staged()


# ---------------------------------------------------------------------------
# Round-14 promotion: the staging bar is met (oracle parity at sf0.001 +
# sf0.01 on every pytest run since r13, 8x/32x scale probes in PLANS.md,
# and the four degenerate-shape sweeps in tests/test_staged_gate.py) —
# the eight triples register for real; registry.load_all() imports this
# module as of round 14 and the names head the r14 PRIORITY window for
# their first external driver rows.
# ---------------------------------------------------------------------------
from petfinder_database_distributor_spark.registry import register  # noqa: E402

for _name, (_fn, _oracle, _doc) in STAGED.items():
    register(_name, oracle=_oracle, doc=_doc)(_fn)
