"""Round-12 staged queries — implemented and oracle-verified THIS round,
registered NEXT round.

Staged in round 11 (the r11 driver window was an exact 50-slot
backlog drain, so registering then would have displaced names from
PRIORITY[:50]); PROMOTED in round 12: registry.load_all() imports this
module, the four names head the r12 PRIORITY window, and the STAGED
manifest remains for the staging-era tests. Every entry was
hash-verified against its DuckDB oracle at sf0.001 AND sf0.01 on every
pytest run for a full round before its first external driver row.

The four queries extend the LLM-pipeline pillars where round-10's verdict
called them thinnest or where a real curation pipeline still lacked a
step:

* ``domain_budget_unimax`` — UniMax (Chung et al. 2023) epoch-capped
  waterfilling allocation: the principled successor to the equal-share
  cap of domain_budget_sample.
* ``sample_kcenter_greedy`` — farthest-point-sampling coreset selection
  (Sener & Savarese 2018's k-Center greedy), the geometry-coverage
  complement to the distribution-matching DSIR sampler.
* ``knn_graph_cells`` — a k-NN GRAPH over every corpus vector via the
  committed IVF cells (graph-based curation / SemDeDup's cluster
  structure made reusable), not just the fixed-8-query ann_* serving
  shape.
* ``text_gopher_rules`` — the full Gopher (Rae et al. 2021, A1.1)
  per-rule quality gate, exposing each rule as its own flag where
  text_quality_score collapses four signals into one scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.operators.text import (
    DEFAULT_STOPWORDS,
    token_count,
    tokens,
)
from petfinder_database_distributor_spark.schema import load_table

# ---------------------------------------------------------------------------
# domain_budget_unimax
# ---------------------------------------------------------------------------

# UniMax epoch cap in milli-epochs: 1.15 epochs. Integer throughout —
# cap_tok = n_tok * 1150 div 1000 — so both engines agree bit-for-bit.
_UNIMAX_EPOCH_MILLI = 1150

_UNIMAX_ORACLE = f"""
    WITH tt AS (
      SELECT coalesce(source, '') AS source,
             len(list_filter(string_split_regex(lower(replace(replace(
                   trim(coalesce(text, '')), 'İ', 'i'), 'Σ', 'σ')), '\\s+'),
                 x -> x <> ''))::BIGINT AS n_tok
      FROM documents WHERE doc_id IS NOT NULL
    ),
    c AS (SELECT source, sum(n_tok)::BIGINT AS c FROM tt GROUP BY 1),
    tot AS (SELECT sum(c)::BIGINT AS b FROM c),
    o AS (SELECT source, c,
                 (c * {_UNIMAX_EPOCH_MILLI}) // 1000 AS cap,
                 row_number() OVER (ORDER BY c, source) AS rk,
                 count(*) OVER () AS n,
                 coalesce(sum((c * {_UNIMAX_EPOCH_MILLI}) // 1000)
                            OVER (ORDER BY c, source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS caps_before
          FROM c),
    f AS (SELECT o.*, tot.b,
                 (cap * (n - rk + 1) <= b - caps_before) AS cond
          FROM o, tot),
    m AS (SELECT coalesce(min(rk) FILTER (WHERE NOT cond),
                          (SELECT max(n) FROM f) + 1) - 1 AS m FROM f),
    cs AS (SELECT coalesce((SELECT sum(cap) FROM f, m WHERE rk <= m.m),
                           0)::BIGINT AS caps_m)
    SELECT source, c AS n_tok, cap AS cap_tok,
           (CASE WHEN rk <= m.m THEN cap
                 ELSE (b - cs.caps_m) // (n - m.m) END)::BIGINT AS alloc_tok,
           rk <= m.m AS capped,
           (CASE WHEN c > 0
                 THEN (CASE WHEN rk <= m.m THEN cap
                            ELSE (b - cs.caps_m) // (n - m.m) END) * 1000 // c
                 ELSE 0 END)::BIGINT AS epochs_milli
    FROM f, m, cs
"""


def domain_budget_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): give every domain its
    fair share of the total token budget, but never more than an epoch
    cap (here 1.15 epochs of its own corpus — milli-epoch integers so
    both engines agree exactly). Waterfilling closed form: sort domains
    ascending by cap; the capped set is a PREFIX (once one domain's cap
    exceeds the even share of the remaining budget, every later — larger
    — domain's does too, because the level is invariant across uncapped
    domains), so m = first rank where cap_i*(domains remaining) exceeds
    the budget left by all-capped-priors, minus one; capped domains get
    their cap, the rest split the remainder evenly (floor division —
    truncate == floor since every operand is non-negative by the prefix
    invariant). Plan shape: one hash agg per-doc -> per-source (bounded
    by |domains|), then windows/aggregates over that REGISTER-TABLE-sized
    frame only — at 100 TB the per-source frame is still ~dozens of rows;
    the corpus-sized work is the single token-count agg. Budget B = total
    corpus tokens (re-mixing, not subsetting: under-represented domains
    repeat up to the cap, over-represented ones are cut to the level)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    # NULL source ≡ '' domain (the compaction_bin_pack contract) — the
    # rank's (c, source) total order must never see a NULL key: Spark
    # sorts NULLS FIRST, DuckDB NULLS LAST, and the waterfill prefix is
    # rank-determined
    c = (
        docs.select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            token_count(F.col("text")).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("c"))
    )
    cap = F.expr(f"c * {_UNIMAX_EPOCH_MILLI} div 1000")
    # every window below runs over the per-SOURCE frame (|domains| rows —
    # a register table, same discipline as the sketch registers)
    o = c.select(
        "source",
        "c",
        cap.alias("cap"),
        F.row_number().over(Window.orderBy("c", "source")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.coalesce(
            F.sum(cap).over(
                Window.orderBy("c", "source").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ).alias("caps_before"),
        F.sum("c").over(Window.partitionBy()).alias("b"),
    )
    f = o.withColumn(
        "cond", F.col("cap") * (F.col("n") - F.col("rk") + 1) <= F.col("b") - F.col("caps_before")
    )
    m = f.agg(
        (
            F.coalesce(
                F.min(F.when(~F.col("cond"), F.col("rk"))), F.max("n") + 1
            )
            - 1
        ).alias("m")
    )
    withm = f.crossJoin(F.broadcast(m))
    caps_m = withm.agg(
        F.coalesce(
            F.sum(F.when(F.col("rk") <= F.col("m"), F.col("cap"))), F.lit(0)
        )
        .cast("long")
        .alias("caps_m")
    )
    alloc = F.when(F.col("rk") <= F.col("m"), F.col("cap")).otherwise(
        F.expr("(b - caps_m) div (n - m)")
    )
    return (
        withm.crossJoin(F.broadcast(caps_m))
        .select(
            "source",
            F.col("c").alias("n_tok"),
            F.col("cap").alias("cap_tok"),
            alloc.cast("long").alias("alloc_tok"),
            (F.col("rk") <= F.col("m")).alias("capped"),
            F.when(F.col("c") > 0, F.expr("1000") * alloc)
            .otherwise(F.lit(0))
            .alias("_em"),
            "c",
        )
        .select(
            "source",
            "n_tok",
            "cap_tok",
            "alloc_tok",
            "capped",
            F.when(F.col("c") > 0, F.expr("_em div c"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("epochs_milli"),
        )
    )


# ---------------------------------------------------------------------------
# sample_kcenter_greedy
# ---------------------------------------------------------------------------

_KCENTER_K = 8
# same embedding quantization as the ANN oracle family: round(x*1000) as
# int64, so squared-L2 distances are exact integers in both engines
_KC_QE_SQL = "list_transform(embedding::DOUBLE[], x -> round(x * 1000))"
_KC_DIST_SQL = (
    "(list_inner_product({a}, {a}) + list_inner_product({b}, {b})"
    " - 2 * list_inner_product({a}, {b}))::BIGINT"
)


def _kcenter_oracle(k: int = _KCENTER_K) -> str:
    """Unrolled k-step farthest-point-sampling in DuckDB: seed = lowest
    vec_id, then k-1 rounds of (argmax running min-distance, update)."""
    d = _KC_DIST_SQL
    ctes = [
        f"q AS (SELECT vec_id, {_KC_QE_SQL} AS qe FROM embeddings"
        " WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)",
        "s0 AS (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT 1)",
        "d0 AS (SELECT q.vec_id, q.qe, q.vec_id = s0.vec_id AS picked, "
        + d.format(a="q.qe", b="s0.qe")
        + " AS mind FROM q, s0)",
    ]
    for i in range(1, k):
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
    sel = ["SELECT 1::BIGINT AS sel_rank, vec_id, 0::BIGINT AS dist_sq FROM s0"]
    sel += [
        f"SELECT {i + 1}::BIGINT, vec_id, mind::BIGINT FROM s{i}"
        for i in range(1, k)
    ]
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(sel)


_KCENTER_ORACLE = _kcenter_oracle()


def _kc_qe(col: Column) -> Column:
    return F.transform(
        col.cast("array<double>"), lambda x: F.round(x * 1000).cast("long")
    )


def _kc_dist(qe_col: str, center: list[int]) -> Column:
    # One F.expr per center (r14 optimization): the element-wise
    # F.lit/zip_with form issued 64+ py4j calls per center per round —
    # ~2k driver round-trips across the k rounds for identical
    # aggregate(zip_with(...)) semantics.
    lits = ",".join(f"{int(v)}L" for v in center)
    return F.expr(
        f"aggregate(zip_with({qe_col}, array({lits}),"
        f" (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )


def sample_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-Center greedy coreset selection (farthest-point sampling; Sener &
    Savarese 2018, the classic active-learning/data-pruning selector):
    seed with the lowest vec_id, then k-1 rounds of "pick the vector
    farthest from everything selected so far" — the 2-approximation of
    the k-Center cover, and the geometry-COVERAGE complement to DSIR's
    distribution-matching draw. dist_sq at selection is the corpus
    covering radius as of that pick (monotone non-increasing — pinned in
    tests). Integer-exact: embeddings quantize to round(x*1000) int64,
    distances are squared L2 (<= 64 * 2000^2 — no overflow), argmax ties
    break on vec_id. Plan shape: k-1 bounded driver iterations, each ONE
    narrow map over the corpus (running-min distance to <=k inlined
    literal centers — 64 ints each, no join, no shuffle) closed by a
    TakeOrderedAndProject(1); the only driver pulls are k single-row
    collects (the same bounded-metadata discipline as the k-means seed
    pulls). DEPLOYMENT POSTURE (r14, per the r13 verdict): this is the
    EXACTNESS WITNESS, not the default-scale path — its k sequential
    corpus scans are the last serial-scan shape in the engine's top-15.
    Deploy sample_kcenter_bucketed (plans/staged_r14.py, registered
    r14): two corpus passes total at any k, with this query as the
    quality reference its covering radius is audited against."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    # r14 optimization, r15 cleanup: the k-1 rounds below each re-scan
    # the corpus; the quantized frame is the only input they share, so
    # materialize it ONCE (DISK_ONLY — corpus-bulk discipline) instead of
    # paying the parquet scan + quantize transform k times (guide §5
    # caching: reused k times; the witness's sequential shape itself is
    # unchanged — sample_kcenter_bucketed stays the 100 TB path). r15
    # (ADVICE): persist + try/finally unpersist rather than the r14
    # localCheckpoint — checkpoint blocks are not cache-manager-tracked,
    # so they lingered on executors until driver GC (a leak across a
    # 216-query bench session), and the truncated lineage made the query
    # unrecoverable on executor loss. The persisted plan is re-analyzed
    # per round, but it is three nodes deep — recompute safety and
    # deterministic cleanup win.
    from pyspark.storagelevel import StorageLevel

    q = emb.select("vec_id", _kc_qe(F.col("embedding")).alias("qe")).persist(
        StorageLevel.DISK_ONLY
    )
    try:
        seed_rows = q.orderBy("vec_id").limit(1).collect()
        if not seed_rows:
            # degenerate input: no vectors → empty selection, same schema
            # the oracle produces (its seed CTE is empty too) — never an
            # IndexError
            return spark.createDataFrame(
                [], "sel_rank bigint, vec_id bigint, dist_sq bigint"
            )
        # populate the cache fully before the rounds (count scans every
        # partition of the persisted relation, caching all its columns)
        q.count()
        seed = seed_rows[0]
        selected = [(1, int(seed["vec_id"]), 0, list(seed["qe"]))]
        for i in range(2, _KCENTER_K + 1):
            mind = F.least(
                *[_kc_dist("qe", c[3]) for c in selected]
            ) if len(selected) > 1 else _kc_dist("qe", selected[0][3])
            picked_ids = [c[1] for c in selected]
            nxt = (
                q.filter(~F.col("vec_id").isin(picked_ids))
                .select("vec_id", "qe", mind.alias("mind"))
                .orderBy(F.col("mind").desc(), "vec_id")
                .limit(1)
                .collect()
            )
            if not nxt:
                break
            r = nxt[0]
            selected.append((i, int(r["vec_id"]), int(r["mind"]), list(r["qe"])))
        return spark.createDataFrame(
            [(r, v, d) for r, v, d, _ in selected],
            "sel_rank bigint, vec_id bigint, dist_sq bigint",
        )
    finally:
        q.unpersist()


# ---------------------------------------------------------------------------
# knn_graph_cells
# ---------------------------------------------------------------------------

_KNN_K = 3


def _knn_graph_oracle(corpus_pred: str | None = None) -> str:
    """The recompute ground truth over the index corpus; ``corpus_pred``
    overrides the trained slice (knn_graph_retrain_recover's trimmed
    witness corpus — the refusal argument is scale-free, so the witness
    proves the identical lifecycle on a quarter of the data)."""
    from petfinder_database_distributor_spark.operators.similarity import (
        NONZERO_VEC_SQL,
    )
    from petfinder_database_distributor_spark.plans.corpus_ops import (
        _ann_idx_train_sql,
    )
    from petfinder_database_distributor_spark.plans.llm_pipeline import _COS_SQL

    cos = _COS_SQL.format(a="ea.embedding", b="eb.embedding")
    nz_pred = NONZERO_VEC_SQL.format(v="embedding")
    train = (
        _ann_idx_train_sql(corpus_pred) if corpus_pred else _ann_idx_train_sql()
    )
    return f"""
    WITH {train},
    nz AS (SELECT vec_id FROM embeddings WHERE {nz_pred}),
    pairs AS (SELECT a.vec_id, b.vec_id AS nbr_id
              FROM ivf a JOIN ivf b USING (centroid_id)
              WHERE a.vec_id <> b.vec_id
                AND a.vec_id IN (SELECT vec_id FROM nz)
                AND b.vec_id IN (SELECT vec_id FROM nz)),
    scored AS (SELECT p.vec_id, p.nbr_id, {cos} AS cos
               FROM pairs p
               JOIN embeddings ea ON ea.vec_id = p.vec_id
               JOIN embeddings eb ON eb.vec_id = p.nbr_id)
    SELECT vec_id, nbr_id, rank, round(cos, 6) AS cos_r
    FROM (SELECT vec_id, nbr_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, nbr_id) AS rank
          FROM scored)
    WHERE rank <= {_KNN_K}
    """


def knn_graph_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH over every corpus vector via the committed IVF cells —
    the curation-graph shape (graph-based filtering, cluster-quality
    audits, SemDeDup-style analyses) that the fixed-8-query ann_* serving
    family can't provide: EVERY vector is a query, candidates are its own
    committed cell's members (the SemDeDup candidate discipline turned
    into a reusable artifact), scores are exact cosine on the raw
    embeddings, and each vector keeps its top-3 neighbors through a
    hash-partitioned per-vector window. Reuses the staged snapshot index
    (v0 reads, zero Lloyd iterations in the plan) and
    semdedup_decisions' Sum(|cell|^2) pair budget guard — a corpus that
    outgrew its cell count REFUSES with the executable fix named
    (ann_index_retrain with more cells) instead of launching a quadratic
    shuffle. The oracle retrains the identical integer-exact structures
    from scratch, so parity also proves committed-cells == recompute.
    Scale: within-cell self-join is Sum(|cell|^2) ~ n^2/n_clusters —
    bounded by the same guard+retrain loop SemDeDup uses; vectors in
    singleton cells have no in-cell neighbors and are absent, as in
    FAISS's IVF-restricted search."""
    from petfinder_database_distributor_spark.plans.corpus_ops import (
        _ann_index_root,
    )
    from petfinder_database_distributor_spark.sources.snapshot import snapshot_read

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    root = _ann_index_root(spark, sf_dir)
    codes = snapshot_read(spark, f"{root}/codes", version=0)
    members = codes.select("vec_id", "centroid_id").join(emb, "vec_id")
    return knn_graph_decisions(members)


def knn_graph_decisions(
    members: DataFrame, k: int = _KNN_K, pair_budget: int = 10_000_000
) -> DataFrame:
    """The graph core over an assigned membership frame (vec_id,
    centroid_id, embedding) — split out of the query (the
    semdedup_decisions discipline) so the guard -> retrain(n_clusters up)
    -> rerun recovery loop is an executable, tested path
    (tests/test_staged_r12.py::test_knn_guard_retrain_recovery), not just
    a message. Sum(|cell|^2) refusal guard: one bounded n_clusters-row
    agg; past the budget the within-cell self-join is refused with the
    fix named rather than launched."""
    from petfinder_database_distributor_spark.operators.similarity import (
        as_double,
        cosine,
    )

    # Zero-norm contract — see operators/similarity.py::nonzero_vectors
    # (ANSI divide-by-zero on dirty rows; the r12 family-wide guard)
    from petfinder_database_distributor_spark.operators.similarity import (
        nonzero_vectors,
    )

    members = nonzero_vectors(members)
    pairs_est = sum(
        r["n"] * r["n"]
        for r in members.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if pairs_est > pair_budget:
        raise ValueError(
            f"knn_graph_cells: within-cell pair volume ~{pairs_est:,} exceeds "
            f"the {pair_budget:,} budget — retrain the index with more cells "
            "(ann_index_retrain(n_clusters=...)) so cell sizes shrink"
        )
    a = members.select(
        F.col("vec_id"), "centroid_id", as_double(F.col("embedding")).alias("va")
    )
    b = members.select(
        F.col("vec_id").alias("nbr_id"),
        "centroid_id",
        as_double(F.col("embedding")).alias("vb"),
    )
    scored = (
        a.join(b, "centroid_id")
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .select("vec_id", "nbr_id", cosine(F.col("va"), F.col("vb")).alias("cos"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "nbr_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nbr_id", "rank", F.round("cos", 6).alias("cos_r"))
    )


# ---------------------------------------------------------------------------
# text_gopher_rules
# ---------------------------------------------------------------------------

# Gopher's stop-word rule ("contains at least 2 of a required stop-word
# set") parameterized with the repo-wide DEFAULT_STOPWORDS (operators/
# text.py) instead of the paper's English 8 ('be'/'to'/'that'/... never
# occur in the synthetic corpus vocabulary, which would make the rule a
# constant-false — a production deployment swaps the list per language).
# Imported, not copied, so the two lists cannot drift (r11 advice).
_GOPHER_STOPS = DEFAULT_STOPWORDS


def _gopher_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    stop_sum = " + ".join(
        f"CASE WHEN list_contains(t, '{s}') THEN 1 ELSE 0 END"
        for s in _GOPHER_STOPS
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    base AS (
      SELECT doc_id, coalesce(text, '') AS raw, t,
             len(t)::BIGINT AS n,
             coalesce(list_sum(list_transform(t, w -> length(w))), 0)::BIGINT AS chars,
             len(list_filter(t, w -> regexp_matches(w, '[a-z]')))::BIGINT AS alpha_w,
             ({stop_sum})::BIGINT AS stops
      FROM toks),
    m AS (
      SELECT doc_id, n,
             CASE WHEN n > 0 THEN chars * 1000 // n ELSE 0 END AS mwl_milli,
             (length(raw) - length(replace(raw, '#', '')))::BIGINT AS hash_cnt,
             ((length(raw) - length(replace(raw, '...', ''))) // 3)::BIGINT AS ell_cnt,
             string_split(raw, chr(10)) AS lines,
             alpha_w, stops
      FROM base),
    l AS (
      SELECT doc_id, n, mwl_milli, hash_cnt, ell_cnt, alpha_w, stops,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, x -> starts_with(ltrim(x), '- ')
                                       OR starts_with(ltrim(x), '* ')
                                       OR starts_with(ltrim(x), '•')))::BIGINT AS bullet_lines,
             len(list_filter(lines, x -> ends_with(rtrim(x), '...')))::BIGINT AS endell_lines
      FROM m)
    SELECT doc_id, n AS n_words, mwl_milli,
           (n BETWEEN 50 AND 100000) AS r_wordcount,
           (mwl_milli BETWEEN 3000 AND 10000) AS r_meanwordlen,
           (hash_cnt * 10 <= n AND ell_cnt * 10 <= n) AS r_symbol,
           (bullet_lines * 10 <= 9 * n_lines) AS r_bullet,
           (endell_lines * 10 <= 3 * n_lines) AS r_ellipsis,
           (alpha_w * 5 >= 4 * n) AS r_alpha,
           (stops >= 2) AS r_stopwords,
           ((n BETWEEN 50 AND 100000)
            AND (mwl_milli BETWEEN 3000 AND 10000)
            AND (hash_cnt * 10 <= n AND ell_cnt * 10 <= n)
            AND (bullet_lines * 10 <= 9 * n_lines)
            AND (endell_lines * 10 <= 3 * n_lines)
            AND (alpha_w * 5 >= 4 * n)
            AND (stops >= 2)) AS keep
    FROM l
    """


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher quality rule set (Rae et al. 2021, appendix A1.1)
    as per-rule flags — the rule-level transparency a production corpus
    pipeline needs for ablations, where text_quality_score collapses four
    signals into one scalar: word count in [50, 100k]; mean word length
    in [3, 10] (milli-integer — no float division); symbol-to-word ratio
    <= 0.1 for EACH of '#' and '...' separately (the paper applies the
    threshold per symbol); <= 90% of lines bullet-led; <= 30% of
    lines ellipsis-terminated; >= 80% of words containing an [a-z]
    letter; >= 2 distinct required stopwords present. Every comparison is
    integer cross-multiplication (ratio <= p/q as q*count <= p*total) —
    zero float arithmetic, so both engines agree bit-for-bit. Plan: pure
    per-row narrow projections over one tokenization — no joins, no
    shuffles, no UDFs; at 100 TB this is a single embarrassingly-parallel
    scan with full column pruning."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.coalesce(F.col("text"), F.lit(""))
    # r15 (guide §1.2): the flags below reference the token array ~9x
    # (size, aggregate, filter, one array_contains per required stopword)
    # through interpreted HOF slots, which get no codegen CSE — inline,
    # every document tokenized ~9x/row. Materialize the array once.
    toked = docs.select(
        "doc_id", F.col("text"), tokens(F.col("text")).alias("__toks")
    )
    t = F.col("__toks")
    base = toked.select(
        "doc_id",
        raw.alias("raw"),
        t.alias("t"),
        F.size(t).cast("long").alias("n"),
        F.coalesce(
            F.aggregate(
                t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
            ),
            F.lit(0),
        ).alias("chars"),
        F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).cast("long").alias("alpha_w"),
        sum(
            [
                F.when(F.array_contains(t, s), F.lit(1)).otherwise(F.lit(0))
                for s in _GOPHER_STOPS
            ],
            F.lit(0),
        )
        .cast("long")
        .alias("stops"),
    )
    m = base.select(
        "doc_id",
        "n",
        F.when(F.col("n") > 0, F.expr("chars * 1000 div n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mwl_milli"),
        (F.length("raw") - F.length(F.expr("replace(raw, '#', '')")))
        .cast("long")
        .alias("hash_cnt"),
        F.expr("(length(raw) - length(replace(raw, '...', ''))) div 3")
        .cast("long")
        .alias("ell_cnt"),
        F.split(F.col("raw"), "\n", -1).alias("lines"),
        "alpha_w",
        "stops",
    )
    is_bullet = (
        lambda x: F.ltrim(x).startswith("- ")
        | F.ltrim(x).startswith("* ")
        | F.ltrim(x).startswith("•")
    )
    l = m.select(
        "doc_id",
        "n",
        "mwl_milli",
        "hash_cnt",
        "ell_cnt",
        "alpha_w",
        "stops",
        F.size("lines").cast("long").alias("n_lines"),
        F.size(F.filter(F.col("lines"), is_bullet)).cast("long").alias("bullet_lines"),
        F.size(F.filter(F.col("lines"), lambda x: F.rtrim(x).endswith("...")))
        .cast("long")
        .alias("endell_lines"),
    )
    r_wc = F.col("n").between(50, 100000)
    r_mwl = F.col("mwl_milli").between(3000, 10000)
    r_sym = (F.col("hash_cnt") * 10 <= F.col("n")) & (
        F.col("ell_cnt") * 10 <= F.col("n")
    )
    r_bul = F.col("bullet_lines") * 10 <= 9 * F.col("n_lines")
    r_ell = F.col("endell_lines") * 10 <= 3 * F.col("n_lines")
    r_alp = F.col("alpha_w") * 5 >= 4 * F.col("n")
    r_stp = F.col("stops") >= 2
    return l.select(
        "doc_id",
        F.col("n").alias("n_words"),
        "mwl_milli",
        r_wc.alias("r_wordcount"),
        r_mwl.alias("r_meanwordlen"),
        r_sym.alias("r_symbol"),
        r_bul.alias("r_bullet"),
        r_ell.alias("r_ellipsis"),
        r_alp.alias("r_alpha"),
        r_stp.alias("r_stopwords"),
        (r_wc & r_mwl & r_sym & r_bul & r_ell & r_alp & r_stp).alias("keep"),
    )


# ---------------------------------------------------------------------------
# STAGED — the round-12 registration manifest. Promotion = move each
# triple under @register in its home plans module (or import this module
# from registry.load_all after decorating) and place the names at the
# head of the round-12 PRIORITY window.
# ---------------------------------------------------------------------------


def _staged() -> dict[str, tuple]:
    """The four (fn, oracle, doc) triples. Kept as a manifest dict (the
    staging-era tests iterate it); registration happens below."""
    return {
        "domain_budget_unimax": (
            domain_budget_unimax,
            _UNIMAX_ORACLE,
            domain_budget_unimax.__doc__,
        ),
        "sample_kcenter_greedy": (
            sample_kcenter_greedy,
            _KCENTER_ORACLE,
            sample_kcenter_greedy.__doc__,
        ),
        "knn_graph_cells": (
            knn_graph_cells,
            _knn_graph_oracle(),
            knn_graph_cells.__doc__,
        ),
        "text_gopher_rules": (
            text_gopher_rules,
            _gopher_oracle(),
            text_gopher_rules.__doc__,
        ),
    }


STAGED = _staged()


# ---------------------------------------------------------------------------
# Round-12 promotion: the staging bar is met (oracle parity at sf0.001 +
# sf0.01 on every pytest run since r11, 8x/32x scale probes, plan
# evidence in PLANS.md), so the four triples register for real —
# registry.load_all() imports this module as of round 12 and the names
# head the r12 PRIORITY window for their first external driver rows.
# ---------------------------------------------------------------------------
from petfinder_database_distributor_spark.registry import register  # noqa: E402

for _name, (_fn, _oracle, _doc) in STAGED.items():
    register(_name, oracle=_oracle, doc=_doc)(_fn)

# knn_graph_cells' guard -> retrain -> rerun loop as a registered query
# (r11 verdict #5) — lives in plans/corpus_ops.py with the rest of the
# index lifecycle, registered here where its oracle (the SAME recompute
# ground truth as knn_graph_cells — parity proves the recovered index
# CONVERGES to the well-provisioned answer) is constructible.
from petfinder_database_distributor_spark.plans.corpus_ops import (  # noqa: E402
    KNN_RECOVER_PRED_SQL,
    knn_graph_retrain_recover,
)

register(
    "knn_graph_retrain_recover",
    # same recompute ground truth, over the witness's trimmed slice
    oracle=_knn_graph_oracle(KNN_RECOVER_PRED_SQL),
    doc=knn_graph_retrain_recover.__doc__,
)(knn_graph_retrain_recover)
