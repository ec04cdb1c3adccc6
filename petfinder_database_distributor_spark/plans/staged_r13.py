"""Round-13 staged queries — implemented and oracle-verified in round 12,
registered next round (the stage-then-promote discipline of
plans/staged_r12.py: the r12 driver window is an exact 50-slot fit of
new registrations + the three dirty-data contract families + the r8
drain, so these four carry the full registration bar — (fn, oracle, doc)
triple, sf0.001+sf0.01 hash parity on every pytest run via
tests/test_staged_r13.py — without displacing window names).

The four queries extend the pillars where coverage is thinnest after
round 12:

* ``text_c4_rules`` — the C4 line/document cleaning rules (Raffel et
  al. 2020, §2.2), the rule-transparent sibling of text_gopher_rules:
  per-line terminal-punctuation / minimum-word gates and the
  lorem-ipsum / brace / javascript document gates, each surfaced as its
  own flag for ablations.
* ``domain_budget_temperature`` — temperature-scaled domain sampling
  (the multilingual-mixing rule of Conneau et al. 2020's XLM-R and
  mT5's alpha-sampling) at tau=2 (alpha=0.5): allocation proportional
  to sqrt(corpus share), made integer-exact via correctly-rounded IEEE
  sqrt + largest-remainder apportionment that sums EXACTLY to budget.
* ``text_vocab_coverage`` — tokenizer-planning coverage curve: the
  fraction of corpus token occurrences covered by the top-k vocabulary
  (k = 100 / 1k / 10k), the measurement that sizes a vocab before
  training one.
* ``graph_kcore_decomposition`` — k-core peeling over the bipartite
  part–supplier graph (the cohesion primitive of graph-based curation;
  Seidman 1983): iteratively drop nodes with degree < k until stable.
  Spark runs the bounded peeling loop; the oracle unrolls the SAME
  number of rounds, so parity holds by construction and a separate
  fixed-point test pins convergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from petfinder_database_distributor_spark.operators.text import token_count, tokens
from petfinder_database_distributor_spark.schema import load_table

# ---------------------------------------------------------------------------
# text_c4_rules
# ---------------------------------------------------------------------------

# A kept line ends in terminal punctuation AND carries >= 5 words AND
# does not mention javascript (C4 drops those outright). Document gates:
# >= 3 kept lines (the sentence-count proxy — the fixture has no
# sentence segmenter, and C4's own gate is "at least 3 sentences"),
# no 'lorem ipsum', no '{'.
_C4_MIN_WORDS = 5
_C4_MIN_KEPT_LINES = 3
_C4_TERMINALS = (".", "!", "?", '"')


def _c4_oracle() -> str:
    term = " OR ".join(
        f"ends_with(rtrim(x), '{t}')" for t in _C4_TERMINALS
    ).replace('"', '"')
    # DuckDB needs the double-quote terminal escaped inside the lambda
    term = term.replace("ends_with(rtrim(x), '\"')", "ends_with(rtrim(x), chr(34))")
    nwords = (
        "len(list_filter(string_split_regex(x, '\\s+'), w -> w <> ''))"
    )
    return f"""
    WITH l AS (
      SELECT doc_id,
             string_split(coalesce(text, ''), chr(10)) AS lines,
             contains(lower(coalesce(text, '')), 'lorem ipsum') AS has_lorem,
             contains(coalesce(text, ''), '{{') AS has_brace
      FROM documents WHERE doc_id IS NOT NULL),
    m AS (
      SELECT doc_id, has_lorem, has_brace,
             len(lines)::BIGINT AS n_lines,
             len(list_filter(lines, x -> ({term})
                   AND {nwords} >= {_C4_MIN_WORDS}
                   AND NOT contains(lower(x), 'javascript')))::BIGINT AS kept_lines,
             len(list_filter(lines, x -> NOT ({term})))::BIGINT AS dropped_punct,
             len(list_filter(lines, x -> {nwords} < {_C4_MIN_WORDS}))::BIGINT AS dropped_short
      FROM l)
    SELECT doc_id, n_lines, kept_lines, dropped_punct, dropped_short,
           has_lorem, has_brace,
           (kept_lines >= {_C4_MIN_KEPT_LINES}
            AND NOT has_lorem AND NOT has_brace) AS keep
    FROM m
    """


def text_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as per-rule flags —
    line gates (ends in terminal punctuation; >= 5 words; no
    'javascript') counted per document, document gates (>= 3 kept lines
    as the sentence proxy; no 'lorem ipsum'; no '{') as booleans, and
    the composite keep. All counting is integer, all predicates are
    byte-exact string tests, so both engines agree bit-for-bit. On the
    punctuation-free synthetic corpus the verdict is constant-reject —
    C4's verbatim answer for non-prose (the terminal-punctuation gate is
    the C4 rule that bites hardest on web text too); the per-rule
    counters are the ablation surface, and the synthetic-edge test pins
    each gate in isolation. Plan:
    ONE narrow projection over one split — no joins, no shuffles, no
    UDFs; at 100 TB an embarrassingly-parallel scan with full column
    pruning, the same shape as text_gopher_rules (PLANS.md)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    raw = F.coalesce(F.col("text"), F.lit(""))
    # r15 (guide §1.2): the four line-counters below each reference the
    # line array from interpreted HOF slots (no codegen CSE) — inline,
    # every document re-split 4x/row. Materialize the split once.
    lined = docs.select(
        "doc_id", F.col("text"), F.split(raw, "\n", -1).alias("__lines")
    )
    lines = F.col("__lines")

    def is_term(x: Column) -> Column:
        r = F.rtrim(x)
        out = r.endswith(_C4_TERMINALS[0])
        for t in _C4_TERMINALS[1:]:
            out = out | r.endswith(t)
        return out

    def n_words(x: Column) -> Column:
        return F.size(F.filter(F.split(x, r"\s+", -1), lambda w: w != ""))

    kept = F.filter(
        lines,
        lambda x: is_term(x)
        & (n_words(x) >= _C4_MIN_WORDS)
        & ~F.lower(x).contains("javascript"),
    )
    m = lined.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("kept_lines"),
        F.size(F.filter(lines, lambda x: ~is_term(x))).cast("long").alias("dropped_punct"),
        F.size(F.filter(lines, lambda x: n_words(x) < _C4_MIN_WORDS))
        .cast("long")
        .alias("dropped_short"),
        F.lower(raw).contains("lorem ipsum").alias("has_lorem"),
        raw.contains("{").alias("has_brace"),
    )
    return m.select(
        "doc_id",
        "n_lines",
        "kept_lines",
        "dropped_punct",
        "dropped_short",
        "has_lorem",
        "has_brace",
        (
            (F.col("kept_lines") >= _C4_MIN_KEPT_LINES)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# domain_budget_temperature
# ---------------------------------------------------------------------------

# tau=2 (alpha=0.5): weight ∝ sqrt(domain token count). sqrt is the ONE
# non-integer op — IEEE-754 requires it correctly rounded, so JVM and
# DuckDB produce the identical double; floor(sqrt(c) * 1000) then
# quantizes to an integer milli-weight (the multiply is a single
# correctly-rounded op on identical inputs — also bit-identical).
_TEMP_W_SQL = "floor(sqrt(c::DOUBLE) * 1000)::BIGINT"

_TEMP_ORACLE = f"""
    WITH tt AS (
      SELECT coalesce(source, '') AS source,
             len(list_filter(string_split_regex(lower(replace(replace(
                   trim(coalesce(text, '')), 'İ', 'i'), 'Σ', 'σ')), '\\s+'),
                 x -> x <> ''))::BIGINT AS n_tok
      FROM documents WHERE doc_id IS NOT NULL
    ),
    c AS (SELECT source, sum(n_tok)::BIGINT AS c FROM tt GROUP BY 1),
    w AS (SELECT source, c, {_TEMP_W_SQL} AS w FROM c),
    tot AS (SELECT sum(c)::BIGINT AS b, sum(w)::HUGEINT AS wsum FROM w),
    base AS (
      -- wsum = 0 guard (r12 advice): an all-empty-text corpus gives
      -- every domain weight 0, so the apportionment divisor vanishes —
      -- there is no budget to apportion and the contract is ZERO ROWS
      -- (same degenerate-corpus convention as text_vocab_coverage).
      SELECT w.source, w.c, w.w, tot.b,
             ((tot.b::HUGEINT * w.w) // tot.wsum)::BIGINT AS base_tok,
             ((tot.b::HUGEINT * w.w) % tot.wsum)::HUGEINT AS rem,
             row_number() OVER (
               ORDER BY ((tot.b::HUGEINT * w.w) % tot.wsum) DESC, w.source
             ) AS rrank
      FROM w, tot WHERE tot.wsum > 0),
    short AS (SELECT (max(b) - sum(base_tok))::BIGINT AS leftover FROM base)
    SELECT source, c AS n_tok, w AS weight_milli,
           (base_tok + CASE WHEN rrank <= short.leftover THEN 1 ELSE 0 END)::BIGINT
             AS alloc_tok,
           (rrank <= short.leftover) AS got_bonus
    FROM base, short
"""


def domain_budget_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling budget (tau=2, alpha=0.5 — the
    sqrt-share mixing rule of XLM-R/mT5): each domain's share of the
    token budget B (= total corpus tokens) is proportional to
    sqrt(its corpus size), flattening the head and lifting the tail one
    principled notch less aggressively than UniMax's hard epoch cap.
    Integer-exact end to end: milli-weights w = floor(sqrt(c)*1000)
    (correctly-rounded IEEE sqrt — bit-identical cross-engine), base
    allocation B*w div W in DECIMAL(38,0) (B*w overflows int64 at
    ~100 TB corpus sizes; decimal/HUGEINT products are exact in both
    engines), and the floor shortfall is distributed by LARGEST
    REMAINDER (Hamilton apportionment, remainder-then-source order), so
    sum(alloc_tok) == B exactly — the no-silent-drift property a
    production mixer needs, pinned by test. Plan: one corpus-sized
    token-count agg; every window/aggregate after runs over the
    |domains|-row register frame (the UniMax discipline — see the
    plan-quality allowlist)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    c = (
        docs.select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            token_count(F.col("text")).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("c"))
    )
    # |domains|-row frame whose LINEAGE is the corpus-sized token agg —
    # materialize once (localCheckpoint) or every downstream consumer
    # (tot / ranked / short) re-runs the corpus scan (4 scans observed)
    w = c.select(
        "source",
        "c",
        F.floor(F.sqrt(F.col("c").cast("double")) * 1000).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    tot = w.agg(
        F.sum("c").cast("long").alias("b"),
        F.sum("w").cast("decimal(38,0)").alias("wsum"),
    )
    # |domains|-row frame from here on (register-table class).
    # wsum = 0 guard (r12 advice): an all-empty-text corpus zeroes every
    # milli-weight, so ANSI `bw div wsum` would raise DIVIDE_BY_ZERO —
    # with no weight mass there is no apportionment; contract = 0 rows
    # on BOTH engines (the oracle's base CTE carries the same filter).
    base = (
        w.crossJoin(F.broadcast(tot))
        .filter(F.col("wsum") > F.lit(0))
        .select(
            "source",
            "c",
            "w",
            "b",
            (
                (F.col("b").cast("decimal(38,0)") * F.col("w"))
                .cast("decimal(38,0)")
            ).alias("bw"),
            F.col("wsum"),
        )
        .select(
            "source",
            "c",
            "w",
            "b",
            F.expr("CAST(bw div wsum AS BIGINT)").alias("base_tok"),
            F.expr("CAST(bw % wsum AS DECIMAL(38,0))").alias("rem"),
        )
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "source"))
        .alias("rrank"),
    )
    short = ranked.agg(
        (F.max("b") - F.sum("base_tok")).cast("long").alias("leftover")
    )
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "source",
            F.col("c").alias("n_tok"),
            F.col("w").alias("weight_milli"),
            (
                F.col("base_tok")
                + F.when(F.col("rrank") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_tok"),
            (F.col("rrank") <= F.col("leftover")).alias("got_bonus"),
        )
    )


# ---------------------------------------------------------------------------
# text_vocab_coverage
# ---------------------------------------------------------------------------

_VOCAB_KS = (100, 1000, 10000)


def _vocab_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    ks = ", ".join(f"({k})" for k in _VOCAB_KS)
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (SELECT u.x AS term, count(*)::BIGINT AS tf
           FROM toks, unnest(toks.t) u(x) GROUP BY 1),
    tot AS (SELECT sum(tf)::BIGINT AS total_tok, count(*)::BIGINT AS vocab_size
            FROM tf HAVING count(*) > 0),
    top AS (SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term) AS rk
            FROM tf ORDER BY tf DESC, term LIMIT {max(_VOCAB_KS)}),
    ks(k) AS (VALUES {ks})
    SELECT ks.k::BIGINT AS k, tot.vocab_size,
           coalesce(sum(top.tf) FILTER (WHERE top.rk <= ks.k), 0)::BIGINT
             AS covered_tok,
           tot.total_tok,
           (coalesce(sum(top.tf) FILTER (WHERE top.rk <= ks.k), 0)
              * 1000000 // tot.total_tok)::BIGINT AS coverage_ppm
    FROM ks, tot LEFT JOIN top ON true
    GROUP BY ks.k, tot.vocab_size, tot.total_tok
    """


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-planning vocabulary coverage curve: for k in {100, 1k,
    10k}, the fraction (ppm integer) of all corpus token OCCURRENCES
    covered by the k most frequent terms (ties broken lexically) — the
    measurement that sizes a vocabulary before training one (a 10k vocab
    covering 99.9% of occurrences says most of a larger vocab would be
    tail singletons). Plan: one corpus-sized term-frequency agg with
    map-side partials; the global top-k rides orderBy().limit() —
    TakeOrderedAndProject (per-partition heaps, never a full sort) — and
    everything after runs over that bounded <=10k-row frame (the
    register-table window class, see the plan-quality allowlist) plus
    two broadcast scalars. At 100 TB the only corpus-sized work is the
    tf agg; the curve itself is metadata-sized. An EMPTY corpus has no
    curve: zero rows on both engines (the oracle's HAVING empties its
    scalar CTE; Spark's empty top-k crossJoin is already empty)."""
    docs = load_table(spark, sf_dir, "documents")
    # |vocab|-row frame feeding TWO consumers (scalars + top-k) —
    # materialize once so the corpus explode+agg runs a single time
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    # two corpus-level scalars in ONE pass, broadcast to the 3-row output
    tot = tf.agg(
        F.sum("tf").cast("long").alias("total_tok"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    top = (
        tf.orderBy(F.col("tf").desc(), "term")
        .limit(max(_VOCAB_KS))
        .select(
            "term",
            "tf",
            F.row_number()
            .over(Window.orderBy(F.col("tf").desc(), "term"))
            .alias("rk"),
        )
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _VOCAB_KS])).alias("k")
    )
    covered = (
        ks.crossJoin(top)
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("rk") <= F.col("k"), F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias("covered_tok")
        )
    )
    return (
        covered.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "vocab_size",
            "covered_tok",
            "total_tok",
            F.expr("covered_tok * 1000000 div total_tok").alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# graph_kcore_decomposition
# ---------------------------------------------------------------------------

_KCORE_K = 3
# Bounded peeling rounds, UNROLLED identically in both engines: parity
# holds by construction at any round count; convergence at the fixture
# scales is pinned separately (test_staged_r13.py asserts a further
# round is a fixed point). At 100 TB the round count is the usual
# O(peeling depth) bulk-synchronous iteration — same class as the
# components/label-prop loops.
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    # AS MATERIALIZED on every unrolled CTE: each round references the
    # previous round's edge CTE three times, and inlining would expand
    # the chain into 3^rounds scans of lineitem (observed: fd exhaustion)
    ctes = [
        # part nodes 2p, supplier nodes 2s+1 (the pagerank namespacing)
        "e0 AS MATERIALIZED (SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b"
        " FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL)",
    ]
    prev = "e0"
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, count(*)::BIGINT AS deg FROM (
        SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
      GROUP BY node HAVING count(*) >= {_KCORE_K})"""
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.a, e.b FROM {prev} e"
            f" JOIN d{i} da ON da.node = e.a"
            f" JOIN d{i} db ON db.node = e.b)"
        )
        prev = f"e{i}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, count(*)::BIGINT AS degree,
           CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS side
    FROM (SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
    GROUP BY node HAVING count(*) >= {_KCORE_K}
    """
    )


def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the bipartite part–supplier graph
    from lineitem (nodes namespaced 2p / 2s+1, the pagerank convention):
    iteratively delete nodes with degree < k — with their edges — until
    the remaining subgraph is stable; survivors with their final in-core
    degrees are the k-core (Seidman 1983), graph-curation's cohesion
    primitive (a crawl page kept only by low-degree link spam peels
    away; a dense topical cluster survives). Spark runs the bounded
    peeling loop — each round ONE degree agg + one semi-join edge
    filter, localCheckpoint-materialized so round r+1 never re-runs
    round r's lineage (the components-loop discipline; driver pulls are
    zero) — and the oracle UNROLLS the identical rounds, so hash parity
    holds by construction at every scale; an extra-round fixed-point
    test pins that {rounds} rounds suffice at the fixture scales. At
    100 TB this is the O(depth) bulk-synchronous shape of the
    components/label-prop family: per-round cost is one shuffle on
    node id, state is the shrinking edge list itself."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    )
    edges = (
        li.select(
            (F.col("l_partkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        nodes = edges.select(F.col("a").alias("node")).unionAll(
            edges.select(F.col("b").alias("node"))
        )
        deg = (
            nodes.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
        )
        edges = (
            edges.join(deg.select(F.col("node").alias("a")), "a", "leftsemi")
            .join(deg.select(F.col("node").alias("b")), "b", "leftsemi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    survivors = edges.select(F.col("a").alias("node")).unionAll(
        edges.select(F.col("b").alias("node"))
    )
    return (
        survivors.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .filter(F.col("degree") >= _KCORE_K)
        .select(
            "node",
            "degree",
            F.when(F.col("node") % 2 == 0, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("side"),
        )
    )


graph_kcore_decomposition.__doc__ = graph_kcore_decomposition.__doc__.format(
    rounds=_KCORE_ROUNDS
)


# ---------------------------------------------------------------------------
# text_gopher_repetition
# ---------------------------------------------------------------------------

# Gopher A1.2 repetition thresholds, in ppm of document characters:
# top-2-gram <= 20%, top-3 <= 18%, top-4 <= 16%, duplicated-5-gram
# <= 15%. (The paper also gates n = 6..10 and duplicate lines/paragraphs;
# the 2-4 top-gram + 5-dup-gram core is the discriminative half on
# single-line corpora, and the line half lives in text_c4_rules'
# counters.) A gram's character mass is the length of its joined
# "a b c" form times its occurrence count; the denominator is the
# token-joined document length — both integer, so every rule is an
# exact cross-multiplication-free ppm compare on identical integers.
_REP_RULES = {2: 200_000, 3: 180_000, 4: 160_000}
_REP_DUP_N = 5
_REP_DUP_PPM = 150_000


def _repetition_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    gram_sel = "\n      UNION ALL ".join(
        f"SELECT doc_id, {n} AS n, g FROM base, "
        f"unnest([list_aggr(t[i:i+{n - 1}], 'string_agg', ' ') "
        f"for i in range(1, len(t) - {n - 2})]) u(g)"
        for n in (*_REP_RULES, _REP_DUP_N)
    )
    top_cols = ", ".join(
        f"coalesce(max(CASE WHEN n = {n} AND rk = 1 THEN mass END), 0) AS m{n}"
        for n in _REP_RULES
    )
    rules = " AND ".join(
        f"(m{n} * 1000000 <= {ppm} * denom)" for n, ppm in _REP_RULES.items()
    )
    return f"""
    WITH toks AS ({_TOKS_SQL}),
    base AS (
      SELECT doc_id, t,
             greatest(length(list_aggr(t, 'string_agg', ' ')), 1) AS denom
      FROM (SELECT doc_id, t FROM toks WHERE doc_id IS NOT NULL) _
    ),
    grams AS ({gram_sel}),
    cnt AS (SELECT doc_id, n, g, count(*)::BIGINT AS c,
                   (count(*) * length(g))::BIGINT AS mass
            FROM grams GROUP BY 1, 2, 3),
    ranked AS (SELECT doc_id, n, mass,
                      row_number() OVER (PARTITION BY doc_id, n
                                         ORDER BY c DESC, g) AS rk
               FROM cnt WHERE n < {_REP_DUP_N}),
    tops AS (SELECT doc_id, {top_cols} FROM ranked GROUP BY doc_id),
    dups AS (SELECT doc_id, sum(mass)::BIGINT AS dupmass
             FROM cnt WHERE n = {_REP_DUP_N} AND c >= 2 GROUP BY doc_id)
    SELECT b.doc_id,
           len(b.t)::BIGINT AS n_tokens,
           b.denom::BIGINT AS denom_chars,
           {", ".join(f"least(coalesce(m{n}, 0), b.denom) * 1000000 // b.denom AS top{n}_ppm" for n in _REP_RULES)},
           least(coalesce(d.dupmass, 0), b.denom) * 1000000 // b.denom AS dup{_REP_DUP_N}_ppm,
           {", ".join(f"(least(coalesce(m{n}, 0), b.denom) * 1000000 <= {ppm} * b.denom) AS r_top{n}" for n, ppm in _REP_RULES.items())},
           (least(coalesce(d.dupmass, 0), b.denom) * 1000000
              <= {_REP_DUP_PPM} * b.denom) AS r_dup{_REP_DUP_N},
           ({" AND ".join(f"least(coalesce(m{n}, 0), b.denom) * 1000000 <= {ppm} * b.denom" for n, ppm in _REP_RULES.items())}
            AND least(coalesce(d.dupmass, 0), b.denom) * 1000000
                  <= {_REP_DUP_PPM} * b.denom) AS keep
    FROM base b
    LEFT JOIN tops ON tops.doc_id = b.doc_id
    LEFT JOIN dups d ON d.doc_id = b.doc_id
    """


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's repetition-removal rules (Rae et al. 2021, A1.2, n-gram
    half) as per-rule flags: the character fraction claimed by the single
    most frequent 2-/3-/4-gram must stay under 20/18/16%, and characters
    inside DUPLICATED 5-grams (occurring twice or more) under 15% —
    the "same phrase looping" failure mode of scraped text that slips
    past length/vocabulary gates (each occurrence counts its full
    character span; the paper's overlap de-double-count is simplified,
    identically in both engines, with the mass capped at the document
    length). Integer-exact: gram mass = occurrences x joined-gram length,
    denominator = token-joined document length, every rule an integer
    ppm compare; top-gram ties break lexicographically. Plan: ONE
    explode of tagged 2/3/4/5-grams -> ONE (doc, n, gram) count agg with
    map-side partials -> a (doc, n)-PARTITIONED rank window (never
    global) -> two per-doc joins back to the token base. At 100 TB
    everything is keyed by doc_id — embarrassingly parallel after the
    one gram-count shuffle, the same budget as the bigram/shingle
    family."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    # r15 (guide §1.2): t and denom both need the token array — inline,
    # the checkpoint job tokenized every document twice; materialize the
    # array in its own projection (referenced 2x, CollapseProject keeps
    # the two-stage shape) so the checkpoint pays one tokenize per row.
    toked = docs.select("doc_id", tokens(F.col("text")).alias("__toks"))
    tk = F.col("__toks")
    base = toked.select(
        "doc_id",
        tk.alias("t"),
        F.greatest(F.length(F.array_join(tk, " ")), F.lit(1)).alias("denom"),
    ).localCheckpoint(eager=True)

    def grams(n: int) -> Column:
        # [t[i] || ' ' || ... for each window of n] — the shingle
        # pattern. The short-doc guard must be a CASE, not greatest(..,0):
        # Spark's sequence(1, 0) yields the DESCENDING [1, 0] and the 0
        # start crashes slice (caught by the extremes sweep's 1-token doc).
        return F.expr(
            f"CASE WHEN size(t) >= {n} THEN "
            f"transform(sequence(1, size(t) - {n - 1}), "
            f"i -> array_join(slice(t, i, {n}), ' ')) "
            f"ELSE array() END"
        )

    tagged = None
    for n in (*_REP_RULES, _REP_DUP_N):
        part = base.select(
            "doc_id", F.lit(n).alias("n"), F.explode(grams(n)).alias("g")
        )
        tagged = part if tagged is None else tagged.unionAll(part)
    cnt = tagged.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).alias("c"),
        (F.count(F.lit(1)) * F.length("g")).cast("long").alias("mass"),
    )
    # ONE consumption of the gram-count frame: per (doc, n) the top-1
    # mass rides a struct-min ((-count, gram, mass) — max count, then
    # lexicographically smallest gram; no window, no second shuffle of
    # cnt) and the duplicated mass is a conditional sum in the SAME agg.
    per_n = cnt.groupBy("doc_id", "n").agg(
        F.min(
            F.struct(
                (-F.col("c")).alias("nc"), F.col("g").alias("g"),
                F.col("mass").alias("mass"),
            )
        )["mass"].alias("topmass"),
        F.sum(F.when(F.col("c") >= 2, F.col("mass"))).alias("dupmass_n"),
    )
    per_doc = per_n.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("n") == n, F.col("topmass"))), F.lit(0)
            ).alias(f"m{n}")
            for n in _REP_RULES
        ],
        F.max(F.when(F.col("n") == _REP_DUP_N, F.col("dupmass_n"))).alias(
            "dupmass"
        ),
    )
    j = (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            F.col("denom").cast("long").alias("denom_chars"),
            # least(mass, denom): occurrences of a SELF-OVERLAPPING gram
            # ("the the the...") jointly cover more characters than the
            # document holds under the per-occurrence count — cap at 100%
            # (identical cap in the oracle; rule outcomes are unaffected
            # since any capped mass already exceeds every threshold)
            *[
                F.least(F.coalesce(F.col(f"m{n}"), F.lit(0)), F.col("denom"))
                .cast("long")
                .alias(f"m{n}")
                for n in _REP_RULES
            ],
            F.least(F.coalesce(F.col("dupmass"), F.lit(0)), F.col("denom"))
            .cast("long")
            .alias("dupmass"),
        )
    )
    rule_cols = [
        (F.col(f"m{n}") * 1000000 <= F.lit(ppm) * F.col("denom_chars")).alias(
            f"r_top{n}"
        )
        for n, ppm in _REP_RULES.items()
    ]
    keep = (
        F.col("dupmass") * 1000000 <= F.lit(_REP_DUP_PPM) * F.col("denom_chars")
    )
    for n, ppm in _REP_RULES.items():
        keep = keep & (F.col(f"m{n}") * 1000000 <= F.lit(ppm) * F.col("denom_chars"))
    return j.select(
        "doc_id",
        "n_tokens",
        "denom_chars",
        *[
            F.expr(f"m{n} * 1000000 div denom_chars").alias(f"top{n}_ppm")
            for n in _REP_RULES
        ],
        F.expr("dupmass * 1000000 div denom_chars").alias(f"dup{_REP_DUP_N}_ppm"),
        *rule_cols,
        (
            F.col("dupmass") * 1000000
            <= F.lit(_REP_DUP_PPM) * F.col("denom_chars")
        ).alias(f"r_dup{_REP_DUP_N}"),
        keep.alias("keep"),
    )



# ---------------------------------------------------------------------------
# snapshot_vacuum_retention
# ---------------------------------------------------------------------------


def snapshot_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-retention vacuum as a driver-facing query — the lakehouse
    GC step (Delta VACUUM / Iceberg expire_snapshots) that completes the
    snapshot table's lifecycle: three committed versions (full write ->
    filtered overwrite -> append), then ``snapshot_vacuum(keep_last=2)``
    reclaims v0's now-unreferenced files while provably NOT touching any
    file a retained manifest references. The returned frame is the
    post-vacuum LATEST content; the oracle recomputes it from the source
    table, so hash parity proves vacuum is content-neutral — it deletes
    storage, never state. The sibling invariants (expired time-travel
    RAISES instead of serving a ghost; retained versions stay readable;
    the reclaimed file count is exactly v0's unreferenced set) are
    pinned in tests/test_staged_r13.py, which also asserts real file
    deletion happened. At 100 TB vacuum is a driver-side manifest walk
    plus unlink calls — zero Spark jobs, O(files in expired versions) —
    and without it every full rewrite doubles storage forever."""
    import shutil

    from petfinder_database_distributor_spark.sources.snapshot import (
        snapshot_append,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )
    from petfinder_database_distributor_spark.streaming.incremental import (
        SCRATCH_ROOT,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    ).select("doc_id", "source", "n_chars")
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_").replace("-", "_")
    table = f"{SCRATCH_ROOT}/vacuum_retention/{tag}"
    shutil.rmtree(table, ignore_errors=True)  # deterministic per call
    # v0: full corpus; v1: overwrite to the %3 != 0 subset (v0's files
    # become unreferenced once v0 expires); v2: append the %3 = 0 half
    # of the evens back
    snapshot_write(spark, table, docs)
    snapshot_write(
        spark, table, docs.filter(F.col("doc_id") % 3 != 0), base_version=0
    )
    snapshot_append(
        spark,
        table,
        docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == 0)),
    )
    snapshot_vacuum(table, keep_last=2)
    return snapshot_read(spark, table)


_VACUUM_ORACLE = """
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id IS NOT NULL
      AND (doc_id % 3 <> 0 OR doc_id % 2 = 0)
"""



# ---------------------------------------------------------------------------
# STAGED manifest — tests/test_staged_r13.py verifies every triple at
# sf0.001 AND sf0.01 on every pytest run; round 13 promotes them.
# ---------------------------------------------------------------------------


def _staged() -> dict[str, tuple]:
    return {
        "text_c4_rules": (text_c4_rules, _c4_oracle(), text_c4_rules.__doc__),
        "domain_budget_temperature": (
            domain_budget_temperature,
            _TEMP_ORACLE,
            domain_budget_temperature.__doc__,
        ),
        "text_vocab_coverage": (
            text_vocab_coverage,
            _vocab_oracle(),
            text_vocab_coverage.__doc__,
        ),
        "graph_kcore_decomposition": (
            graph_kcore_decomposition,
            _kcore_oracle(),
            graph_kcore_decomposition.__doc__,
        ),
        "text_gopher_repetition": (
            text_gopher_repetition,
            _repetition_oracle(),
            text_gopher_repetition.__doc__,
        ),
        "snapshot_vacuum_retention": (
            snapshot_vacuum_retention,
            _VACUUM_ORACLE,
            snapshot_vacuum_retention.__doc__,
        ),
    }


STAGED = _staged()


# ---------------------------------------------------------------------------
# Round-13 promotion: the staging bar is met (oracle parity at sf0.001 +
# sf0.01 on every pytest run since r12, 8x/32x scale probes in PLANS.md,
# the empty / one-row / dirty degenerate sweeps, and the r12-advice
# wsum=0 guard) — the six triples register for real; registry.load_all()
# imports this module as of round 13 and the names head the r13 PRIORITY
# window for their first external driver rows.
# ---------------------------------------------------------------------------
from petfinder_database_distributor_spark.registry import register  # noqa: E402

for _name, (_fn, _oracle, _doc) in STAGED.items():
    register(_name, oracle=_oracle, doc=_doc)(_fn)
