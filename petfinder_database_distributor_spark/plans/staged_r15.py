"""Round-15 staged queries — implemented and oracle-verified in round 14,
registered next round (the stage-then-promote discipline of
plans/staged_r12–r14: the r14 driver window is an exact 50-slot fit of
the nine r14 promotions + the r9 cohort drain + the changed-query
refreshes, so these carry the full registration bar — (fn, oracle, doc)
triple, sf0.001+sf0.01 hash parity on every pytest run via
tests/test_staged_r15.py, AND the four degenerate-shape sweeps of
tests/test_staged_gate.py (empty / one-row / dirty / all-empty-text) —
without displacing window names).

The tranche deepens the language-model statistics and dedup pillars,
every member integer-exact through the established fixed-point log2
kernel (plans/mining.py) or pure integer arithmetic:

* ``text_perplexity_kneser_ney`` — the third member of the perplexity
  family (add-one bucket, Jelinek-Mercer interp, now interpolated
  Kneser-Ney per Kneser & Ney 1995 / Chen & Goodman 1998): absolute
  discount d = 0.75 — EXACTLY 3/4 in the fixed-point kernel — with the
  continuation-probability backoff that makes KN the strongest n-gram
  smoother. All statistics are integers (counts, bigram-type counts),
  the mixture is one shared rational, and the quantized probability
  feeds the SAME log2 kernel, so the statistic is bit-identical
  cross-engine like its two siblings.
* ``text_pmi_collocations`` — collocation mining by pointwise mutual
  information (Church & Hanks 1990): PMI = log2(p(ab) / p(a)p(b)) over
  corpus bigrams with a count floor, computed EXACTLY by quantizing the
  inverse ratio into the log2 kernel's [1, 2^30] domain (PMI > 0 ⇔
  ratio > 1, so the inverse lives in (0, 1] — no negative-log branch
  needed). Top-k by fixed-point PMI with a deterministic tiebreak.
* ``text_js_divergence_domains`` — corpus drift audit: per-source
  Jensen-Shannon divergence (in milli-bits) between the source's
  unigram distribution and the REST of the corpus — the
  distribution-shift gate a 100 TB multi-source ingest runs before
  mixing. Every term's probability ratio p/m = 2·cs·Nr / (cs·Nr+cr·Ns)
  ≤ 2 is an exact rational, halved into the kernel domain; JSD =
  (KL(P‖M) + KL(Q‖M)) / 2 accumulates in integer fixed point.
* ``dedup_window_substring`` — windowed exact-substring dedup (the
  Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  Better" unit, stride-approximated): every 20-token window at stride
  10 is fingerprinted; a window text seen in an EARLIER document marks
  the span duplicated; per-doc duplicated-window share in milli. The
  cross-doc primitive that exact line dedup (text_paragraph_dedup)
  and doc-level MinHash both miss.
* ``search_hybrid_rrf`` — Reciprocal Rank Fusion (Cormack et al. 2009)
  over the engine's two registered retrieval heads (exact-rational
  BM25 + dense cosine), quantized to integer nano-units; ranks — not
  scores — cross the modality boundary, so no calibration is needed
  and the fusion is a 50∪50-row join at any corpus scale.
* ``sketch_kmv_set_ops`` — theta-sketch union / intersection / A-not-B
  between event-type user populations computed from the 64-value KMV
  registers alone (DataSketches semantics, trimmed union), with the
  union-from-registers == direct-built-sketch theorem pinned
  executable in the tests.
* ``quality_rater_kappa`` — Cohen's kappa between two integer-exact
  document-quality raters per lang + rollup: the chance-corrected
  agreement measure a multi-filter curation pipeline uses to detect
  redundant or contradictory quality gates.
* ``sample_bottomk_quantiles`` — Cohen & Kaplan bottom-k sampling as a
  deterministic mergeable reservoir: per-group p50/p90/p99 read off
  the 256-row smallest-hash sample, exact below k, 256 doubles of
  state per group at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from petfinder_database_distributor_spark.operators.text import (
    MD5INT_SQL,
    md5int,
)
from petfinder_database_distributor_spark.plans.mining import (
    _global_ntile,
    _log2fp_cost,
    _log2fp_sql_ctes,
    _ppl_corpus_frames,
    _PPL_FRAC_BITS,
    _PPL_KEEP_MILLI,
    _PPL_P_BITS,
)
from petfinder_database_distributor_spark.schema import load_table
from petfinder_database_distributor_spark.util import ensure_parallelism

# ---------------------------------------------------------------------------
# text_perplexity_kneser_ney
# ---------------------------------------------------------------------------

# absolute discount d = 3/4 (Chen & Goodman's fixed-discount variant) —
# exact in integer arithmetic: p(w2|w1) has the one shared denominator
#   4 * c1(w1) * Nbt
# and numerator
#   (4*c2 - 3) * Nbt + 3 * n1(w1·) * cont(·w2)
# where c2 = bigram count, c1 = history count, n1(w1·) = #distinct
# bigram TYPES with history w1, cont(·w2) = #distinct bigram types with
# predicted w2, Nbt = total distinct bigram types. Every per-doc bigram
# is corpus-seen (the corpus contains the doc), so 4*c2-3 >= 1 and the
# max(·,0) in the textbook form never binds; summing the numerator over
# seen w2 gives (4c1-3n1)·Nbt + 3·n1·Σcont <= 4·c1·Nbt, so p <= 1 and
# the quantized t = floor(p·2^30) sits in the kernel domain [1, 2^30].
_KN_D_NUM, _KN_D_DEN = 3, 4


def _kn_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    return f"""
    WITH tk AS ({_TOKS_SQL}),
    d2 AS (SELECT doc_id, t FROM tk WHERE len(t) >= 2),
    big AS (SELECT doc_id, u.b AS bg,
                   split_part(u.b, ' ', 1) AS w1,
                   split_part(u.b, ' ', 2) AS w2
            FROM (SELECT doc_id,
                         [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS bgs
                  FROM d2), unnest(bgs) u(b)),
    c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM big GROUP BY 1),
    c1 AS (SELECT w1, count(*)::BIGINT AS c1,
                  count(DISTINCT bg)::BIGINT AS n1
           FROM big GROUP BY 1),
    cont AS (SELECT w2, count(DISTINCT bg)::BIGINT AS cont FROM big GROUP BY 1),
    nbt AS (SELECT count(DISTINCT bg)::BIGINT AS nbt FROM big),
    tmap AS (SELECT c2.bg,
                    greatest(1, ((((4*c2.c2 - 3)::HUGEINT * nbt.nbt
                                   + 3::HUGEINT * c1.n1 * cont.cont)
                                  * {1 << _PPL_P_BITS})
                                 // (4::HUGEINT * c1.c1 * nbt.nbt))::BIGINT) AS tq
             FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1
                     JOIN cont ON split_part(c2.bg, ' ', 2) = cont.w2, nbt),
    tv AS (SELECT DISTINCT tq FROM tmap),
    {_log2fp_sql_ctes("tv")},
    bstat AS (SELECT doc_id, bg, count(*)::BIGINT AS cnt FROM big GROUP BY 1, 2),
    per AS (SELECT bs.doc_id, sum(bs.cnt)::BIGINT AS n_bigrams,
                   sum(bs.cnt * pc.cost_fp)::BIGINT AS nll_fp
            FROM bstat bs JOIN tmap ON bs.bg = tmap.bg
                          JOIN ppl_cost pc ON tmap.tq = pc.tq
            GROUP BY 1)
    SELECT doc_id, n_bigrams,
           ((nll_fp * 1000) // (n_bigrams * {1 << _PPL_FRAC_BITS}))::BIGINT
             AS mean_bits_milli,
           (((nll_fp * 1000) // (n_bigrams * {1 << _PPL_FRAC_BITS})) // 2000)::BIGINT
             AS ppl_bucket,
           ntile(3) OVER (ORDER BY
             (nll_fp * 1000) // (n_bigrams * {1 << _PPL_FRAC_BITS}), doc_id)::BIGINT
             AS ccnet_tercile,
           ((nll_fp * 1000) // (n_bigrams * {1 << _PPL_FRAC_BITS}))
             <= {_PPL_KEEP_MILLI} AS keep
    FROM per
    """


def text_perplexity_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity gate — the strongest
    n-gram smoother (Kneser & Ney 1995; Chen & Goodman 1998), third
    member of the perplexity family beside add-one and Jelinek-Mercer.
    p(w2|w1) = (c2 - d)/c1 + d·n1(w1·)/c1 · cont(·w2)/Nbt with the
    EXACT discount d = 3/4: the continuation probability scores a
    predicted word by how many distinct histories it follows — 'Kong'
    is frequent but follows only 'Hong', so KN stops over-rewarding it
    where unigram backoff (the JM member) misjudges. All statistics are
    integer counts; the mixture is one shared rational quantized to
    t = floor(p·2^30) ∈ [1, 2^30] via DECIMAL(38)/HUGEINT; the distinct
    quantized probabilities feed the shared square-and-shift log2
    kernel, so the statistic is bit-identical cross-engine. Plan shape:
    the bigram frame materializes once (DISK_ONLY localCheckpoint),
    three partial-aggregated counting passes over it (c2 / per-history
    c1+types / per-predicted continuation types), the tiny distinct-tq
    frame runs the kernel driver-free, and the per-doc rollup joins
    map-side against the broadcast cost table — no pass is ever
    quadratic, and the tercile is the distributed two-phase ntile."""
    tk, big = _ppl_corpus_frames(spark, sf_dir)
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("w1").agg(
        F.count(F.lit(1)).alias("c1"),
        F.countDistinct("bg").alias("n1"),
    )
    cont = (
        big.select(F.substring_index("bg", " ", -1).alias("w2"), "bg")
        .groupBy("w2")
        .agg(F.countDistinct("bg").alias("cont"))
    )
    nbt = big.agg(F.countDistinct("bg").alias("nbt"))
    tmap = (
        c2.select(
            "bg",
            "c2",
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
        )
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nbt))
        .select(
            "bg",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"cast(((cast(4 as decimal(38,0)) * c2 - 3) * nbt"
                    f" + cast(3 as decimal(38,0)) * n1 * cont)"
                    f" * {1 << _PPL_P_BITS}"
                    f" div (cast(4 as decimal(38,0)) * c1 * nbt) as bigint)"
                ),
            ).alias("tq"),
        )
    )
    cost = _log2fp_cost(tmap.select("tq").distinct())
    bstat = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    per = (
        bstat.join(tmap, "bg")
        .join(F.broadcast(cost), "tq")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("cost_fp")).alias("nll_fp"),
        )
    )
    mean_milli = F.expr(
        f"(nll_fp * 1000) div (n_bigrams * {1 << _PPL_FRAC_BITS})"
    )
    base = per.select("doc_id", "n_bigrams", mean_milli.alias("mean_bits_milli"))
    ranked = _global_ntile(
        base, [F.col("mean_bits_milli"), F.col("doc_id")], "ccnet_tercile"
    )
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "mean_bits_milli",
        F.expr("mean_bits_milli div 2000").alias("ppl_bucket"),
        "ccnet_tercile",
        (F.col("mean_bits_milli") <= _PPL_KEEP_MILLI).alias("keep"),
    )


# ---------------------------------------------------------------------------
# text_pmi_collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5  # Church & Hanks' count floor: PMI is unstable below it
_PMI_TOP_K = 100


def _pmi_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    return f"""
    WITH tk AS ({_TOKS_SQL}),
    d2 AS (SELECT doc_id, t FROM tk WHERE len(t) >= 2),
    big AS (SELECT u.b AS bg FROM
              (SELECT [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS bgs
               FROM d2), unnest(bgs) u(b)),
    c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM big GROUP BY 1),
    uni AS (SELECT u.tok AS w, count(*)::BIGINT AS cu
            FROM tk, unnest(tk.t) u(tok) GROUP BY 1),
    tots AS (SELECT (SELECT count(*) FROM big)::BIGINT AS nb,
                    (SELECT count(u.tok) FROM tk, unnest(tk.t) u(tok))::BIGINT AS nu),
    scored AS (
      SELECT c2.bg, c2.c2,
             greatest(1, ((tots.nb::HUGEINT * ua.cu * ub.cu * {1 << _PPL_P_BITS})
                          // (c2.c2::HUGEINT * tots.nu * tots.nu))::BIGINT) AS tq
      FROM c2 JOIN uni ua ON split_part(c2.bg, ' ', 1) = ua.w
              JOIN uni ub ON split_part(c2.bg, ' ', 2) = ub.w, tots
      WHERE c2.c2 >= {_PMI_MIN_COUNT}
        AND c2.c2::HUGEINT * tots.nu * tots.nu > tots.nb::HUGEINT * ua.cu * ub.cu
    ),
    tv AS (SELECT DISTINCT tq FROM scored),
    {_log2fp_sql_ctes("tv")}
    SELECT s.bg, s.c2,
           ((pc.cost_fp * 1000) // {1 << _PPL_FRAC_BITS})::BIGINT AS pmi_milli_bits
    FROM scored s JOIN ppl_cost pc ON s.tq = pc.tq
    ORDER BY pmi_milli_bits DESC, s.bg
    LIMIT {_PMI_TOP_K}
    """


def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (Church & Hanks
    1990): PMI(a,b) = log2(p(ab) / (p(a)·p(b))) over corpus bigrams with
    the classic count floor (c2 >= 5 — PMI is noise below it), top-100
    by score with a deterministic tiebreak. Integer-exact cross-engine:
    a positive-PMI bigram has ratio > 1, so its INVERSE (nb·cu_a·cu_b)/
    (c2·nu²) lies in (0,1) and quantizes into the shared log2 kernel's
    [1, 2^30] domain — PMI_fp IS the kernel's cost output (cost =
    -log2(tq/2^30)), no negative-log branch. Products stay inside
    HUGEINT / DECIMAL(38) up to ~1e12-token corpora (the same envelope
    the perplexity family documents). Plan shape: two counting passes
    (bigram + unigram hash aggs, map-side partials), a broadcast of the
    two scalar totals, the kernel over the tiny distinct-tq frame, and
    a TakeOrderedAndProject for the top-k — never a global sort.
    Positive-PMI filter + count floor happen BEFORE the kernel, so the
    kernel's input is already bounded by the collocation candidates."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    from petfinder_database_distributor_spark.operators.text import tokens

    tk = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    big = tk.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], ' ', t[i + 1]))"
            )
        ).alias("bg")
    )
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    toks = tk.select(F.explode("t").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    tots = big.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("nu"))
    )
    scored = (
        c2.filter(F.col("c2") >= _PMI_MIN_COUNT)
        .select(
            "bg",
            "c2",
            F.substring_index("bg", " ", 1).alias("wa"),
            F.substring_index("bg", " ", -1).alias("wb"),
        )
        .join(uni.withColumnRenamed("w", "wa").withColumnRenamed("cu", "cua"), "wa")
        .join(uni.withColumnRenamed("w", "wb").withColumnRenamed("cu", "cub"), "wb")
        .crossJoin(F.broadcast(tots))
        .filter(
            F.expr(
                "cast(c2 as decimal(38,0)) * nu * nu"
                " > cast(nb as decimal(38,0)) * cua * cub"
            )
        )
        .select(
            "bg",
            "c2",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"cast(cast(nb as decimal(38,0)) * cua * cub"
                    f" * {1 << _PPL_P_BITS}"
                    f" div (cast(c2 as decimal(38,0)) * nu * nu) as bigint)"
                ),
            ).alias("tq"),
        )
    )
    cost = _log2fp_cost(scored.select("tq").distinct())
    return (
        scored.join(F.broadcast(cost), "tq")
        .select(
            "bg",
            "c2",
            F.expr(f"(cost_fp * 1000) div {1 << _PPL_FRAC_BITS}").alias(
                "pmi_milli_bits"
            ),
        )
        .orderBy(F.desc("pmi_milli_bits"), F.asc("bg"))
        .limit(_PMI_TOP_K)
    )


# ---------------------------------------------------------------------------
# text_js_divergence_domains
# ---------------------------------------------------------------------------


def _jsd_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    return f"""
    WITH tk AS ({_TOKS_SQL}),
    dk AS (SELECT d.doc_id, coalesce(d.source, '') AS source, t.t
           FROM documents d JOIN tk t ON d.doc_id = t.doc_id),
    cnt AS (SELECT source, u.tok AS w, count(*)::BIGINT AS c
            FROM dk, unnest(dk.t) u(tok) GROUP BY 1, 2),
    tot AS (SELECT source, sum(c)::BIGINT AS ns FROM cnt GROUP BY 1),
    gtot AS (SELECT sum(c)::BIGINT AS ng FROM cnt),
    gcnt AS (SELECT w, sum(c)::BIGINT AS cg FROM cnt GROUP BY 1),
    pairs AS (
      -- every (source, token) with a presence on EITHER side; cr/Nr are
      -- the rest-of-corpus complement counts
      SELECT s.source, g.w,
             coalesce(c.c, 0)::BIGINT AS cs,
             (g.cg - coalesce(c.c, 0))::BIGINT AS cr,
             t.ns, (gt.ng - t.ns)::BIGINT AS nr
      FROM tot t JOIN gtot gt ON TRUE
           JOIN gcnt g ON TRUE
           JOIN tot s ON s.source = t.source
           LEFT JOIN cnt c ON c.source = t.source AND c.w = g.w
      WHERE t.ns > 0 AND (gt.ng - t.ns) > 0
    ),
    terms AS (
      SELECT source, ns, nr,
             CASE WHEN cs > 0 THEN cs ELSE 0 END AS cs,
             CASE WHEN cr > 0 THEN cr ELSE 0 END AS cr,
             -- tq = (ratio/2)·2^30 where ratio = p/m ∈ (0, 2]: always in
             -- the kernel domain, and log2(ratio)·2^20 = 2^20 - cost_fp
             CASE WHEN cs > 0 THEN
               greatest(1, ((cs::HUGEINT * nr * {1 << _PPL_P_BITS})
                            // (cs::HUGEINT*nr + cr::HUGEINT*ns))::BIGINT) END AS tqp,
             CASE WHEN cr > 0 THEN
               greatest(1, ((cr::HUGEINT * ns * {1 << _PPL_P_BITS})
                            // (cs::HUGEINT*nr + cr::HUGEINT*ns))::BIGINT) END AS tqq
      FROM pairs
    ),
    tv AS (SELECT DISTINCT tq FROM (
             SELECT tqp AS tq FROM terms WHERE tqp IS NOT NULL
             UNION
             SELECT tqq FROM terms WHERE tqq IS NOT NULL)),
    {_log2fp_sql_ctes("tv")},
    acc AS (
      SELECT t.source, t.ns, t.nr,
             sum(CASE WHEN t.tqp IS NOT NULL
                 THEN t.cs::HUGEINT * ({1 << _PPL_FRAC_BITS} - p.cost_fp)
                 ELSE 0 END)::HUGEINT AS klp,
             sum(CASE WHEN t.tqq IS NOT NULL
                 THEN t.cr::HUGEINT * ({1 << _PPL_FRAC_BITS} - q.cost_fp)
                 ELSE 0 END)::HUGEINT AS klq
      FROM terms t LEFT JOIN ppl_cost p ON t.tqp = p.tq
                   LEFT JOIN ppl_cost q ON t.tqq = q.tq
      GROUP BY 1, 2, 3
    )
    SELECT source,
           ns AS n_tokens,
           -- JSD >= 0 by definition; the floor-quantized kernel can leave a
           -- sub-milli negative residue, and Spark div truncates while
           -- DuckDB // floors on negatives (the zipf-fit sign-split class)
           -- so the numerator is clamped BEFORE the division on both sides
           (greatest(0::HUGEINT, klp * nr + klq * ns) * 1000
            // (2::HUGEINT * ns * nr * {1 << _PPL_FRAC_BITS}))::BIGINT
             AS jsd_milli_bits
    FROM acc
    """


def text_js_divergence_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift audit: per-source Jensen-Shannon divergence (milli-
    bits, [0, 1000]) between the source's unigram distribution P and the
    REST of the corpus Q — the distribution-shift gate a multi-source
    100 TB ingest runs before fixing mixing weights (JSD is symmetric
    and bounded, unlike KL). Integer-exact: every term's ratio
    p/m = 2·cs·nr / (cs·nr + cr·ns) is a rational in (0, 2] whose HALF
    quantizes into the log2 kernel domain — log2(ratio) = 1 - cost, so
    KL(P‖M) accumulates as Σ cs·(2^20 - cost_fp) in pure integers, and
    JSD = (KL_P/ns + KL_Q/nr)/2 resolves over one shared denominator.
    Tokens on one side only contribute their exact log2(2) = 1 bit.
    Plan shape: one (source, token) hash agg, a token-level global agg
    joined back (the 'rest' complement needs no second scan), the
    kernel over distinct quantized ratios, and a |sources|-row rollup.
    Sources covering the whole corpus (nr = 0) or empty sources are
    excluded — divergence against an empty complement is undefined."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    from petfinder_database_distributor_spark.operators.text import tokens

    half = 1 << (_PPL_P_BITS - 1)
    unit = 1 << _PPL_FRAC_BITS
    cnt = (
        docs.select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            F.explode(tokens(F.col("text"))).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("ns"))
    gtot = cnt.agg(F.sum("c").alias("ng"))
    gcnt = cnt.groupBy("w").agg(F.sum("c").alias("cg"))
    pairs = (
        tot.crossJoin(F.broadcast(gtot))
        .filter((F.col("ns") > 0) & (F.col("ng") - F.col("ns") > 0))
        .join(gcnt.hint("shuffle_hash"))
        .join(cnt, ["source", "w"], "left")
        .select(
            "source",
            "ns",
            (F.col("ng") - F.col("ns")).alias("nr"),
            F.coalesce(F.col("c"), F.lit(0)).alias("cs"),
            (F.col("cg") - F.coalesce(F.col("c"), F.lit(0))).alias("cr"),
        )
    )
    terms = pairs.select(
        "source",
        "ns",
        "nr",
        "cs",
        "cr",
        # tq = (ratio/2)·2^30 where ratio = p/m ∈ (0, 2]: always in the
        # kernel domain, and log2(ratio)·2^20 = 2^20 - cost_fp
        F.when(
            F.col("cs") > 0,
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"cast(cast(cs as decimal(38,0)) * nr * {2 * half}"
                    f" div (cast(cs as decimal(38,0)) * nr"
                    f" + cast(cr as decimal(38,0)) * ns) as bigint)"
                ),
            ),
        ).alias("tqp"),
        F.when(
            F.col("cr") > 0,
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"cast(cast(cr as decimal(38,0)) * ns * {2 * half}"
                    f" div (cast(cs as decimal(38,0)) * nr"
                    f" + cast(cr as decimal(38,0)) * ns) as bigint)"
                ),
            ),
        ).alias("tqq"),
    )
    tv = (
        terms.select(F.col("tqp").alias("tq"))
        .filter(F.col("tq").isNotNull())
        .union(terms.select(F.col("tqq").alias("tq")).filter(F.col("tqq").isNotNull()))
        .distinct()
    )
    cost = _log2fp_cost(tv)
    cp = cost.withColumnRenamed("tq", "tqp").withColumnRenamed("cost_fp", "costp")
    cq = cost.withColumnRenamed("tq", "tqq").withColumnRenamed("cost_fp", "costq")
    acc = (
        terms.join(F.broadcast(cp), "tqp", "left")
        .join(F.broadcast(cq), "tqq", "left")
        .groupBy("source", "ns", "nr")
        .agg(
            F.sum(
                F.when(
                    F.col("tqp").isNotNull(),
                    F.expr(f"cast(cs as decimal(38,0)) * ({unit} - costp)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("klp"),
            F.sum(
                F.when(
                    F.col("tqq").isNotNull(),
                    F.expr(f"cast(cr as decimal(38,0)) * ({unit} - costq)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("klq"),
        )
    )
    # JSD >= 0 by definition; the floor-quantized kernel can leave a
    # sub-milli negative residue, and Spark div truncates while DuckDB //
    # floors on negatives (the zipf-fit sign-split class) — clamp the
    # numerator BEFORE the division on both sides
    return acc.select(
        "source",
        F.col("ns").alias("n_tokens"),
        F.expr(
            f"cast(greatest(cast(0 as decimal(38,0)), klp * nr + klq * ns)"
            f" * 1000"
            f" div (cast(2 as decimal(38,0)) * ns * nr * {unit}) as bigint)"
        ).alias("jsd_milli_bits"),
    )


# ---------------------------------------------------------------------------
# dedup_window_substring
# ---------------------------------------------------------------------------

_WIN_W = 20  # window length in tokens (Lee et al. use 50 on web-scale text)
_WIN_S = 10  # stride


def _window_dedup_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    w, s = _WIN_W, _WIN_S
    return f"""
    WITH tk AS ({_TOKS_SQL}),
    elig AS (SELECT doc_id, t FROM tk WHERE len(t) >= {w}),
    win AS (
      SELECT doc_id,
             md5(u.wtxt) AS wh
      FROM (SELECT doc_id,
                   [array_to_string(t[(i*{s}+1):(i*{s}+{w})], ' ')
                    for i in range(0, (len(t) - {w}) // {s} + 1)] AS ws
            FROM elig), unnest(ws) u(wtxt)
    ),
    firsts AS (SELECT wh, min(doc_id) AS first_doc FROM win GROUP BY 1)
    SELECT w.doc_id,
           count(*)::BIGINT AS n_windows,
           sum(CASE WHEN f.first_doc < w.doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_dup_windows,
           (sum(CASE WHEN f.first_doc < w.doc_id THEN 1 ELSE 0 END) * 1000
            // count(*))::BIGINT AS dup_share_milli
    FROM win w JOIN firsts f ON w.wh = f.wh
    GROUP BY 1
    """


def dedup_window_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed exact-substring dedup — the Lee et al. 2022
    ('Deduplicating Training Data Makes Language Models Better')
    cross-document unit, stride-approximated: every 20-token window at
    stride 10 is fingerprinted (md5 over the joined tokens — 128-bit,
    collision-free at corpus scale and byte-identical cross-engine); a
    window whose text first occurs in a LOWER doc_id is a duplicated
    span, and each document reports its duplicated-window share in
    milli. Catches the cross-doc copied PARAGRAPH that doc-level
    MinHash dilutes below threshold and line-level dedup
    (text_paragraph_dedup) misses when the copy spans line boundaries.
    The stride approximation detects copies whose token offsets differ
    by a multiple of the stride (stride 1 recovers exact Lee et al.
    semantics at stride-times the postings volume — the same
    cost/recall dial the paper's suffix-array construction turns).
    Plan shape: token windows explode to ~len/stride rows per doc (a
    corpus-linear wedge, same class as the bigram frame), ONE hash agg
    finds per-window first occurrence, and the per-doc rollup joins on
    the window hash — shuffle keys are fingerprints, so skew is
    cryptographically impossible. Documents shorter than one window
    are excluded (no denominator)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    from petfinder_database_distributor_spark.operators.text import tokens

    w, s = _WIN_W, _WIN_S
    tk = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= w
    )
    win = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size(t) - {w}) div {s}),"
                f" i -> md5(array_join(slice(t, i*{s} + 1, {w}), ' ')))"
            )
        ).alias("wh"),
    )
    firsts = win.groupBy("wh").agg(F.min("doc_id").alias("first_doc"))
    return (
        win.join(firsts, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(
                F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("n_dup_windows * 1000 div n_windows").alias("dup_share_milli"),
        )
    )


# ---------------------------------------------------------------------------
# search_hybrid_rrf
# ---------------------------------------------------------------------------

_RRF_K = 60  # Cormack et al.'s constant — the standard damping
_RRF_DEPTH = 50  # per-list depth fed into the fusion
_RRF_TOP = 20
_RRF_SCALE = 10**9  # 1/(k+r) quantized to integer micro-units * 1000


def _rrf_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _BM25_SQL

    # the registered BM25 head, re-parameterized to fusion depth (its
    # LIMIT 20 is the only difference — same scoring expression)
    bm25_deep = _BM25_SQL.replace("LIMIT 20", f"LIMIT {_RRF_DEPTH}")
    return f"""
    WITH sparse AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_sparse
      FROM ({bm25_deep})
    ),
    dense AS (
      SELECT e.vec_id AS doc_id,
             row_number() OVER (ORDER BY
               list_inner_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[])
                 / (sqrt(list_inner_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[]))
                    * sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
               DESC, e.vec_id) AS rank_dense
      FROM (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q,
           embeddings e
      WHERE e.vec_id IS NOT NULL AND e.vec_id <> 0
        AND e.embedding IS NOT NULL
        AND len(list_filter(e.embedding, x -> x <> 0)) > 0
      QUALIFY rank_dense <= {_RRF_DEPTH}
    )
    SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
           s.rank_sparse, d.rank_dense,
           (coalesce({_RRF_SCALE} // ({_RRF_K} + s.rank_sparse), 0)
            + coalesce({_RRF_SCALE} // ({_RRF_K} + d.rank_dense), 0))::BIGINT
             AS rrf_nano
    FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    ORDER BY rrf_nano DESC, doc_id
    LIMIT {_RRF_TOP}
    """


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval fusion by Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher 2009): the engine's two registered retrieval
    heads — the BM25 keyword ranker (search_bm25_topk's exact-rational
    scoring, re-run to fusion depth 50) and the dense cosine ranker
    (ann_bruteforce_topk's geometry, query = vec 0, the doc_id↔vec_id
    aligned embedding) — are fused by rrf(d) = Σ 1/(60 + rank_list(d)),
    quantized to integer nano-units (10^9 // (60+r): positive operands,
    so truncating and flooring division agree — no sign-split risk).
    Ranks, not scores, cross the modality boundary, which is exactly
    why RRF needs no score calibration between a rational BM25 and a
    cosine. Integer-exact END-TO-END because both input rankings
    already are: BM25 is one correctly-rounded IEEE division per term
    over exact integers, the cosine is the bit-reproducible
    inner-product form both registered queries rely on. Plan shape:
    each head is scan + broadcast(one row of stats / one query vector)
    + TakeOrderedAndProject(50); the fusion is a 50∪50-row full-outer
    join — driver-sized regardless of corpus scale."""
    from petfinder_database_distributor_spark.operators.similarity import (
        brute_force_topk,
    )
    from petfinder_database_distributor_spark.operators.text import tokens
    from petfinder_database_distributor_spark.plans.llm_pipeline import (
        _BM25_TERMS,
        _bm25_term_score,
        _load_embeddings,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))

    def eq_term(w: str):
        # factory, not `lambda x, w=w`: the default arg would select
        # F.filter's (element, index) binary form and bind w to the INDEX
        return lambda x: x == F.lit(w)

    d = docs.select(
        "doc_id",
        F.size(t).alias("dl"),
        *[
            F.size(F.filter(t, eq_term(w))).alias(f"tf{i+1}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("tt"),
        *[
            F.sum(F.when(F.col(f"tf{i+1}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i+1}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    score = _bm25_term_score(1) + _bm25_term_score(2) + _bm25_term_score(3)
    from pyspark.sql.window import Window

    sparse = (
        d.join(F.broadcast(stats))
        .filter(F.col("tf1") + F.col("tf2") + F.col("tf3") > 0)
        .select("doc_id", score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("rank_sparse"),
        )
    )
    emb = _load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    dense = brute_force_topk(q, emb, k=_RRF_DEPTH).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("rank_dense")
    )
    fused = sparse.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "rank_sparse",
        "rank_dense",
        (
            F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rank_sparse)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rank_dense)"), F.lit(0)
            )
        ).alias("rrf_nano"),
    )
    return fused.orderBy(F.desc("rrf_nano"), F.asc("doc_id")).limit(_RRF_TOP)


# ---------------------------------------------------------------------------
# sketch_kmv_set_ops
# ---------------------------------------------------------------------------


def _kmv_setops_oracle() -> str:
    from petfinder_database_distributor_spark.plans.staged_r14 import (
        _KMV_K,
        _KMV_M,
    )

    h = MD5INT_SQL.format(x="user_id::VARCHAR")

    def est(sz: str) -> str:
        return f"(({sz})::HUGEINT * {_KMV_M} // theta)::BIGINT"

    return f"""
    WITH hx AS (SELECT DISTINCT event_type AS scope, {h} AS h
                FROM events
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    ranked AS (SELECT scope, h,
                      row_number() OVER (PARTITION BY scope ORDER BY h) AS rk
               FROM hx),
    regs AS (SELECT scope, count(*) AS cnt,
                    list_sort(list(h) FILTER (WHERE rk <= {_KMV_K})) AS reg
             FROM ranked GROUP BY scope),
    r2 AS (SELECT scope, reg,
                  CASE WHEN cnt >= {_KMV_K} THEN reg[{_KMV_K}]
                       ELSE {_KMV_M} END AS th
           FROM regs),
    p AS (SELECT a.scope AS scope_a, b.scope AS scope_b,
                 least(a.th, b.th) AS theta,
                 list_filter(a.reg, x -> x < least(a.th, b.th)) AS fa,
                 list_filter(b.reg, x -> x < least(a.th, b.th)) AS fb
          FROM r2 a JOIN r2 b ON a.scope < b.scope),
    sets AS (SELECT scope_a, scope_b, theta,
                    list_sort(list_distinct(list_concat(fa, fb))) AS mg,
                    len(list_filter(fa, x -> list_contains(fb, x))) AS k_inter,
                    len(list_filter(fa, x -> NOT list_contains(fb, x))) AS k_ab,
                    len(list_filter(fb, x -> NOT list_contains(fa, x))) AS k_ba
             FROM p),
    u AS (SELECT scope_a, scope_b, theta, k_inter, k_ab, k_ba,
                 len(mg) AS k_merged,
                 CASE WHEN len(mg) >= {_KMV_K} THEN {_KMV_K} - 1
                      ELSE len(mg) END AS k_union,
                 CASE WHEN len(mg) >= {_KMV_K} THEN mg[{_KMV_K}]
                      ELSE theta END AS theta_u
          FROM sets)
    SELECT scope_a, scope_b, theta, theta_u,
           k_merged::BIGINT AS k_merged, k_union::BIGINT AS k_union,
           k_inter::BIGINT AS k_inter,
           k_ab::BIGINT AS k_only_a, k_ba::BIGINT AS k_only_b,
           ((k_union)::HUGEINT * {_KMV_M} // theta_u)::BIGINT AS est_union,
           {est("k_inter")} AS est_intersect,
           {est("k_ab")} AS est_only_a,
           {est("k_ba")} AS est_only_b
    FROM u
    ORDER BY scope_a, scope_b
    """


def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations over KMV registers (Dasgupta et al.,
    the Apache DataSketches theta union/intersection/A-not-B): for every
    pair of event types, estimate |A∪B|, |A∩B|, |A∖B|, |B∖A| of their
    user populations FROM THE 64-VALUE REGISTERS ALONE — the sketch
    contract that makes cross-corpus overlap auditing free at 100 TB
    (registers are 512 bytes per scope; the corpus is scanned once, by
    the same distinct hash-agg sketch_kmv_distinct runs). Semantics:
    each register is the theta pair (th, S) with th = k-th smallest
    60-bit hash when full else M = 2^60 and S = register values BELOW
    th (|S| = k-1 when full — matching the registered (k-1)·M/h_k
    estimator); a pairwise op restricts both registers to
    theta = min(th_a, th_b) and estimates |set| = |S|·M/theta, which
    degrades to EXACT counts when both scopes hold fewer than k users
    (theta = M). The union additionally TRIMS like the DataSketches
    theta union — when the merged register holds >= k values, keep the
    k smallest and lower theta to the k-th — which makes
    union-from-registers IDENTICAL to the sketch built directly over
    the combined scopes (provable: every element of A∪B below
    min(th_a, th_b) is in the merged register, so its k-th smallest IS
    h_k(A∪B); pinned as an executable theorem in the tests). Every
    estimate is one HUGEINT/decimal(38,0) product and one integer
    division (|S|·2^60 crosses the BIGINT wall — the r14 overflow
    audit's widening discipline), so both engines agree bit-for-bit;
    the register set identity k_merged = k_inter + k_onlyA + k_onlyB
    is pinned in tests. Plan shape: ONE distinct hash-agg
    over events + a PARTITIONED top-k window builds all registers; the
    pairwise stage is a |scopes|²-row broadcast self-join over
    64-element arrays — driver-sized regardless of corpus scale."""
    from pyspark.sql.window import Window

    from petfinder_database_distributor_spark.plans.staged_r14 import (
        _KMV_K,
        _KMV_M,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    hx = ev.select(
        F.col("event_type").alias("scope"),
        md5int(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("scope").orderBy("h")
    regs = (
        hx.withColumn("rk", F.row_number().over(w))
        .groupBy("scope")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sort_array(
                F.collect_list(F.when(F.col("rk") <= _KMV_K, F.col("h")))
            ).alias("reg"),
        )
        .select(
            "scope",
            "reg",
            F.when(
                F.col("cnt") >= _KMV_K, F.element_at("reg", _KMV_K)
            )
            .otherwise(F.lit(_KMV_M))
            .alias("th"),
        )
        # |scopes| rows of 64 longs each — materialize so the pairwise
        # self-join below reads the ONE corpus scan's result twice
        # instead of re-scanning events per join side (the
        # domain_budget_temperature register-frame pattern)
        .localCheckpoint(eager=True)
    )
    a = regs.select(
        F.col("scope").alias("scope_a"),
        F.col("reg").alias("reg_a"),
        F.col("th").alias("th_a"),
    )
    b = regs.select(
        F.col("scope").alias("scope_b"),
        F.col("reg").alias("reg_b"),
        F.col("th").alias("th_b"),
    )
    theta = F.least(F.col("th_a"), F.col("th_b"))

    def below(reg: str):
        # closure over theta; single-parameter lambda (the 2-arg form
        # would bind F.filter's (element, index) signature)
        return F.filter(F.col(reg), lambda x: x < theta)

    pairs = (
        a.join(F.broadcast(b), F.col("scope_a") < F.col("scope_b"))
        .select(
            "scope_a",
            "scope_b",
            theta.alias("theta"),
            below("reg_a").alias("fa"),
            below("reg_b").alias("fb"),
        )
        .select(
            "scope_a",
            "scope_b",
            "theta",
            F.array_sort(F.array_distinct(F.concat("fa", "fb"))).alias("mg"),
            F.size(F.array_intersect("fa", "fb")).alias("k_inter"),
            F.size(F.array_except("fa", "fb")).alias("k_ab"),
            F.size(F.array_except("fb", "fa")).alias("k_ba"),
        )
        .select(
            "scope_a",
            "scope_b",
            "theta",
            "k_inter",
            "k_ab",
            "k_ba",
            F.size("mg").alias("k_merged"),
            F.when(F.size("mg") >= _KMV_K, F.lit(_KMV_K - 1))
            .otherwise(F.size("mg"))
            .alias("k_union"),
            F.when(F.size("mg") >= _KMV_K, F.element_at("mg", _KMV_K))
            .otherwise(F.col("theta"))
            .alias("theta_u"),
        )
    )

    def est(sz: str, th: str) -> F.Column:
        return F.expr(
            f"CAST(CAST({sz} AS DECIMAL(38,0)) * {_KMV_M} div {th} AS BIGINT)"
        )

    return pairs.select(
        "scope_a",
        "scope_b",
        "theta",
        "theta_u",
        F.col("k_merged").cast("long").alias("k_merged"),
        F.col("k_union").cast("long").alias("k_union"),
        F.col("k_inter").cast("long").alias("k_inter"),
        F.col("k_ab").cast("long").alias("k_only_a"),
        F.col("k_ba").cast("long").alias("k_only_b"),
        est("k_union", "theta_u").alias("est_union"),
        est("k_inter", "theta").alias("est_intersect"),
        est("k_ab", "theta").alias("est_only_a"),
        est("k_ba", "theta").alias("est_only_b"),
    ).orderBy("scope_a", "scope_b")


# ---------------------------------------------------------------------------
# sample_bottomk_quantiles
# ---------------------------------------------------------------------------

_BK_K = 256  # bottom-k sample size per group
_BK_QS = (50, 90, 99)  # reported percentiles


def _bottomk_oracle() -> str:
    from petfinder_database_distributor_spark.schema import FINITE_SQL

    h = MD5INT_SQL.format(x="event_id::VARCHAR")
    qcols = ",\n           ".join(
        f"vals[greatest(1, ({q} * n_sample + 99) // 100)] AS q{q}"
        for q in _BK_QS
    )
    return f"""
    WITH src AS (SELECT event_type, event_id, value + 0.0 AS value
                 FROM events
                 WHERE event_type IS NOT NULL AND event_id IS NOT NULL
                   AND value IS NOT NULL AND {FINITE_SQL("value")}),
    rk AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY {h}, event_id) AS rk
           FROM src),
    g AS (SELECT event_type,
                 count(*)::BIGINT AS n_total,
                 least(count(*), {_BK_K})::BIGINT AS n_sample,
                 list_sort(list(value) FILTER (WHERE rk <= {_BK_K})) AS vals
          FROM rk GROUP BY event_type)
    SELECT event_type, n_total, n_sample,
           {qcols}
    FROM g
    ORDER BY event_type
    """


def sample_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sampling quantiles (Cohen & Kaplan 2007's bottom-k
    sketch, the deterministic reservoir): per event type, the sample is
    the k=256 rows with the SMALLEST md5int(event_id) — a uniform
    without-replacement sample that is REPRODUCIBLE (hash order, not
    RNG state or scan order) and MERGEABLE (the k smallest hashes of a
    union are the k smallest of the parts' registers — the same theorem
    the KMV family pins). Reported p50/p90/p99 are ELEMENTS of the
    sorted sample at ceil(q·m/100) — actual data values, no
    interpolation arithmetic, so cross-engine parity is structural; the
    one normalization is value+0.0 (collapses -0.0 to 0.0 — two equal
    sort keys whose string forms differ would otherwise make the
    element choice ambiguous between engines). When a group holds <= k
    rows the sample IS the group and every reported quantile is EXACT
    (at sf0.001 all five event types sit under k — the two test scales
    exercise both regimes). Measures pass the finite-envelope entry
    contract; ties in the hash order break on event_id (unique per the
    r14 dup-key contract). Plan shape: one pruned scan -> partitioned
    top-k window -> per-group agg; state per group is 256 doubles —
    quantile monitoring at 100 TB for the cost of a sketch. Unlike
    sketch_histogram_quantiles' fixed bins, the sample adapts to any
    value distribution without configuration."""
    from pyspark.sql.window import Window

    from petfinder_database_distributor_spark.schema import finite_measures

    ev = finite_measures(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
    )
    src = ev.select(
        "event_type",
        "event_id",
        (F.col("value") + F.lit(0.0)).alias("value"),
        md5int(F.col("event_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    g = (
        src.withColumn("rk", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.least(F.count(F.lit(1)), F.lit(_BK_K))
            .cast("long")
            .alias("n_sample"),
            F.sort_array(
                F.collect_list(F.when(F.col("rk") <= _BK_K, F.col("value")))
            ).alias("vals"),
        )
    )
    qcols = [
        F.element_at(
            "vals",
            F.greatest(
                F.lit(1),
                F.expr(f"cast(({q} * n_sample + 99) div 100 as int)"),
            ),
        ).alias(f"q{q}")
        for q in _BK_QS
    ]
    return g.select("event_type", "n_total", "n_sample", *qcols).orderBy(
        "event_type"
    )


# ---------------------------------------------------------------------------
# quality_rater_kappa
# ---------------------------------------------------------------------------

_KAPPA_STOPWORDS = ("the", "a", "of", "and", "is")  # the engine's shared set


def _kappa_oracle() -> str:
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    sw = ", ".join(f"'{w}'" for w in _KAPPA_STOPWORDS)
    return f"""
    WITH tk AS ({_TOKS_SQL}),
    d AS (SELECT doc_id, lang,
                 len(t) AS n_tok,
                 coalesce(list_sum(list_transform(t, w -> length(w))), 0) AS sumlen,
                 len(list_filter(t, x -> x IN ({sw}))) AS n_sw
          FROM tk),
    r AS (SELECT lang,
                 CASE WHEN n_tok >= 10 AND n_sw >= 1 THEN 1 ELSE 0 END AS ra,
                 CASE WHEN n_tok BETWEEN 10 AND 2000
                       AND 3 * n_tok <= sumlen AND sumlen <= 10 * n_tok
                      THEN 1 ELSE 0 END AS rb
          FROM d),
    g AS (SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL'
                      ELSE coalesce(lang, 'NULL') END AS scope,
                 count(*)::BIGINT AS n_docs,
                 sum(ra * rb)::BIGINT AS n11,
                 sum(ra * (1 - rb))::BIGINT AS n10,
                 sum((1 - ra) * rb)::BIGINT AS n01,
                 sum((1 - ra) * (1 - rb))::BIGINT AS n00
          FROM r GROUP BY ROLLUP(lang)
          -- empty-corpus alignment: DuckDB's ROLLUP () set emits a
          -- grand-total row over ZERO input rows; Spark's rollup emits
          -- none. Only that row can have count 0 (real groups imply
          -- rows), so this clause binds exactly on the empty corpus.
          HAVING count(*) > 0)
    SELECT scope, n_docs, n11, n10, n01, n00,
           CASE WHEN n_docs::HUGEINT * n_docs
                     - ((n11 + n10)::HUGEINT * (n11 + n01)
                        + (n01 + n00)::HUGEINT * (n10 + n00)) > 0
                THEN (n_docs::HUGEINT * (n11 + n00)
                      - ((n11 + n10)::HUGEINT * (n11 + n01)
                         + (n01 + n00)::HUGEINT * (n10 + n00)))::DOUBLE
                     / (n_docs::HUGEINT * n_docs
                        - ((n11 + n10)::HUGEINT * (n11 + n01)
                           + (n01 + n00)::HUGEINT * (n10 + n00)))::DOUBLE
           END AS kappa
    FROM g
    ORDER BY scope
    """


def quality_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement for quality classifiers: Cohen's kappa
    (Cohen 1960) between two cheap document-quality raters — rater A =
    fluency (>=10 tokens and at least one stopword), rater B = shape
    (10..2000 tokens and mean word length in [3,10], tested as the
    integer inequality 3n <= sumlen <= 10n — no division) — per lang
    plus the 'ALL' rollup row. The measurement every multi-filter
    curation pipeline owes itself: raw percent agreement rewards
    trivial always-keep raters, kappa subtracts chance agreement.
    Contingency cells are exact integer aggregates; kappa =
    (n*(n11+n00) - (r1*c1 + r0*c0)) / (n^2 - (r1*c1 + r0*c0)) runs the
    products in decimal(38,0)/HUGEINT (n^2 crosses the BIGINT wall at
    ~3e9 docs — the r14 overflow audit discipline) and finishes with
    ONE correctly-rounded double division per engine — bit-identical
    below 2^53, the BM25-widening pattern. NULL kappa when a rater is
    constant (denominator 0: chance agreement is total — kappa is
    undefined, not 0). Plan shape: one corpus scan -> per-doc integer
    token stats -> ROLLUP hash-agg (map-side partial); output is
    |langs|+1 rows at any corpus scale."""
    from petfinder_database_distributor_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    d = docs.select(
        "lang",
        F.size(t).alias("n_tok"),
        F.aggregate(
            F.transform(t, lambda w: F.length(w)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sumlen"),
        F.size(F.filter(t, lambda x: x.isin(*_KAPPA_STOPWORDS))).alias("n_sw"),
    )
    r = d.select(
        "lang",
        F.when((F.col("n_tok") >= 10) & (F.col("n_sw") >= 1), 1)
        .otherwise(0)
        .alias("ra"),
        F.when(
            F.col("n_tok").between(10, 2000)
            & (3 * F.col("n_tok") <= F.col("sumlen"))
            & (F.col("sumlen") <= 10 * F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("rb"),
    )
    g = r.rollup("lang").agg(
        F.grouping("lang").alias("g_lang"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).cast("long").alias("n00"),
    )
    g = g.select(
        F.when(F.col("g_lang") == 1, F.lit("ALL"))
        .otherwise(F.coalesce(F.col("lang"), F.lit("NULL")))
        .alias("scope"),
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
    )
    dec = "decimal(38,0)"
    n = F.col("n_docs").cast(dec)
    pe = (F.col("n11") + F.col("n10")).cast(dec) * (
        F.col("n11") + F.col("n01")
    ) + (F.col("n01") + F.col("n00")).cast(dec) * (F.col("n10") + F.col("n00"))
    num = n * (F.col("n11") + F.col("n00")) - pe
    den = n * F.col("n_docs") - pe
    return g.select(
        "scope",
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        F.when(den > 0, num.cast("double") / den.cast("double")).alias("kappa"),
    ).orderBy("scope")


# ---------------------------------------------------------------------------
# STAGED manifest — tests/test_staged_r15.py verifies every triple at
# sf0.001 AND sf0.01 on every pytest run; tests/test_staged_gate.py adds
# the four degenerate-shape sweeps; round 15 promotes them.
# ---------------------------------------------------------------------------


def _staged() -> dict[str, tuple]:
    return {
        "text_perplexity_kneser_ney": (
            text_perplexity_kneser_ney,
            _kn_oracle(),
            text_perplexity_kneser_ney.__doc__,
        ),
        "text_pmi_collocations": (
            text_pmi_collocations,
            _pmi_oracle(),
            text_pmi_collocations.__doc__,
        ),
        "text_js_divergence_domains": (
            text_js_divergence_domains,
            _jsd_oracle(),
            text_js_divergence_domains.__doc__,
        ),
        "dedup_window_substring": (
            dedup_window_substring,
            _window_dedup_oracle(),
            dedup_window_substring.__doc__,
        ),
        "search_hybrid_rrf": (
            search_hybrid_rrf,
            _rrf_oracle(),
            search_hybrid_rrf.__doc__,
        ),
        "sketch_kmv_set_ops": (
            sketch_kmv_set_ops,
            _kmv_setops_oracle(),
            sketch_kmv_set_ops.__doc__,
        ),
        "sample_bottomk_quantiles": (
            sample_bottomk_quantiles,
            _bottomk_oracle(),
            sample_bottomk_quantiles.__doc__,
        ),
        "quality_rater_kappa": (
            quality_rater_kappa,
            _kappa_oracle(),
            quality_rater_kappa.__doc__,
        ),
    }


STAGED = _staged()
