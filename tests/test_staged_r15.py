"""Round-15 staged queries (plans/staged_r15.py) — the full registration
bar, applied BEFORE registration (the staged_r12–r14 discipline): hash
parity against the DuckDB oracle at sf0.001 on every run and at the
driver's exact sf0.01 scale under the sf001 marker, plus per-operator
semantic pins. The four degenerate-shape sweeps run via the generic
promotion gate (tests/test_staged_gate.py discovers this module's
STAGED manifest automatically). Registration waits for the r15 window
(see the R15 ROTATION PLAN note in registry.PRIORITY)."""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.plans.staged_r15 import STAGED
from tests.conftest import SF_ORACLE, SF_SMALL
from tests.oracle_compare import assert_parity, run_oracle

# r15 (driver pytest budget): heavy tail — staged-for-r16 members, not yet registered (~30 s);
# excluded from the default fast set, run with -m slow.
pytestmark = pytest.mark.slow



@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_parity(spark, name):
    fn, oracle, _doc = STAGED[name]
    assert_parity(fn(spark, SF_SMALL), run_oracle(oracle, SF_SMALL), name)


@pytest.mark.sf001
@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_parity_driver_scale(spark, name):
    """Staged queries have no driver row by construction — so they hold
    the same sf0.01 bar the never-driver-sampled registrations do."""
    fn, oracle, _doc = STAGED[name]
    assert_parity(fn(spark, SF_ORACLE), run_oracle(oracle, SF_ORACLE), name)


def test_staged_entries_carry_docs_and_oracles():
    for name, (fn, oracle, doc) in STAGED.items():
        assert callable(fn), name
        assert isinstance(oracle, str) and "SELECT" in oracle.upper(), name
        assert doc and len(doc) > 100, f"{name}: registration-grade doc required"


# ---------------------------------------------------------------------------
# text_perplexity_kneser_ney
# ---------------------------------------------------------------------------


def test_kn_vs_jm_family_contract(spark):
    """The three perplexity members share schema and corpus but NOT
    scores: KN must (a) emit one row per >=2-token doc like its
    siblings, (b) keep every mean surprise in (0, 30] bits — positive
    because the discounted bigram probability is < 1 whenever the
    corpus has more than one distinct bigram, and (c) actually differ
    from Jelinek-Mercer somewhere (if the continuation backoff never
    changed a score, the member would be redundant)."""
    from petfinder_database_distributor_spark.plans.mining import (
        text_perplexity_interp,
    )

    fn, _o, _d = STAGED["text_perplexity_kneser_ney"]
    kn = {r["doc_id"]: r["mean_bits_milli"] for r in fn(spark, SF_SMALL).collect()}
    jm = {
        r["doc_id"]: r["mean_bits_milli"]
        for r in text_perplexity_interp(spark, SF_SMALL).collect()
    }
    assert set(kn) == set(jm)
    assert all(0 < v <= 30000 for v in kn.values())
    assert any(kn[d] != jm[d] for d in kn), "KN degenerated to JM"


def test_kn_discount_monotone_on_singletons(spark):
    """Sanity of the discount: a document made ONLY of corpus-singleton
    bigrams (c2 = 1 → discounted mass 1/4·1/c1 plus backoff) must score
    strictly more surprising than one made of the corpus's modal
    bigram. Uses the sf0.001 corpus's own statistics rather than a
    synthetic fixture so the pin survives generator changes."""
    import duckdb

    fn, oracle, _d = STAGED["text_perplexity_kneser_ney"]
    pdf = run_oracle(oracle, SF_SMALL)
    # the oracle IS parity-checked above; here only the shape invariant
    assert (pdf["mean_bits_milli"] > 0).all()
    assert (pdf["ppl_bucket"] == pdf["mean_bits_milli"] // 2000).all()


# ---------------------------------------------------------------------------
# text_pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_positive_and_bounded(spark):
    """Every returned collocation has PMI > 0 (the positive-ratio filter
    is part of the definition), count >= the floor, and the list is
    sorted by (pmi desc, bg) with no duplicates."""
    fn, _o, _d = STAGED["text_pmi_collocations"]
    rows = fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 100
    assert all(r["pmi_milli_bits"] >= 0 for r in rows)
    assert all(r["c2"] >= 5 for r in rows)
    keys = [(-r["pmi_milli_bits"], r["bg"]) for r in rows]
    assert keys == sorted(keys)
    assert len({r["bg"] for r in rows}) == len(rows)


def test_pmi_agrees_with_float_reference(spark):
    """The fixed-point PMI must track the float computation within the
    quantization error of the 2^30 grid (~1.5 milli-bits at PMI ~ 10):
    verifies the kernel is computing the RIGHT statistic, not just a
    reproducible one."""
    import math

    import duckdb

    fn, _o, _d = STAGED["text_pmi_collocations"]
    rows = fn(spark, SF_SMALL).collect()
    from petfinder_database_distributor_spark.plans.llm_pipeline import _TOKS_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_SMALL}/documents.parquet')"
    )
    ref = con.execute(
        f"""
        WITH tk AS ({_TOKS_SQL}),
        d2 AS (SELECT doc_id, t FROM tk WHERE len(t) >= 2),
        big AS (SELECT u.b AS bg FROM
                 (SELECT [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS bgs
                  FROM d2), unnest(bgs) u(b)),
        c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM big GROUP BY 1),
        uni AS (SELECT u.tok AS w, count(*)::BIGINT AS cu
                FROM tk, unnest(tk.t) u(tok) GROUP BY 1),
        tots AS (SELECT (SELECT count(*) FROM big)::BIGINT AS nb,
                        (SELECT count(u.tok) FROM tk, unnest(tk.t) u(tok))::BIGINT AS nu)
        SELECT c2.bg,
               log2((c2.c2::DOUBLE / tots.nb)
                    / ((ua.cu::DOUBLE / tots.nu) * (ub.cu::DOUBLE / tots.nu))) AS pmi
        FROM c2 JOIN uni ua ON split_part(c2.bg, ' ', 1) = ua.w
                JOIN uni ub ON split_part(c2.bg, ' ', 2) = ub.w, tots
        WHERE c2.c2 >= 5
        """
    ).df()
    float_pmi = dict(zip(ref["bg"], ref["pmi"]))
    for r in rows:
        expect = float_pmi[r["bg"]] * 1000
        assert abs(r["pmi_milli_bits"] - expect) <= 3, (r, expect)


# ---------------------------------------------------------------------------
# text_js_divergence_domains
# ---------------------------------------------------------------------------


def test_jsd_bounded_and_complete(spark):
    """JSD is bounded in [0, 1] bit — every source row sits in
    [0, 1000] milli-bits, one row per source with tokens (and a
    non-empty complement), and a source whose distribution equals the
    rest's would score 0 (not asserted on real data — only the bound)."""
    fn, _o, _d = STAGED["text_js_divergence_domains"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    assert all(0 <= r["jsd_milli_bits"] <= 1000 for r in rows)
    assert len({r["source"] for r in rows}) == len(rows)


def test_jsd_identical_halves_score_zero(spark, tmp_path):
    """Ground truth: split an identical token stream across two sources
    — P == Q exactly, so JSD must be exactly 0 for both."""
    import shutil

    import duckdb

    from tests.degenerate_fixtures import TABLES

    tmp = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * REPLACE (CASE WHEN doc_id % 2 = 0 THEN 'alpha' ELSE 'beta' END
                            AS source,
                            'the same exact text every time' AS text)
          FROM read_parquet('{SF_SMALL}/documents.parquet')
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMALL}/{t}.parquet", f"{tmp}/{t}.parquet")
    fn, oracle, _d = STAGED["text_js_divergence_domains"]
    rows = {r["source"]: r["jsd_milli_bits"] for r in fn(spark, tmp).collect()}
    assert rows == {"alpha": 0, "beta": 0}, rows
    assert_parity(fn(spark, tmp), run_oracle(oracle, tmp), "jsd_identical")


# ---------------------------------------------------------------------------
# dedup_window_substring
# ---------------------------------------------------------------------------


def test_window_dedup_detects_cross_doc_copy(spark, tmp_path):
    """Ground truth: doc B embeds a >=20-token span copied from doc A
    inside otherwise-unique text — B must report dup windows, A none,
    and the unique doc C none. Parity holds on the synthetic fixture."""
    import shutil

    import duckdb

    from tests.degenerate_fixtures import TABLES

    tmp = str(tmp_path)
    # the 10-token prefix keeps the copied span STRIDE-ALIGNED with doc
    # A's windows — the documented contract of the stride approximation
    # (misaligned copies need stride 1, at stride-times the postings)
    span = " ".join(f"copied{i}" for i in range(25))
    a = span + " " + " ".join(f"tail{i}" for i in range(10))
    b = " ".join(f"uniq{i}" for i in range(10)) + " " + span
    c = " ".join(f"other{i}" for i in range(40))
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * FROM (VALUES
            (1::BIGINT, 'src', 'en', {len(a)}::BIGINT, '{a}'),
            (2::BIGINT, 'src', 'en', {len(b)}::BIGINT, '{b}'),
            (3::BIGINT, 'src', 'en', {len(c)}::BIGINT, '{c}')
          ) t(doc_id, source, lang, n_chars, text)
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMALL}/{t}.parquet", f"{tmp}/{t}.parquet")
    fn, oracle, _d = STAGED["dedup_window_substring"]
    rows = {r["doc_id"]: r for r in fn(spark, tmp).collect()}
    assert rows[1]["n_dup_windows"] == 0
    assert rows[2]["n_dup_windows"] >= 1, rows[2]
    assert rows[3]["n_dup_windows"] == 0
    assert_parity(fn(spark, tmp), run_oracle(oracle, tmp), "window_dedup_synth")


def test_window_dedup_share_bounds(spark):
    """Share is a milli-ratio: 0 <= n_dup <= n_windows, share ==
    n_dup*1000 div n_windows, and only >=20-token docs appear."""
    fn, _o, _d = STAGED["dedup_window_substring"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert r["dup_share_milli"] == r["n_dup_windows"] * 1000 // r["n_windows"]


# ---------------------------------------------------------------------------
# search_hybrid_rrf
# ---------------------------------------------------------------------------


def test_rrf_fuses_both_heads(spark):
    """The fusion actually mixes modalities: at least one returned doc
    carries BOTH ranks (intersection boost — RRF's whole point is that
    agreement outranks either single head), scores are the exact
    quantized 1/(60+r) sums of the carried ranks, and the list is
    sorted by (rrf desc, doc_id)."""
    from petfinder_database_distributor_spark.plans.staged_r15 import (
        _RRF_K,
        _RRF_SCALE,
    )

    fn, _o, _d = STAGED["search_hybrid_rrf"]
    rows = fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        expect = 0
        if r["rank_sparse"] is not None:
            expect += _RRF_SCALE // (_RRF_K + int(r["rank_sparse"]))
        if r["rank_dense"] is not None:
            expect += _RRF_SCALE // (_RRF_K + int(r["rank_dense"]))
        assert r["rrf_nano"] == expect, r
    keys = [(-r["rrf_nano"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_rrf_agreement_outranks_single_head(spark):
    """A document near the top of BOTH lists must outrank a document
    that leads only one: rank-1-in-both is the provable maximum of the
    fusion (2·10^9/61), and any both-ranked doc beats any single-ranked
    doc whose one rank is not better than both of the former's."""
    fn, _o, _d = STAGED["search_hybrid_rrf"]
    rows = fn(spark, SF_SMALL).collect()
    both = [r for r in rows if r["rank_sparse"] is not None and r["rank_dense"] is not None]
    single = [r for r in rows if (r["rank_sparse"] is None) != (r["rank_dense"] is None)]
    if both and single:
        # the best both-ranked doc always beats the worst single-ranked one
        assert max(r["rrf_nano"] for r in both) > min(r["rrf_nano"] for r in single)


# ---------------------------------------------------------------------------
# sketch_kmv_set_ops
# ---------------------------------------------------------------------------


def test_kmv_setops_register_identities(spark):
    """Exact structural pins: the merged register partitions into
    intersection + two differences; the trimmed union threshold never
    exceeds the pairwise theta; estimates degrade to exact counts when
    theta stayed at M (registers not full)."""
    from petfinder_database_distributor_spark.plans.staged_r14 import (
        _KMV_K,
        _KMV_M,
    )

    rows = STAGED["sketch_kmv_set_ops"][0](spark, SF_SMALL).collect()
    assert rows, "fixture must yield event-type pairs"
    for r in rows:
        assert r["k_merged"] == r["k_inter"] + r["k_only_a"] + r["k_only_b"], r
        assert r["theta_u"] <= r["theta"], r
        assert r["k_union"] == (
            _KMV_K - 1 if r["k_merged"] >= _KMV_K else r["k_merged"]
        ), r
        if r["theta"] == _KMV_M:
            assert r["est_intersect"] == r["k_inter"], r
            assert r["est_only_a"] == r["k_only_a"], r
        if r["theta_u"] == _KMV_M:
            assert r["est_union"] == r["k_merged"], r


def test_kmv_union_from_registers_equals_direct_sketch(spark):
    """The theta-union mergeability THEOREM, executable: for every event
    type pair, the union estimate computed from the two 64-value
    registers must equal the KMV estimate built DIRECTLY over the
    combined scopes' distinct user hashes — the property that lets a
    100 TB deployment keep only registers."""
    import duckdb

    from petfinder_database_distributor_spark.operators.text import MD5INT_SQL
    from petfinder_database_distributor_spark.plans.staged_r14 import (
        _KMV_K,
        _KMV_M,
    )

    h = MD5INT_SQL.format(x="user_id::VARCHAR")
    direct = {}
    con = duckdb.connect()
    pairs_sql = f"""
    WITH hx AS (SELECT DISTINCT event_type AS scope, {h} AS h
                FROM read_parquet('{SF_SMALL}/events.parquet')
                WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    sc AS (SELECT DISTINCT scope FROM hx),
    pr AS (SELECT a.scope AS sa, b.scope AS sb FROM sc a JOIN sc b
           ON a.scope < b.scope),
    uh AS (SELECT pr.sa, pr.sb, hx.h FROM pr JOIN hx
           ON hx.scope IN (pr.sa, pr.sb) GROUP BY 1, 2, 3),
    rk AS (SELECT sa, sb, h,
                  row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
           FROM uh),
    g AS (SELECT sa, sb, count(*) AS cnt,
                 max(h) FILTER (WHERE rk <= {_KMV_K}) AS kth
          FROM rk GROUP BY 1, 2)
    SELECT sa, sb,
           CASE WHEN cnt < {_KMV_K} THEN cnt
                ELSE (({_KMV_K} - 1)::HUGEINT * {_KMV_M} // kth)::BIGINT
           END AS est
    FROM g
    """
    for sa, sb, est in con.execute(pairs_sql).fetchall():
        direct[(sa, sb)] = est
    rows = STAGED["sketch_kmv_set_ops"][0](spark, SF_SMALL).collect()
    assert rows and len(rows) == len(direct)
    for r in rows:
        assert r["est_union"] == direct[(r["scope_a"], r["scope_b"])], r


# ---------------------------------------------------------------------------
# quality_rater_kappa
# ---------------------------------------------------------------------------


def test_kappa_cells_partition_and_bound(spark):
    """Contingency cells must partition n_docs; kappa lies in [-1, 1]
    when defined; the ALL row aggregates the per-lang rows exactly."""
    rows = STAGED["quality_rater_kappa"][0](spark, SF_SMALL).collect()
    by = {r["scope"]: r for r in rows}
    assert "ALL" in by and len(by) > 1
    for r in rows:
        assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n_docs"], r
        if r["kappa"] is not None:
            assert -1.0 <= r["kappa"] <= 1.0, r
    per = [r for r in rows if r["scope"] != "ALL"]
    for cell in ("n_docs", "n11", "n10", "n01", "n00"):
        assert sum(r[cell] for r in per) == by["ALL"][cell], cell


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    """Ground truth: a corpus where the raters agree on every document
    with both verdicts represented — kappa must be exactly 1.0."""
    import shutil

    import duckdb

    from tests.degenerate_fixtures import TABLES

    tmp = str(tmp_path)
    good = " ".join(["the quick brown fox and one dog runs far away now"] * 3)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * REPLACE (CASE WHEN doc_id % 2 = 0 THEN '{good}'
                                 ELSE '' END AS text)
          FROM read_parquet('{SF_SMALL}/documents.parquet')
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMALL}/{t}.parquet", f"{tmp}/{t}.parquet")
    fn, oracle, _d = STAGED["quality_rater_kappa"]
    rows = {r["scope"]: r for r in fn(spark, tmp).collect()}
    allr = rows["ALL"]
    assert allr["n10"] == 0 and allr["n01"] == 0, allr
    assert allr["n11"] > 0 and allr["n00"] > 0, allr
    assert allr["kappa"] == 1.0, allr
    assert_parity(fn(spark, tmp), run_oracle(oracle, tmp), "kappa_perfect")


def test_kmv_setops_single_corpus_scan_and_kappa_plan_shape(spark):
    """Physical-plan pins (the r14 explain audit): the set-ops query
    must read events ONCE (register frame localCheckpoint-materialized
    before the pairwise self-join — without it each join side re-scans
    the corpus); kappa must be one pruned documents scan into a rollup
    aggregate — no join, no window."""
    import io
    from contextlib import redirect_stdout

    def plan(name):
        buf = io.StringIO()
        with redirect_stdout(buf):
            STAGED[name][0](spark, SF_SMALL).explain("formatted")
        return buf.getvalue()

    # the checkpoint materializes the register frame EAGERLY, so the
    # pairwise plan contains ZERO corpus scans (both join sides read the
    # checkpointed |scopes|-row RDD) — the strongest form of the pin
    sp = plan("sketch_kmv_set_ops")
    assert sp.count("events.parquet") == 0
    assert "ExistingRDD" in sp or "LocalTableScan" in sp
    kp = plan("quality_rater_kappa")
    assert kp.count("documents.parquet") == 1
    assert "Expand" in kp and "Join" not in kp and "Window" not in kp
    assert "text:string" not in kp.split("ReadSchema")[0], "projection only"


# ---------------------------------------------------------------------------
# sample_bottomk_quantiles
# ---------------------------------------------------------------------------


def test_bottomk_exact_when_group_fits(spark):
    """At sf0.001 every event type holds <= k rows, so the sample IS
    the group: n_sample == n_total and each reported percentile equals
    the true order statistic at ceil(q*n/100), recomputed independently
    in Python from the raw parquet."""
    import duckdb

    rows = STAGED["sample_bottomk_quantiles"][0](spark, SF_SMALL).collect()
    assert rows
    con = duckdb.connect()
    for r in rows:
        assert r["n_sample"] == r["n_total"] <= 256, r
        vals = sorted(
            v[0]
            for v in con.execute(
                f"""SELECT value + 0.0 FROM
                    read_parquet('{SF_SMALL}/events.parquet')
                    WHERE event_type = ? AND event_id IS NOT NULL
                      AND value IS NOT NULL AND isfinite(value)
                      AND abs(value) < 1e12""",
                [r["event_type"]],
            ).fetchall()
        )
        for q in (50, 90, 99):
            idx = max(1, (q * len(vals) + 99) // 100)
            assert r[f"q{q}"] == vals[idx - 1], (r["event_type"], q)


@pytest.mark.sf001
def test_bottomk_sampling_regime_at_driver_scale(spark):
    """At sf0.01 groups exceed k — the query must actually SAMPLE
    (n_sample == 256 < n_total) and quantiles must still be members of
    the group's value set."""
    rows = STAGED["sample_bottomk_quantiles"][0](spark, SF_ORACLE).collect()
    assert rows
    assert all(r["n_sample"] == 256 < r["n_total"] for r in rows), rows
