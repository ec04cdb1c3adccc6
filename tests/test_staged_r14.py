"""Round-14 staged queries (plans/staged_r14.py) — the full registration
bar, applied BEFORE registration (the staged_r12/r13 discipline): hash
parity against the DuckDB oracle at sf0.001 on every run and at the
driver's exact sf0.01 scale under the sf001 marker, plus per-operator
semantic pins. The four degenerate-shape sweeps run via the generic
promotion gate (tests/test_staged_gate.py discovers this module's
STAGED manifest automatically). Registration waits for the r14 window
(see the R14 ROTATION PLAN note in registry.PRIORITY)."""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.plans.staged_r14 import STAGED
from tests.conftest import SF_ORACLE, SF_SMALL
from tests.oracle_compare import assert_parity, run_oracle


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
# sample_kcenter_bucketed
# ---------------------------------------------------------------------------


def test_kcenter_bucketed_semantics(spark):
    """Selection invariants + the scale-twin quality contract against the
    exact greedy: same k, same distance geometry, a covering radius in
    the same order of magnitude (the sampled variant trades radius for
    passes — it must not be degenerate)."""
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        sample_kcenter_greedy,
    )

    fn, _oracle, _ = STAGED["sample_kcenter_bucketed"]
    rows = sorted(fn(spark, SF_SMALL).collect(), key=lambda r: r["sel_rank"])
    assert rows and len(rows) <= 8
    assert [r["sel_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["vec_id"] for r in rows}) == len(rows)
    # greedy's farthest-first property holds WITHIN the candidate set
    dists = [r["dist_sq"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    # one shared corpus radius on every row, covering every candidate pick
    radii = {r["corpus_radius_sq"] for r in rows}
    assert len(radii) == 1
    radius = radii.pop()
    greedy = sorted(
        sample_kcenter_greedy(spark, SF_SMALL).collect(),
        key=lambda r: r["sel_rank"],
    )
    greedy_radius = greedy[-1]["dist_sq"]
    # sampled centers can't beat the greedy lower-bound geometry by much
    # nor collapse: radius within [greedy_last/4, 64*greedy_last]
    assert radius > 0
    assert radius <= 64 * greedy_radius, (radius, greedy_radius)


# ---------------------------------------------------------------------------
# sketch_kmv_distinct
# ---------------------------------------------------------------------------


def test_kmv_register_merge_equals_direct(spark):
    """The theta-sketch merge theorem, checked concretely: the k smallest
    hashes of the UNION of the per-type registers equal the directly
    built global register (every global top-k hash is inside its own
    type's top-k), so the ALL row is exactly the merged estimate."""
    from petfinder_database_distributor_spark.operators.text import md5int
    from petfinder_database_distributor_spark.plans.staged_r14 import _KMV_K
    from petfinder_database_distributor_spark.schema import load_table
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, SF_SMALL, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    hx = ev.select(
        F.col("event_type").alias("scope"),
        md5int(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("scope").orderBy("h")
    per_type_registers = (
        hx.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .select("h")
        .distinct()
    )
    merged = [
        r["h"] for r in per_type_registers.orderBy("h").limit(_KMV_K).collect()
    ]
    direct = [
        r["h"]
        for r in hx.select("h").distinct().orderBy("h").limit(_KMV_K).collect()
    ]
    assert merged == direct


def test_kmv_estimate_quality(spark):
    """KMV's relative error is ~1/sqrt(k) = 12.5% at k=64; assert a slack
    2x band on every full register, and exactness below k."""
    fn, _oracle, _ = STAGED["sketch_kmv_distinct"]
    for r in fn(spark, SF_SMALL).collect():
        if r["kth_hash"] is None:
            assert r["est_distinct"] == r["n_exact"]
        else:
            assert abs(r["est_distinct"] - r["n_exact"]) <= 0.25 * r["n_exact"], r


# ---------------------------------------------------------------------------
# text_paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_first_occurrence(spark, tmp_path):
    """Constructed corpus pins the semantics: doc 1 owns every line's
    first occurrence; doc 2 repeats two of doc 1's three lines; doc 3 is
    all-new; doc 4 is empty."""
    import duckdb

    tmp = str(tmp_path)
    duckdb.connect().execute(f"""COPY (
      SELECT * FROM (VALUES
        (1, 'alpha beta' || chr(10) || 'gamma delta' || chr(10) || 'epsilon', 'en', 's', 1),
        (2, 'alpha beta' || chr(10) || 'gamma delta' || chr(10) || 'zeta', 'en', 's', 1),
        (3, 'eta theta' || chr(10) || 'iota', 'en', 's', 1),
        (4, '', 'en', 's', 1)
      ) t(doc_id, text, lang, source, n_chars)
    ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
    fn, _oracle, _ = STAGED["text_paragraph_dedup"]
    rows = {r["doc_id"]: r for r in fn(spark, tmp).collect()}
    assert rows[1]["n_dup_lines"] == 0 and rows[1]["keep"]
    assert rows[2]["n_lines"] == 3 and rows[2]["n_dup_lines"] == 2
    assert rows[2]["dup_ratio_milli"] == 666 and not rows[2]["keep"]
    assert rows[3]["n_dup_lines"] == 0 and rows[3]["keep"]
    assert rows[4]["n_lines"] == 0 and rows[4]["keep"]


# ---------------------------------------------------------------------------
# graph_bfs_layers
# ---------------------------------------------------------------------------


def test_bfs_layers_semantics(spark):
    """Layer invariants on the real graph: seeds at 0, alternating
    bipartite sides, each node discovered exactly once, and every
    non-seed node adjacent to SOME previous-layer node."""
    fn, _oracle, _ = STAGED["graph_bfs_layers"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    seen = {}
    for r in rows:
        key = (r["node_type"], r["node_id"])
        assert key not in seen, f"node discovered twice: {key}"
        seen[key] = r["dist"]
    for (t, _n), d in seen.items():
        assert (d % 2 == 0) == (t == "P"), (t, d)
        assert 0 <= d <= 4
    assert all(n < 10 for (t, n), d in seen.items() if d == 0)


def test_bfs_synthetic_chain(spark, tmp_path):
    """A constructed 5-hop chain pins the round cutoff: the node at
    distance 5 is NOT discovered (rounds = 4)."""
    import duckdb

    tmp = str(tmp_path)
    # chain: p1 - s101 - p201 - s301 - p401 - s501 (distance 5, cut off)
    duckdb.connect().execute(f"""COPY (
      SELECT ROW_NUMBER() OVER () AS l_orderkey, p AS l_partkey, s AS l_suppkey,
             1.0 AS l_quantity, 1.0 AS l_extendedprice, 0.0 AS l_discount,
             0.0 AS l_tax, 'N' AS l_returnflag, 'O' AS l_linestatus,
             DATE '2024-01-01' AS l_shipdate
      FROM (VALUES (1, 101), (201, 101), (201, 301), (401, 301), (401, 501))
           t(p, s)
    ) TO '{tmp}/lineitem.parquet' (FORMAT PARQUET)""")
    fn, _oracle, _ = STAGED["graph_bfs_layers"]
    got = {(r["node_type"], r["node_id"]): r["dist"] for r in fn(spark, tmp).collect()}
    assert got == {
        ("P", 1): 0,
        ("S", 101): 1,
        ("P", 201): 2,
        ("S", 301): 3,
        ("P", 401): 4,
        # ("S", 501) is 5 hops out — beyond the bounded rounds
    }


# ---------------------------------------------------------------------------
# json_kv_profile
# ---------------------------------------------------------------------------


def test_json_kv_profile_semantics(spark, tmp_path):
    """Constructed props pin the contract: malformed JSON contributes
    nothing, JSON null counts as present-but-null, numerics parse — and
    the two r13 self-probe divergence classes hold cross-engine parity:
    DUPLICATE keys (from_json's MapData carries both entries and explode
    emits each; the first-cut oracle read only the first value) and a
    key containing a double quote (the first-cut oracle's '$."<key>"'
    path broke on it)."""
    import duckdb

    from tests.oracle_compare import assert_parity, run_oracle

    tmp = str(tmp_path)
    duckdb.connect().execute(f"""COPY (
      SELECT * FROM (VALUES
        (1, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"a": 5, "b": "x"}}'),
        (2, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"a": 7.5, "b": null}}'),
        (3, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{bad'),
        (4, TIMESTAMP '2024-01-01', 1, 'click', 1.0, NULL),
        (5, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"a": "n/a"}}'),
        (6, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"a": 1, "a": 2}}'),
        (7, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"q\\"k": 9}}'),
        (8, TIMESTAMP '2024-01-01', 1, 'click', 1.0, '{{"n": {{"x": 1}}}}')
      ) t(event_id, ts, user_id, event_type, value, props)
    ) TO '{tmp}/events.parquet' (FORMAT PARQUET)""")
    import shutil

    from tests.conftest import SF_SMALL

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_SMALL}/{t}.parquet", f"{tmp}/{t}.parquet")
    fn, oracle, _ = STAGED["json_kv_profile"]
    assert_parity(fn(spark, tmp), run_oracle(oracle, tmp), "json_kv_edge")
    rows = {r["key"]: r for r in fn(spark, tmp).collect()}
    assert set(rows) == {"a", "b", 'q"k', "n"}
    a, b = rows["a"], rows["b"]
    assert a["n_present"] == 5 and a["n_numeric"] == 4 and a["n_null_vals"] == 0
    assert a["n_distinct_vals"] == 5  # '5', '7.5', 'n/a', '1', '2' (dups kept)
    assert b["n_present"] == 2 and b["n_null_vals"] == 1 and b["n_numeric"] == 0
    assert b["min_val"] == "x" and b["max_val"] == "x"
    assert rows['q"k']["n_numeric"] == 1
    assert rows["n"]["min_val"] == '{"x":1}' and rows["n"]["n_numeric"] == 0


# ---------------------------------------------------------------------------
# text_zipf_fit
# ---------------------------------------------------------------------------


def test_zipf_fit_constructed_power_law(spark, tmp_path):
    """A corpus whose term frequencies are EXACTLY 4096/rank must fit
    slope ~ -1.000 (the fixed-point log2 kernel's quantization and the
    floor on 4096/rank leave only milli-scale residue)."""
    import duckdb

    words = []
    for r in range(1, 33):
        words += [f"w{r:02d}"] * (4096 // r)
    text = " ".join(words)
    tmp = str(tmp_path)
    duckdb.connect().execute(f"""COPY (
      SELECT 1 AS doc_id, '{text}' AS text, 'en' AS lang,
             's' AS source, {len(text)} AS n_chars
    ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)""")
    fn, _oracle, _ = STAGED["text_zipf_fit"]
    rows = fn(spark, tmp).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_terms"] == 32
    assert r["top_tf"] == 4096 and r["top_term"] == "w01"
    assert not r["freq_clamped"]
    assert abs(r["slope_milli"] + 1000) <= 20, r["slope_milli"]


def test_zipf_fit_fixture_shape(spark):
    """The synthetic fixture's near-uniform vocabulary must fit a slope
    far ABOVE -1 (i.e. much flatter than natural text) — the diagnostic
    doing its job: this corpus does not look like language."""
    fn, _oracle, _ = STAGED["text_zipf_fit"]
    rows = fn(spark, SF_SMALL).collect()
    assert len(rows) == 1
    assert -500 <= rows[0]["slope_milli"] <= 0, rows[0]["slope_milli"]


# ---------------------------------------------------------------------------
# sample_stratified_neyman
# ---------------------------------------------------------------------------


def test_neyman_allocation_sums_to_budget(spark):
    """Largest-remainder exactness + the Neyman ORDER property: the
    allocation sums to the budget exactly, and a stratum with both more
    rows and more dispersion never receives less than its dominated
    peer."""
    fn, _oracle, _ = STAGED["sample_stratified_neyman"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    assert sum(r["alloc_n"] for r in rows) == 1000
    for a in rows:
        for b in rows:
            if (
                a["n_rows"] >= b["n_rows"]
                and a["mad_cents"] >= b["mad_cents"]
                and a["n_rows"] * a["mad_cents"] > b["n_rows"] * b["mad_cents"]
            ):
                assert a["alloc_n"] >= b["alloc_n"], (a, b)


def test_neyman_constant_corpus_yields_zero_rows(spark, tmp_path):
    """All-constant measures => every stratum's dispersion is 0 => the
    weight mass vanishes => ZERO rows on both engines (the r13 wsum
    contract), never a divide-by-zero."""
    import duckdb

    from tests.oracle_compare import assert_parity, run_oracle

    tmp = str(tmp_path)
    duckdb.connect().execute(f"""COPY (
      SELECT ROW_NUMBER() OVER () AS event_id, TIMESTAMP '2024-01-01' AS ts,
             1 AS user_id, t.et AS event_type, 5.0 AS value, '{{}}' AS props
      FROM (VALUES ('click'), ('view'), ('click')) t(et)
    ) TO '{tmp}/events.parquet' (FORMAT PARQUET)""")
    import shutil

    from tests.conftest import SF_SMALL as _S

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"{_S}/{t}.parquet", f"{tmp}/{t}.parquet")
    fn, oracle, _ = STAGED["sample_stratified_neyman"]
    out = fn(spark, tmp)
    assert out.count() == 0
    assert_parity(out, run_oracle(oracle, tmp), "neyman_constant")


# ---------------------------------------------------------------------------
# stream_sketch_kmv
# ---------------------------------------------------------------------------


def test_stream_kmv_equals_batch_register(spark):
    """The streaming register (per-batch reduce + monoid merge) must
    equal the batch sketch's ALL row — mergeability is the property that
    makes the sketch distributable at all."""
    fn_stream, _o1, _ = STAGED["stream_sketch_kmv"]
    fn_batch, _o2, _ = STAGED["sketch_kmv_distinct"]
    stream_rows = fn_stream(spark, SF_SMALL).collect()
    batch_all = [
        r for r in fn_batch(spark, SF_SMALL).collect() if r["scope"] == "ALL"
    ]
    assert len(stream_rows) == 1 and len(batch_all) == 1
    s, b = stream_rows[0], batch_all[0]
    assert s["est_distinct"] == b["est_distinct"]
    assert s["kth_hash"] == b["kth_hash"]
