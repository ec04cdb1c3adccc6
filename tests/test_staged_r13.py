"""Round-13 staged queries (plans/staged_r13.py) — the full registration
bar, applied BEFORE registration (the staged_r12 discipline): hash
parity against the DuckDB oracle at sf0.001 on every run and at the
driver's exact sf0.01 scale under the sf001 marker, plus per-operator
semantic pins. Registration waits for the r13 window because the r12
window is an exact 50-slot fit (5 new registrations + 39 dirty-data
contract rows + the r8 drain)."""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.plans.staged_r13 import STAGED
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


def test_c4_rules_semantics(spark):
    """Hand-checkable invariants on real rows. The synthetic corpus is
    PUNCTUATION-FREE prose-shaped token soup, so C4's verbatim verdict is
    constant-reject — every doc dies on the terminal-punctuation line
    gate (C4 was built to reject exactly this non-prose shape); the
    per-rule counters and the synthetic-edge test below carry the
    discriminative semantics."""
    fn, _oracle, _ = STAGED["text_c4_rules"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["kept_lines"] <= r["n_lines"]
        # a kept line passed the punctuation gate AND the word gate, so
        # the kept count can't exceed n_lines minus either dropped count
        assert r["kept_lines"] <= r["n_lines"] - r["dropped_punct"] + 0
        assert r["kept_lines"] <= r["n_lines"] - r["dropped_short"] + 0
        if r["keep"]:
            assert r["kept_lines"] >= 3
            assert not r["has_lorem"] and not r["has_brace"]
    # every fixture doc fails the punctuation gate and nothing else
    assert all(r["dropped_punct"] == r["n_lines"] for r in rows)
    assert not any(r["keep"] for r in rows)


def test_c4_rules_synthetic_edges(spark):
    """Constructed docs pin each rule in isolation."""
    from petfinder_database_distributor_spark.plans.staged_r13 import text_c4_rules

    import duckdb
    import os
    import tempfile

    docs = [
        # 3 good lines → keep
        (1, "one two three four five.\nsix seven eight nine ten!\na b c d e?", "en", "s", 10),
        # terminal punct but too few words per line
        (2, "short line.\ntiny.\nno.", "en", "s", 10),
        # no terminal punctuation
        (3, "one two three four five\nsix seven eight nine ten", "en", "s", 10),
        # lorem ipsum gate
        (4, "Lorem Ipsum dolor sit amet.\na b c d e.\nf g h i j.\nk l m n o.", "en", "s", 10),
        # brace gate
        (5, "function() { return 1; }\na b c d e.\nf g h i j.\nk l m n o.", "en", "s", 10),
        # javascript line dropped, still enough kept lines
        (6, "enable javascript to view this.\na b c d e.\nf g h i j.\nk l m n o.", "en", "s", 10),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
            " source VARCHAR, n_chars BIGINT)"
        )
        con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", docs)
        con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")
        got = {r["doc_id"]: r for r in text_c4_rules(spark, tmp).collect()}
    assert got[1]["keep"] and got[1]["kept_lines"] == 3
    assert not got[2]["keep"] and got[2]["dropped_short"] == 3
    assert not got[3]["keep"] and got[3]["dropped_punct"] == 2
    assert not got[4]["keep"] and got[4]["has_lorem"]
    assert not got[5]["keep"] and got[5]["has_brace"]
    assert got[6]["keep"] and got[6]["kept_lines"] == 3  # js line dropped


def test_temperature_allocation_sums_exactly_to_budget(spark):
    """The largest-remainder apportionment's whole point: allocations sum
    EXACTLY to the corpus budget, bonuses go to the largest remainders,
    and the sqrt flattening holds (smaller domains get a >= share of
    budget relative to their corpus share)."""
    fn, _oracle, _ = STAGED["domain_budget_temperature"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    budget = sum(r["n_tok"] for r in rows)
    assert sum(r["alloc_tok"] for r in rows) == budget, "exact-sum violated"
    n_bonus = sum(1 for r in rows if r["got_bonus"])
    assert 0 <= n_bonus < len(rows) + 1
    # flattening: sort by corpus size; alloc/corpus ratio is non-increasing
    by_size = sorted(rows, key=lambda r: r["n_tok"])
    ratios = [r["alloc_tok"] / r["n_tok"] for r in by_size if r["n_tok"] > 0]
    for a, b in zip(ratios, ratios[1:]):
        assert a >= b - 1e-9, "sqrt temperature must favor smaller domains"


def test_vocab_coverage_monotone_and_bounded(spark):
    """Coverage is monotone in k, bounded by 1e6 ppm, and covered_tok
    matches an independent pandas recount at the smallest k."""
    fn, _oracle, _ = STAGED["text_vocab_coverage"]
    rows = sorted(fn(spark, SF_SMALL).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [100, 1000, 10000]
    covs = [r["coverage_ppm"] for r in rows]
    assert covs == sorted(covs), "coverage must be monotone in k"
    for r in rows:
        assert 0 < r["coverage_ppm"] <= 1_000_000
        assert r["covered_tok"] <= r["total_tok"]
        if r["k"] >= r["vocab_size"]:
            assert r["covered_tok"] == r["total_tok"]
    # independent recount of top-100 coverage
    import collections

    import duckdb

    toks = duckdb.connect().execute(
        f"""SELECT list_filter(string_split_regex(lower(replace(replace(
              trim(coalesce(text, '')), 'İ', 'i'), 'Σ', 'σ')), '\\s+'),
            x -> x <> '') FROM read_parquet('{SF_SMALL}/documents.parquet')"""
    ).fetchall()
    tf = collections.Counter()
    for (t,) in toks:
        tf.update(t)
    top100 = sum(
        c for _w, c in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    assert rows[0]["covered_tok"] == top100


def test_kcore_fixed_point_and_invariants(spark):
    """A further peel round changes nothing (the unrolled round count
    suffices at fixture scale); every survivor has degree >= k inside
    the survivor-induced subgraph; bipartite sides are consistent."""
    from petfinder_database_distributor_spark.plans.staged_r13 import (
        _KCORE_K,
        graph_kcore_decomposition,
    )

    rows = graph_kcore_decomposition(spark, SF_SMALL).collect()
    # the fixture graph must actually have a non-trivial 3-core
    assert rows, "empty 3-core at fixture scale would pin nothing"
    for r in rows:
        assert r["degree"] >= _KCORE_K
        assert r["side"] == ("part" if r["node"] % 2 == 0 else "supplier")
    # fixed point: recompute degrees of the survivor-induced subgraph
    # from the raw edge list and check they match the reported degrees
    import duckdb

    edges = duckdb.connect().execute(
        f"""SELECT DISTINCT l_partkey * 2, l_suppkey * 2 + 1
            FROM read_parquet('{SF_SMALL}/lineitem.parquet')
            WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL"""
    ).fetchall()
    core = {r["node"] for r in rows}
    deg = {n: 0 for n in core}
    for a, b in edges:
        if a in core and b in core:
            deg[a] += 1
            deg[b] += 1
    for r in rows:
        assert deg[r["node"]] == r["degree"], r
        assert deg[r["node"]] >= _KCORE_K, "not a fixed point — add rounds"


def test_repetition_rules_semantics(spark):
    """Discriminative on the fixture; keep == AND of the four flags; a
    constructed looping doc is rejected while a diverse doc passes."""
    fn, _oracle, _ = STAGED["text_gopher_repetition"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        flags = [r["r_top2"], r["r_top3"], r["r_top4"], r["r_dup5"]]
        assert r["keep"] == all(flags)
        for c in ("top2_ppm", "top3_ppm", "top4_ppm", "dup5_ppm"):
            assert 0 <= r[c] <= 1_000_000
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows), "repetition gate should be discriminative"


def test_repetition_synthetic_loop_rejected(spark):
    """A doc that loops one phrase must fail every gate; a diverse doc
    passes all of them."""
    import tempfile

    import duckdb

    from petfinder_database_distributor_spark.plans.staged_r13 import (
        text_gopher_repetition,
    )

    loop = "click here now " * 50
    diverse = " ".join(f"w{i:03d}" for i in range(150))
    with tempfile.TemporaryDirectory() as tmp:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
            " source VARCHAR, n_chars BIGINT)"
        )
        con.executemany(
            "INSERT INTO d VALUES (?, ?, ?, ?, ?)",
            [(1, loop, "en", "s", len(loop)), (2, diverse, "en", "s", len(diverse))],
        )
        con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")
        got = {r["doc_id"]: r for r in text_gopher_repetition(spark, tmp).collect()}
    assert not got[1]["keep"]
    assert not got[1]["r_top2"] and not got[1]["r_dup5"]
    assert got[1]["dup5_ppm"] == 1_000_000  # fully duplicated, capped
    assert got[2]["keep"], got[2]


def test_vacuum_reclaims_expired_storage_only(spark):
    """The invariants the parity hash can't see: vacuum actually deletes
    v0's unreferenced files; retained versions stay readable (v1 time
    travel works, v2 is latest); expired time travel RAISES rather than
    serving a ghost; files referenced by retained manifests survive."""
    import glob
    import os

    from petfinder_database_distributor_spark.plans.staged_r13 import (
        snapshot_vacuum_retention,
    )
    from petfinder_database_distributor_spark.sources.snapshot import snapshot_read
    from petfinder_database_distributor_spark.streaming.incremental import SCRATCH_ROOT

    from tests.conftest import SF_SMALL

    # the query itself rebuilds the table deterministically and vacuums
    latest = snapshot_vacuum_retention(spark, SF_SMALL)
    n_latest = latest.count()
    tag = SF_SMALL.strip("/").replace("/", "_").replace(".", "_").replace("-", "_")
    table = f"{SCRATCH_ROOT}/vacuum_retention/{tag}"
    # v0's data files are gone (manifest removed, unreferenced files unlinked)
    v0_files = glob.glob(f"{table}/v0/**/*.parquet", recursive=True)
    assert not v0_files, f"expired v0 data files survived vacuum: {v0_files}"
    assert not os.path.exists(f"{table}/v0/_manifest.json") and not glob.glob(
        f"{table}/v0/*manifest*"
    )
    # retained time travel intact
    v1 = snapshot_read(spark, table, version=1)
    assert v1.count() < n_latest  # v1 is the filtered subset, v2 appended back
    # expired time travel raises
    import pytest as _pytest

    with _pytest.raises(Exception):
        snapshot_read(spark, table, version=0).count()
