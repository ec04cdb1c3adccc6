"""Round-12 staged queries (plans/staged_r12.py) — the full registration
bar, applied BEFORE registration: hash parity against the DuckDB oracle at
sf0.001 on every run and at the driver's exact sf0.01 scale under the
sf001 marker, plus per-operator semantic pins. The queries stay out of the
registry until round 12 only because the round-11 driver window is an
exact 50-slot fit with the r7-backlog drain (see the module docstring)."""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.plans.staged_r12 import STAGED
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


def test_unimax_waterfilling_invariants(spark):
    """Capped set is a prefix of the cap-ascending order; uncapped
    allocations share one level >= every capped domain's cap; the total
    allocation never exceeds the budget."""
    fn, _oracle, _ = STAGED["domain_budget_unimax"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows, "no domains"
    by_cap = sorted(rows, key=lambda r: (r["cap_tok"], r["source"]))
    flags = [r["capped"] for r in by_cap]
    assert flags == sorted(flags, reverse=True), "capped domains must be a prefix"
    uncapped = [r for r in by_cap if not r["capped"]]
    if uncapped:
        levels = {r["alloc_tok"] for r in uncapped}
        assert len(levels) == 1, "uncapped domains share one waterfill level"
        level = levels.pop()
        for r in by_cap:
            if r["capped"]:
                assert r["cap_tok"] <= level
                assert r["alloc_tok"] == r["cap_tok"]
    budget = sum(r["n_tok"] for r in rows)
    assert sum(r["alloc_tok"] for r in rows) <= budget
    for r in rows:
        assert r["alloc_tok"] <= r["cap_tok"]


def _unimax_closed_form(caps: list[int], budget: int) -> list[int]:
    """Pure-Python mirror of the closed form BOTH engines implement:
    ascending caps, m = first-violation minus one, capped prefix gets its
    cap, the rest split the remainder by floor division."""
    n = len(caps)
    caps = sorted(caps)
    caps_before = 0
    m = n
    for i, cap in enumerate(caps, start=1):
        if not (cap * (n - i + 1) <= budget - caps_before):
            m = i - 1
            break
        caps_before += cap
    caps_m = sum(caps[:m])
    return [
        caps[i] if i < m else (budget - caps_m) // (n - m) for i in range(n)
    ]


def _unimax_sequential_exact(caps: list[int], budget: int):
    """The definitional UniMax waterfill in EXACT rational arithmetic
    (the paper's real-valued form): process ascending, each domain gets
    min(cap, even share of what's left). Uncapped shares are all equal to
    one level L by construction."""
    from fractions import Fraction

    caps = sorted(caps)
    out, left = [], Fraction(budget)
    for i, cap in enumerate(caps):
        share = left / (len(caps) - i)
        a = min(Fraction(cap), share)
        out.append(a)
        left -= a
    return out


def test_unimax_closed_form_is_floor_of_exact_waterfill():
    """The prefix theorem the SQL relies on, adversarially checked: the
    window-expressible closed form must (a) cap exactly the domains the
    real-valued sequential waterfill caps, and (b) give every uncapped
    domain floor(level) — identical floors, never the
    remainder-to-later-domains integer drift a naive integer sequential
    loop would produce (a first draft of this test used one and CAUGHT
    that divergence: caps=[1,1], budget=1 → closed [0,0], drifting
    sequential [0,1])."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        caps=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
        budget=st.integers(min_value=0, max_value=4 * 10**10),
    )
    def check(caps, budget):
        caps = sorted(caps)
        closed = _unimax_closed_form(caps, budget)
        exact = _unimax_sequential_exact(caps, budget)
        n = len(caps)
        for i in range(n):
            if exact[i] == caps[i]:  # capped (or tie — same value both ways)
                assert closed[i] == caps[i]
            else:
                assert closed[i] == exact[i].numerator // exact[i].denominator
        # floor under-spend is bounded by the uncapped-domain count
        assert 0 <= min(budget, sum(caps)) - sum(closed) < max(n, 1)

    check()


def test_kcenter_matches_independent_numpy_greedy(spark):
    """Full independent recompute: the Spark selection must equal a NumPy
    farthest-point-sampling over the same quantized vectors — every pick,
    every radius, exact."""
    import numpy as np
    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.plans.staged_r12 import _kc_qe
    from petfinder_database_distributor_spark.schema import load_table

    fn, _oracle, _ = STAGED["sample_kcenter_greedy"]
    got = sorted(fn(spark, SF_SMALL).collect(), key=lambda r: r["sel_rank"])
    # quantize through the operator's own kernel (quantizer parity is the
    # DuckDB oracle's job — np.round would half-even where both engines
    # round half-up); the GREEDY below is the independent recompute
    rows = (
        load_table(spark, SF_SMALL, "embeddings")
        .filter("vec_id IS NOT NULL AND embedding IS NOT NULL")
        .select("vec_id", _kc_qe(F.col("embedding")).alias("qe"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    q = np.array([rows[i]["qe"] for i in order], dtype=np.int64)
    picked = [0]  # lowest vec_id after the sort
    dists = [0]
    mind = ((q - q[0]) ** 2).sum(axis=1)
    mind[0] = -1  # picked sentinel: never re-selected
    for _ in range(7):
        best = int(np.lexsort((ids, -mind))[0])
        picked.append(best)
        dists.append(int(mind[best]))
        d = ((q - q[best]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d)
        mind[best] = -1
    expect = [(i + 1, int(ids[p]), dists[i]) for i, p in enumerate(picked)]
    assert [(r["sel_rank"], r["vec_id"], r["dist_sq"]) for r in got] == expect


def test_kcenter_radius_monotone_and_distinct(spark):
    """Farthest-point sampling: the selection-time distance (covering
    radius) is monotone non-increasing after the seed, picks are distinct,
    and pick 2 is the true farthest point from the seed."""
    fn, _oracle, _ = STAGED["sample_kcenter_greedy"]
    rows = sorted(fn(spark, SF_SMALL).collect(), key=lambda r: r["sel_rank"])
    assert [r["sel_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["vec_id"] for r in rows}) == len(rows)
    dists = [r["dist_sq"] for r in rows[1:]]
    assert dists == sorted(dists, reverse=True), "covering radius must shrink"
    assert all(d >= 0 for d in dists)


def test_knn_graph_matches_brute_force_within_cells(spark):
    """The graph's top-3 per vector equals brute force restricted to the
    vector's committed cell — the candidate-set contract, checked on the
    Spark side alone (the oracle re-proves it cross-engine)."""
    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.operators.similarity import (
        as_double,
        cosine,
    )
    from petfinder_database_distributor_spark.plans.corpus_ops import (
        _ann_index_root,
    )
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        knn_graph_cells,
    )
    from petfinder_database_distributor_spark.schema import load_table
    from petfinder_database_distributor_spark.sources.snapshot import snapshot_read

    got = {
        (r["vec_id"], r["rank"]): r["nbr_id"]
        for r in knn_graph_cells(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    root = _ann_index_root(spark, SF_SMALL)
    codes = snapshot_read(spark, f"{root}/codes", version=0)
    members = codes.select("vec_id", "centroid_id").join(emb, "vec_id").collect()
    by_cell: dict[int, list] = {}
    for r in members:
        by_cell.setdefault(r["centroid_id"], []).append(r)
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    checked = 0
    for cell, rs in by_cell.items():
        if len(rs) < 2:
            continue
        for r in rs[:3]:  # spot-check 3 per cell — full proof is the oracle
            sims = sorted(
                (
                    (-cos(r["embedding"], o["embedding"]), o["vec_id"])
                    for o in rs
                    if o["vec_id"] != r["vec_id"]
                ),
            )
            for rank, (_, nbr) in enumerate(sims[:3], start=1):
                assert got[(r["vec_id"], rank)] == nbr
                checked += 1
    assert checked > 0


def test_knn_graph_pair_budget_in_bounds(spark):
    """The fixture sits inside the Sum(|cell|^2) budget (so the graph
    actually runs), and the estimate math matches a hand recount. The
    over-budget refusal + retrain recovery path is exercised end-to-end by
    tests/test_ann_retrain.py's SemDeDup twin, which shares the guard."""
    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.plans.corpus_ops import (
        _ann_index_root,
    )
    from petfinder_database_distributor_spark.schema import load_table
    from petfinder_database_distributor_spark.sources.snapshot import snapshot_read

    emb = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    root = _ann_index_root(spark, SF_SMALL)
    codes = snapshot_read(spark, f"{root}/codes", version=0)
    members = codes.select("vec_id", "centroid_id").join(emb, "vec_id")
    est = sum(
        r["n"] * r["n"]
        for r in members.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert 0 < est <= 10_000_000, (
        "sf0.001 must sit inside the budget; the refusal path itself is "
        "exercised end-to-end by tests/test_ann_retrain.py's SemDeDup twin"
    )


@pytest.mark.slow  # r15 driver-budget: full retrain lifecycle (~125 s)
def test_knn_guard_retrain_recovery(spark):
    """The kNN graph's pair-budget refusal names an executable fix, and
    the fix suffices — the SemDeDup recovery loop's twin
    (tests/test_ann_retrain.py::test_semdedup_guard_retrain_recovery):
    27x offset replicas put 13.5k vectors in 16 cells (min Sum(n^2) =
    13500^2/16 = 11.4M > 10M for ANY assignment), the guard refuses,
    ann_index_retrain(n_clusters=128) restores the bound, and the rerun
    under the SAME budget finds every replica's identical twin at
    cosine 1."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from petfinder_database_distributor_spark.operators.similarity import (
        ivf_pq_train,
    )
    from petfinder_database_distributor_spark.plans.corpus_ops import (
        ann_index_retrain,
    )
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        knn_graph_decisions,
    )
    from petfinder_database_distributor_spark.schema import load_table
    from petfinder_database_distributor_spark.sources.snapshot import (
        latest_group,
        snapshot_read,
        snapshot_read_group,
        snapshot_write,
    )
    from petfinder_database_distributor_spark.streaming.incremental import (
        SCRATCH_ROOT,
    )

    root = f"{SCRATCH_ROOT}/knn_retrain_test"
    shutil.rmtree(root, ignore_errors=True)
    base = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    n_base = base.count()
    corpus = (
        base.crossJoin(spark.range(27).select(F.col("id").alias("r")))
        .select(
            (F.col("vec_id") + F.col("r") * n_base).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    centroids, cb, codes = ivf_pq_train(corpus)
    for name, df in (("centroids", centroids), ("codebook", cb), ("codes", codes)):
        snapshot_write(spark, f"{root}/{name}", df)

    members0 = (
        snapshot_read(spark, f"{root}/codes", version=0)
        .select("vec_id", "centroid_id")
        .join(corpus, "vec_id")
    )
    with pytest.raises(ValueError, match="n_clusters"):
        knn_graph_decisions(members0)

    versions = ann_index_retrain(spark, root, corpus, n_clusters=128)
    assert versions["codes"] == 1
    codes1 = snapshot_read_group(spark, root, "codes", group=latest_group(root))
    members1 = codes1.select("vec_id", "centroid_id").join(corpus, "vec_id")
    top1 = {
        r["vec_id"]: (r["nbr_id"], r["cos_r"])
        for r in knn_graph_decisions(members1).collect()
        if r["rank"] == 1
    }
    # every replica has 26 identical twins in its cell (identical vectors
    # encode identically, so twins share a cell): nearest neighbor is the
    # LOWEST-id other twin at cosine exactly 1
    misses = 0
    for vid, (nbr, cos_r) in top1.items():
        base_id = vid % n_base
        expect = base_id if vid != base_id else base_id + n_base
        if nbr != expect or cos_r != 1.0:
            misses += 1
    assert misses == 0, f"{misses} replicas missed their identical twin"
    assert len(top1) == 27 * n_base


def test_knn_zero_norm_vectors_excluded_not_crashing(spark):
    """Zero-norm contract: under Spark 4.x default ANSI mode, cosine's
    division RAISES on a zero-norm vector — one dirty row would kill a
    100 TB job. The decisions helper must exclude zero vectors at entry
    (like NULL vectors) and still rank the live ones. (The identical fix
    is the planned r12 change for the registered vector family.)"""
    from petfinder_database_distributor_spark.plans.staged_r12 import (
        knn_graph_decisions,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.9, 0.1]),
        (3, 0, [0.0, 0.0]),  # zero-norm: excluded, must not raise
        (4, 1, [0.0, 1.0]),
    ]
    members = spark.createDataFrame(
        rows, "vec_id long, centroid_id int, embedding array<double>"
    )
    got = knn_graph_decisions(members, k=2)
    out = {(r["vec_id"], r["nbr_id"]) for r in got.collect()}
    assert out == {(1, 2), (2, 1)}, out  # cell 0 pair only; 3 gone, 4 alone


def test_gopher_rules_semantics(spark):
    """Hand-computed rule checks on real rows: a doc under 50 words fails
    r_wordcount; keep == AND of the seven flags everywhere."""
    fn, _oracle, _ = STAGED["text_gopher_rules"]
    rows = fn(spark, SF_SMALL).collect()
    assert rows
    seen_short = seen_keep = False
    for r in rows:
        flags = [
            r["r_wordcount"],
            r["r_meanwordlen"],
            r["r_symbol"],
            r["r_bullet"],
            r["r_ellipsis"],
            r["r_alpha"],
            r["r_stopwords"],
        ]
        assert r["keep"] == all(flags)
        if r["n_words"] < 50:
            assert not r["r_wordcount"]
            seen_short = True
        if r["keep"]:
            seen_keep = True
    assert seen_short, "fixture should contain sub-50-word docs"
    # the rule set must be discriminative on the fixture, not all-pass/all-fail
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows) or seen_keep
