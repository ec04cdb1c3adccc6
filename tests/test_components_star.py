"""Parity: small-star/large-star contraction vs the label-propagation
fixpoint (operators/dedup_fuzzy.py). Same (id, component) contract; the star
form is the O(log n)-round scale path, so it must agree exactly with the
proven implementation — on the real sf0.01 MinHash pair graph and on
adversarial topologies (deep chain, binary tree, many singleton pairs)
where propagation needs Θ(diameter) rounds and star needs Θ(log n).
"""

from __future__ import annotations

import pytest

from petfinder_database_distributor_spark.operators.dedup_fuzzy import (
    connected_components,
    connected_components_star,
    minhash_lsh_pairs,
)
from petfinder_database_distributor_spark.schema import load_table
from tests.conftest import SF_SMALL


def labels_of(df) -> dict[int, int]:
    rows = df.collect()
    out = {}
    for r in rows:
        assert r["id"] not in out, f"duplicate label row for node {r['id']}"
        out[r["id"]] = r["component"]
    return out


def test_star_matches_fixpoint_on_minhash_pairs(spark):
    docs = load_table(spark, f"{SF_SMALL}/../sf0.01", "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    pairs = pairs.localCheckpoint(eager=True)  # one LSH run, two consumers
    assert labels_of(connected_components_star(pairs)) == labels_of(
        connected_components(pairs)
    )


def test_star_long_chain(spark):
    # 0-1-2-...-199: diameter 199. Label propagation needs ~200 rounds (the
    # default max_iter=20 would NOT converge here); star needs ~log2(200)≈8.
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = labels_of(connected_components_star(pairs))
    assert got == {i: 0 for i in range(n)}


def test_star_binary_tree_and_reversed_ids(spark):
    # Perfect binary tree on REVERSED ids (root has the largest id) — the
    # component min (0) sits at a leaf, the worst case for min-propagation.
    depth = 7  # 255 nodes
    n = 2**depth - 1
    edges = [(n - 1 - (c - 1) // 2, n - 1 - c) for c in range(1, n)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = labels_of(connected_components_star(pairs))
    assert got == {i: 0 for i in range(n)}


def test_star_multiple_components_and_self_loops(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 10), (20, 20), (30, 31)],
        "id_a long, id_b long",
    )
    got = labels_of(connected_components_star(pairs))
    # (20,20) is a self-loop: node 20 has no real edge — the contract (like
    # the propagation form built from pair lists) labels only nodes with at
    # least one non-self pair... except self-loop-only nodes vanish.
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 30: 30, 31: 30}


def test_star_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(pairs).count() == 0


def test_star_raises_without_convergence(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        connected_components_star(pairs, max_iter=1)
