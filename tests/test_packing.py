"""Greedy sequence-packing invariants (pack_sequences_greedy): beyond the
hash-parity gate, pin the properties a training pipeline actually relies
on — budget is respected, packs are contiguous id-runs, nothing is
dropped, and packing is greedy (a doc never starts a new pack when it
still fit the previous one)."""

from __future__ import annotations

from collections import defaultdict

from petfinder_database_distributor_spark.plans.llm_pipeline import (
    _PACK_BUDGET,
    pack_sequences_greedy,
)
from petfinder_database_distributor_spark.schema import load_table
from tests.conftest import SF_SMALL


def test_packing_invariants(spark):
    rows = pack_sequences_greedy(spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert len(rows) == n_docs, "every document must be packed exactly once"

    packs = defaultdict(list)
    for r in rows:
        packs[r["pack_id"]].append(r)
    for pid, members in packs.items():
        members.sort(key=lambda r: r["doc_id"])
        total = sum(r["tokens"] for r in members)
        # budget respected, except a single over-budget doc in its own pack
        assert total <= _PACK_BUDGET or len(members) == 1, (
            f"pack {pid} holds {total} tokens over budget with {len(members)} docs"
        )
        # one shard per pack
        assert len({r["shard"] for r in members}) == 1

    # contiguity + greediness: walk each shard in doc_id order
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r["doc_id"])
        prev_pack, cum = None, 0
        for r in members:
            if prev_pack is None:
                prev_pack, cum = r["pack_id"], r["tokens"]
                continue
            if r["pack_id"] == prev_pack:
                cum += r["tokens"]
                assert cum <= _PACK_BUDGET, "in-pack overflow"
            else:
                assert r["pack_id"] == prev_pack + 1, "packs must be consecutive"
                assert cum + r["tokens"] > _PACK_BUDGET, (
                    f"doc {r['doc_id']} started pack {r['pack_id']} while it"
                    f" still fit the previous pack ({cum} + {r['tokens']})"
                )
                prev_pack, cum = r["pack_id"], r["tokens"]
