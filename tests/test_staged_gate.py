"""STAGE-PROMOTION GATE (round 13, r12 verdict #4).

Round 12's ad-hoc degenerate probes (empty corpus, one-row corpus,
dirty rows) caught TEN real latent bugs across staged and registered
queries. This gate makes those probes a PRECONDITION of promotion: every
query in every ``plans/staged_r*.py`` manifest — discovered
automatically, so a new staging module is swept with zero test edits —
must hold full cross-engine hash parity on all four degenerate fixtures
BEFORE it can register:

  * empty    — zero rows in every table (an empty date partition is a
               normal 100 TB input, not an error),
  * one-row  — LIMIT 1 of every table (zero-variance moments, one-chunk
               watermarks, single-seed models),
  * dirty    — the r12 dirt classes + the r13 in-envelope huge measures,
  * all-empty-text — token mass is zero while the corpus is not (the
               r12-advice wsum=0 divisor class).

The gate keeps running after promotion (manifests are permanent), so a
regression in a promoted query's degenerate behavior is also caught.
"""

from __future__ import annotations

import importlib
import pkgutil

import pytest

from tests.oracle_compare import assert_parity, run_oracle

# r15 (driver pytest budget): heavy tail — degenerate-fixture sweep over every staged query (~85 s);
# excluded from the default fast set, run with -m slow.
pytestmark = pytest.mark.slow



def _staged_manifests() -> dict[str, tuple]:
    """Union of every plans.staged_r* module's STAGED dict (name ->
    (fn, oracle, doc)). Discovery is automatic: staging a new round's
    tranche under the same naming convention enrolls it in this gate."""
    import petfinder_database_distributor_spark.plans as plans_pkg

    merged: dict[str, tuple] = {}
    for mod in pkgutil.iter_modules(plans_pkg.__path__):
        if not mod.name.startswith("staged_r"):
            continue
        m = importlib.import_module(
            f"petfinder_database_distributor_spark.plans.{mod.name}"
        )
        staged = getattr(m, "STAGED", None)
        assert isinstance(staged, dict) and staged, (
            f"{mod.name}: staged modules must export a non-empty STAGED manifest"
        )
        for name, triple in staged.items():
            assert name not in merged, f"duplicate staged name {name}"
            merged[name] = triple
    return merged


_MANIFESTS = _staged_manifests()


@pytest.fixture(scope="module")
def gate_fixtures(tmp_path_factory):
    from tests.degenerate_fixtures import (
        build_all_empty_text_fixture,
        build_dirty_fixture,
        build_one_row_fixture,
    )
    from tools.empty_probe import build_empty_fixture

    return {
        "empty": build_empty_fixture(),
        "one_row": build_one_row_fixture(str(tmp_path_factory.mktemp("gate1r"))),
        "dirty": build_dirty_fixture(str(tmp_path_factory.mktemp("gatedirty"))),
        "all_empty_text": build_all_empty_text_fixture(
            str(tmp_path_factory.mktemp("gateempties"))
        ),
    }


@pytest.mark.parametrize("shape", ["empty", "one_row", "dirty", "all_empty_text"])
@pytest.mark.parametrize("name", sorted(_MANIFESTS))
def test_staged_query_degenerate_parity(spark, gate_fixtures, name, shape):
    """Neither engine may crash, and results (usually empty) must still
    hash-match — the registration bar applied to the degenerate shapes."""
    fn, oracle, _doc = _MANIFESTS[name]
    sf_dir = gate_fixtures[shape]
    assert_parity(fn(spark, sf_dir), run_oracle(oracle, sf_dir), f"{name}[{shape}]")


def test_every_staged_query_is_oracle_complete():
    """A staged triple missing its oracle or doc cannot promote."""
    for name, (fn, oracle, doc) in _MANIFESTS.items():
        assert callable(fn), name
        assert isinstance(oracle, str) and "SELECT" in oracle.upper(), name
        assert doc and len(doc) > 100, f"{name}: registration-grade doc required"
