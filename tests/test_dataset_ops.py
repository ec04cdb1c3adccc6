"""Dataset-assembly ops (plans/dataset_ops.py): the global shuffle index
must be a dense permutation produced by the scalable two-phase plan, CDC
must classify all three change types, weighted sampling must be a pure
narrow filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from petfinder_database_distributor_spark.registry import load_all
from tests.conftest import SF_ORACLE, SF_SMALL
from tests.test_plan_quality import plan_of

SPECS = load_all()


def test_shuffle_index_is_dense_permutation(spark):
    df = SPECS["global_shuffle_index"].fn(spark, SF_SMALL)
    n = df.count()
    stats = df.agg(
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
        F.count_distinct("shuffle_pos").alias("nd"),
    ).first()
    assert (stats.lo, stats.hi, stats.nd) == (0, n - 1, n), "positions must be 0..n-1 dense"


def test_shuffle_index_deterministic_across_layouts(spark):
    """The permutation must not depend on the physical partitioning of the
    input: a pre-shuffled input yields the identical doc_id→pos map.
    Both sides run the SAME shuffle_index() plan — only the input layout
    differs — so a plan retune can't silently diverge from this test."""
    from petfinder_database_distributor_spark.plans.dataset_ops import shuffle_index
    from petfinder_database_distributor_spark.schema import load_table

    base = {
        r.doc_id: r.shuffle_pos
        for r in SPECS["global_shuffle_index"].fn(spark, SF_SMALL).collect()
    }
    docs = (
        load_table(spark, SF_SMALL, "documents")
        .filter(F.col("doc_id").isNotNull())
        .repartition(7, "lang")  # adversarial starting layout
    )
    other = {r.doc_id: r.shuffle_pos for r in shuffle_index(docs).collect()}
    assert base == other


def test_shuffle_index_plan_two_phase(spark):
    """The data-sized path must go through range partitioning + a
    pid-partitioned window — never a global-ORDER-BY window (which would
    be an Exchange SinglePartition carrying every row)."""
    import io
    from contextlib import redirect_stdout

    from petfinder_database_distributor_spark.plans.dataset_ops import shuffle_layout
    from petfinder_database_distributor_spark.schema import load_table

    # Phase 1 on the un-checkpointed layout builder (the checkpoint inside
    # shuffle_index truncates the range exchange out of explain output).
    docs = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id").isNotNull())
    buf = io.StringIO()
    with redirect_stdout(buf):
        shuffle_layout(docs).explain("formatted")
    assert "rangepartitioning" in buf.getvalue().lower(), (
        "phase 1 must range-partition by the hash key"
    )
    p = plan_of(spark, "global_shuffle_index")
    assert "hashpartitioning(pid" in p, "the rank window must partition by pid"


def test_cdc_covers_all_three_change_types(spark):
    counts = {
        r.change_type: r.n
        for r in SPECS["cdc_snapshot_diff"]
        .fn(spark, SF_ORACLE)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"insert", "update", "delete"}, counts
    assert all(v > 0 for v in counts.values())


def test_weighted_sample_no_shuffle(spark):
    p = plan_of(spark, "sample_weighted")
    assert "Exchange" not in p, "weighted sampling must be a narrow filter"
