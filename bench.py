"""Benchmark harness (driver-run per round → BENCH_r{N}.json).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line. Results are forced with a count-style action (``noop`` write) so we
measure distributed compute, not driver-side row transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Headline set: flagship pipeline + relational + north-star representatives
# (one per family: fuzzy dedup, sketch, clustering) so the driver-archived
# compact line tracks the LLM-ops families round-over-round, not just the
# reference queries.
HEADLINE = [
    "flagship_distributor_pipeline",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "w1_topk_per_group",
    "w2_running_totals",
    "g1_rollup_revenue",
    "j1_semi_anti_join",
    "ref_key_dedup",
    "ref_upsert_merge",
    "ref_compaction",
    "dedup_minhash_lsh",
    "sketch_hll_distinct_users",
    "cluster_kmeans_int8",
]


def run_queries(
    spark, specs, names: list[str], sf_dir: str, passes: int = 2
) -> tuple[dict[str, float | None], dict[str, str]]:
    """Best-of-N timing loop with per-query fault isolation (round-3
    post-mortem: one AnalysisException aborted the whole run and the round
    lost its bench artifact entirely). A failing query records null + a
    one-line error; the loop always completes, and failures cost the run
    nothing but their own slot. Unit-tested in tests/test_bench_harness.py."""
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for _pass in range(passes):
        for name in names:
            if name in errors:  # failed in an earlier pass — skip the retry
                continue
            t0 = time.perf_counter()
            try:
                df = specs[name].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception as exc:  # noqa: BLE001 — isolate, record, continue
                if timings.get(name) is None:  # keep an earlier success if any
                    timings[name] = None
                errors[name] = f"{type(exc).__name__}: {exc}".split("\n")[0][:200]
                continue
            # 2 decimals keeps the single JSON line compact — the driver's
            # capture truncated the r1 tail at 4-decimal precision.
            elapsed = round(time.perf_counter() - t0, 2)
            prev = timings.get(name)
            timings[name] = elapsed if prev is None else min(prev, elapsed)
    return timings, errors


def compact_summary(
    timings: dict[str, float | None],
    errors: dict[str, str],
    total: float,
    sf,
    max_bytes: int = 1800,
    calibration: dict | None = None,
) -> str:
    """One compact JSON line (< ``max_bytes``) printed AFTER the full record:
    total + the headline set + the top-15 slowest queries + error count.

    Why: the driver archives only the final 2000 characters of stdout, and
    the full per-query dict is ~3 KB — four rounds of BENCH_r0N.json carry
    ``parsed: null`` with the front of the record truncated away (round-4
    verdict #1). The trailing compact line always fits the tail capture
    whole, so the archived artifact parses and keeps the numbers that
    matter. Guaranteed under budget: if the line would exceed ``max_bytes``
    the top-15 block is shed first, then the headline block (never reached
    in practice — both blocks together are ~1 KB)."""
    top15 = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t is not None),
            key=lambda kv: -kv[1],
        )[:15]
    )
    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "headline": {n: timings.get(n) for n in HEADLINE if n in timings},
        "top15": top15,
    }
    if calibration:
        out["calibration"] = calibration
    line = json.dumps(out)
    for shed in ("top15", "headline"):
        if len(line) <= max_bytes:
            break
        out.pop(shed)
        line = json.dumps(out)
    return line


def calibration(spark) -> dict:
    """Machine-load calibration recorded with every run (round-7 verdict
    #3: the r7 driver bench read 3.2x an idle re-run of identical code and
    nothing in the artifact could prove it was load, not regression).

    ``floor_sec`` is the best-of-3 wall of a fixed reference job
    (``spark.range(10**7).count()`` — pure JVM, no I/O, no Python), i.e.
    the per-job floor THIS machine sustains RIGHT NOW; ``loadavg`` is the
    OS 1/5/15-minute run queue. To compare two rounds, normalize totals by
    the floor ratio (or just reject a comparison whose floors differ >2x).
    """
    floor = min(
        _time_once(lambda: spark.range(10**7).count()) for _ in range(3)
    )
    return {
        "floor_sec": round(floor, 3),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }


def _time_once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def write_self_record(out: dict, path: str | None = None) -> str | None:
    """Write the FULL per-query record to a file (r15, r14 verdict #2b):
    the driver archives only the last 2000 chars of stdout, so the
    216-entry map never survived its capture and PERF's per_query
    round-over-round table came back empty two rounds running. Called
    after both stdout prints — additions only, nothing in the timed path
    changes. Default target is ``BENCH_SELF.json`` in the repo root
    (override with ``$SPARK_GRAFT_BENCH_SELF``); a read-only checkout
    degrades to the stdout record (returns None)."""
    self_path = path or os.environ.get(
        "SPARK_GRAFT_BENCH_SELF", os.path.join(REPO_ROOT, "BENCH_SELF.json")
    )
    try:
        with open(self_path, "w") as fh:
            json.dump(out, fh)
            fh.write("\n")
    except OSError:
        return None
    return self_path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from petfinder_database_distributor_spark.registry import load_all
    from petfinder_database_distributor_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="pdd_spark_bench")

    # Warm the JVM/codegen once with a trivial job so q1 doesn't pay startup,
    # and spawn the Python UDF workers (~4s, once per session) so the first
    # pandas-UDF query measures its work, not worker startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    # no annotations: `from __future__ import annotations` stringifies them
    # and pandas_udf's signature inference rejects unresolvable strings
    def _identity(s):
        return s

    _warm = pandas_udf(_identity, "long")
    spark.range(32).select(_warm("id")).collect()

    names = [n for n in HEADLINE if n in specs] + [
        n for n in sorted(specs) if n not in HEADLINE
    ]
    # Best-of-2: two full passes over the list, report the per-query MIN.
    # Round-2 driver numbers carried 1.3-4.9x transient-load noise (judge
    # re-measurement adjudicated every apparent regression as load); one
    # loaded moment can no longer manufacture a regression, while a real
    # slowdown still shows in both passes. Pass 2 is also the honest
    # steady-state number: plan compilation (Catalyst analysis + codegen)
    # is measured cold in pass 1 and cached after.
    cal = calibration(spark)
    timings, errors = run_queries(spark, specs, names, sf_dir)
    total = round(sum(t for t in timings.values() if t is not None), 4)
    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration": cal,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # Trailing compact record — the driver's 2000-char tail capture always
    # contains this line whole (the full line above is ~3 KB and truncates).
    print(compact_summary(timings, errors, total, out["sf"], calibration=cal))
    write_self_record(out)


if __name__ == "__main__":
    main()
