"""Scaling probe for STAGED queries (plans/staged_r13.py by default; pass
--r12 to probe the promoted r12 tranche via its manifest) —
same protocol as tools/scaling_probe.py (whose scaled-input staging and
calibration it reuses), but sourcing callables from STAGED instead of the
registry, since staged queries deliberately aren't registered yet.

Usage: python tools/staged_probe.py [factor] [name1,name2,...]

Caveat (shared with the SemDeDup probe): knn_graph_cells REFUSES past its
Sum(|cell|^2) = 10M pair budget — at 8x key-offset replicas of sf0.1's
2,000 embeddings that is 16k vectors / 16 cells = 16M pairs, so probe it
at 4x (8M pairs, inside budget) and treat the 8x refusal as the guard
working, not a failure.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from petfinder_database_distributor_spark.session import get_spark  # noqa: E402
from tools.scaling_probe import BASE_SF, _time_once, build_scaled  # noqa: E402

_mod = "staged_r14"  # default: the tranche currently being staged
for _a in list(sys.argv[1:]):
    if _a.startswith("--r") and _a[3:].isdigit():
        _mod = f"staged_r{_a[3:]}"
        sys.argv.remove(_a)
import importlib  # noqa: E402

STAGED = importlib.import_module(
    f"petfinder_database_distributor_spark.plans.{_mod}"
).STAGED


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(STAGED)
    spark = get_spark(app_name="staged_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = f"{REPO_ROOT}/.stream_scratch/scale_probe_x{factor}"
    build_scaled(spark, factor, out_dir)
    spark.range(1000).selectExpr("sum(id)").collect()
    floor = min(_time_once(lambda: spark.range(10**7).count()) for _ in range(3))
    print(
        '{"calibration": {"floor_sec": %.3f, "loadavg": [%s]}}'
        % (floor, ", ".join(f"{x:.2f}" for x in os.getloadavg())),
        flush=True,
    )
    print(f"{'query':28s} {'1x':>7s} {'%dx' % factor:>7s} {'growth':>7s}")
    for name in names:
        fn = STAGED[name][0]
        times, err = [], None
        for sf_dir in (BASE_SF, out_dir):
            best = float("inf")
            for _ in range(2):  # warm best-of-2: measure work, not codegen
                t0 = time.time()
                try:
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001 — isolate, keep probing
                    err = f"{type(exc).__name__}: {exc}".split("\n")[0][:160]
                    break
                best = min(best, time.time() - t0)
            if err is not None:
                break
            times.append(best)
        if err is not None:
            print(f"{name:28s} ERROR {err}", flush=True)
        else:
            print(
                f"{name:28s} {times[0]:6.2f}s {times[1]:6.2f}s "
                f"{times[1] / max(times[0], 1e-9):6.1f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
