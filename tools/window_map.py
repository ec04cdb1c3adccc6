"""Emit the machine-readable verification-window map (r14 verdict #7).

The driver oracle-checks only the FIRST 50 entries of ``queries()`` each
round (the "window"), and the window ROTATES round to round so every
registered query gets periodic driver attestation. That makes PERF's
``queries_dropped`` / ``queries_newly_passing`` lists look alarming to
anyone without the rotation context: a rotated-out name is still
registered, still benched, still green — it just isn't in this round's
window. This tool turns the rotation into data:

``WINDOW_MAP_r{N}.json``::

    {
      "round": N,
      "window": [...50 names in queries() order...],
      "registered": 216,
      "latest_driver_round": {name: newest round with a PASSING driver
                              CORRECTNESS row, or null if none yet},
      "histogram": {"r14": 50, "r13": 41, ..., "never": k}
    }

Usage: python tools/window_map.py [--round N] [--write]
(--write commits the file to the repo root; default prints to stdout).
Reads only the registry (no Spark session) and the committed
CORRECTNESS_r*.json artifacts.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def build_map(round_no: int) -> dict:
    from petfinder_database_distributor_spark.registry import load_all

    specs = load_all()
    names = list(specs)
    latest: dict[str, int | None] = {n: None for n in names}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if name not in latest or not isinstance(row, dict):
                continue
            passed = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if passed and (latest[name] is None or rnd > latest[name]):
                latest[name] = rnd
    hist: dict[str, int] = {}
    for rnd in latest.values():
        key = "never" if rnd is None else f"r{rnd}"
        hist[key] = hist.get(key, 0) + 1
    return {
        "round": round_no,
        "window": names[:50],
        "registered": len(names),
        "latest_driver_round": latest,
        "histogram": dict(
            sorted(hist.items(), key=lambda kv: (kv[0] == "never", kv[0]))
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=15)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    out = build_map(args.round)
    text = json.dumps(out, indent=1)
    if args.write:
        path = os.path.join(REPO_ROOT, f"WINDOW_MAP_r{args.round}.json")
        with open(path, "w") as fh:
            fh.write(text + "\n")
        print(path)
    else:
        print(text)


if __name__ == "__main__":
    main()
