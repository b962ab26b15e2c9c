#!/usr/bin/env python3
"""Repeated-measurement adjudication probe (BASELINE.md §Canary rule,
case 3): when a quiet-canary bench run still puts a row over the 2x
floor gate, the row is a real-anomaly CANDIDATE — this tool runs the
10-trial isolated-session protocol that adjudicates it.

Usage:
    python tools/adjudicate_probe.py q1 q2 ... [--trials 10] [--sf DIR]

Include sibling-plan controls in the list (a same-family query whose
floor is trusted): if the target AND its control elevate together the
session is offset; if the target elevates alone the plan regressed.

Per query: warm the plan at sf0.001 (codegen/JIT), then N trials at the
target SF with persisted-RDD cleanup between trials (the bench.py
checkpoint-GC discipline).  Canary probes (pure-JVM codegen sum, no IO)
run first and last so the session's own noise level is on the record.
Output: one line per query with min/median/max + min/floor ratio, and
one JSON summary line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cybersecurity_ioc_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("ioc-etl-adjudicate")
    spark.sparkContext.setLogLevel("WARN")
    queries = entrymod.queries()
    floors_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOORS.json",
    )
    floors = json.load(open(floors_path)) if os.path.exists(floors_path) else {}

    def _canary() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(1 << 26).selectExpr("sum(id % 7) AS s").count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    def _drop_checkpoints() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    for name in args.names:
        queries[name](spark, "/root/testdata/sf0.001").count()

    c_first = _canary()
    ref = floors.get("__canary__")
    print(
        f"# canary first: {c_first:.4f}s"
        + (f" ({c_first / ref:.2f}x ref)" if ref else ""),
        file=sys.stderr,
    )

    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries[name]
        trials: list[float] = []
        for _ in range(args.trials):
            _drop_checkpoints()
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            trials.append(round(time.perf_counter() - t0, 4))
        floor = floors.get(name)
        rec = {
            "min": min(trials),
            "median": round(statistics.median(trials), 4),
            "max": max(trials),
            "floor": floor,
            "min_vs_floor": round(min(trials) / floor, 2) if floor else None,
        }
        out[name] = rec
        print(
            f"# {name}: min {rec['min']:.3f} / med {rec['median']:.3f}"
            f" / max {rec['max']:.3f}"
            + (f"  ({rec['min_vs_floor']}x floor {floor})" if floor else ""),
            file=sys.stderr,
        )

    c_last = _canary()
    print(
        f"# canary last: {c_last:.4f}s"
        + (f" ({c_last / ref:.2f}x ref)" if ref else ""),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "canary": {"first": c_first, "last": c_last},
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
