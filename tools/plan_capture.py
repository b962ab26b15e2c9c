#!/usr/bin/env python3
"""Capture ``explain("formatted")`` for named queries into text files
(the r14 optimization-round receipts: plans/r14/<query>_{before,after}.txt).

Usage:
    python tools/plan_capture.py --out plans/r14 --suffix before q1 q2 ...

AQE note (CLAUDE.md gotcha): the formatted explain BEFORE execution
shows the initial plan (isFinalPlan=false) without codegen ids; that is
fine for the structural receipts (Exchange count, join strategy,
PushedFilters, Python-eval nodes) the optimization round documents.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cybersecurity_ioc_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in args.names:
        df = queries[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# wrote {path} ({len(txt.splitlines())} lines)", file=sys.stderr)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
