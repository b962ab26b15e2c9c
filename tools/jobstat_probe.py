#!/usr/bin/env python3
"""Job/stage/task census per query (optimization guide §1: decide
whether a row's wall time is data work or scheduling machinery before
touching the plan).

At fixture scale most headline rows are seconds of SMALL jobs — eager
localCheckpoints per iteration, per-round unions, mid-plan scalar
actions — so the first diagnostic is not the plan shape but the JOB
COUNT.  This probe runs a named query once (after the bench's sf0.001
warmup) and reports wall seconds, number of Spark jobs, stages, tasks,
and summed executor task time, read from the local UI's REST API
(/api/v1/applications/<id>/jobs) — the same numbers the Stages tab
shows, no listener plumbing.

Usage:
    python tools/jobstat_probe.py q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cybersecurity_ioc_etl_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/{path}"
    ) as r:
        return json.loads(r.read())


def _drop_checkpoints(spark) -> None:
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("jobstat-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out = {}
    for name in args.names:
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.001").count()  # warm codegen/JIT
        _drop_checkpoints(spark)
        jobs_before = {j["jobId"] for j in _rest(spark, "jobs")}
        t0 = time.perf_counter()
        fn(spark, args.sf).count()
        wall = time.perf_counter() - t0
        jobs = [
            j
            for j in _rest(spark, "jobs")
            if j["jobId"] not in jobs_before
        ]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        n_tasks = sum(j["numCompletedTasks"] for j in jobs)
        out[name] = {
            "wall_s": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
        _drop_checkpoints(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
