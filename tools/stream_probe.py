#!/usr/bin/env python3
"""Streaming throughput probe: drain the sf0.1 events fixture through
the real Structured Streaming tumbling-window pipeline
(streaming/pipeline.py::run_hourly_counts_stream) and report events/s.

Context for BASELINE.md: the reference's streaming path processes one
tweet per callback on one thread, blocking on a synchronous HTTP POST
per IOC (firehose.py:19,131-133) — throughput is network-bound at a few
records/s.  The engine's micro-batch path is executor-parallel with
batched sinks; this probe records the single-node number.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.streaming.pipeline import run_hourly_counts_stream

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # warm plan/codegen at the small SF
    run_hourly_counts_stream(spark, "/root/testdata/sf0.001").count()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rows = run_hourly_counts_stream(spark, SF_DIR).count()
        best = min(best, time.perf_counter() - t0)
    print(f"events={n_events:,} wall={best:.2f}s rows={rows} "
          f"throughput={n_events/best/1e3:.0f}K events/s")
    spark.stop()


if __name__ == "__main__":
    main()
