#!/usr/bin/env python3
"""Time-series detector scaling probe: run the hourly-ACF and CUSUM
plans against 1x/4x/8x synthetic scale-ups of the sf0.1 `events`
fixture, two ways:

- user-shifted clones (k× the EVENTS, same hour span): the census pass
  grows linearly, the post-census window stages see the SAME series
  length — wall should grow sub-linearly with events.
- ts-shifted clones (k× the HOURS, same per-hour density): the series
  itself grows — wall shows the window stages' linear dependence on
  series length.

Evidence for SCALE.md's time-series section: series length, not event
count, bounds everything after the census."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators import QUERIES
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("ts-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e0 = load_table(spark, SF_DIR, "events")
    span_days = 400  # ts shift per clone: disjoint hour ranges

    for mode in ("events", "hours"):
        for k in (1, 4, 8):
            d = e0
            for i in range(1, k):
                c = e0.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 10_000_000)
                )
                if mode == "events":
                    c = c.withColumn(
                        "user_id", F.col("user_id") + F.lit(i * 1_000_000)
                    )
                else:
                    c = c.withColumn(
                        "ts",
                        F.col("ts")
                        + F.expr(f"INTERVAL {i * span_days} DAYS"),
                    )
                d = d.unionByName(c)
            d = d.localCheckpoint(eager=True)
            view = d
            walls = {}
            for qname in ("event_hourly_autocorrelation", "events_cusum_alarms"):
                fn = QUERIES[qname]
                # drive the same plan body against the scaled frame
                import cybersecurity_ioc_etl_spark.sources.readers as R

                orig = R.load_table
                try:
                    R.load_table = lambda s, sd, t, **kw: (
                        view if t == "events" else orig(s, sd, t, **kw)
                    )
                    import cybersecurity_ioc_etl_spark.operators.events_queries as EQ

                    orig2 = EQ.load_table
                    EQ.load_table = R.load_table
                    fn(spark, SF_DIR).count()  # warm
                    best = 9e9
                    for _ in range(2):
                        t0 = time.perf_counter()
                        fn(spark, SF_DIR).count()
                        best = min(best, time.perf_counter() - t0)
                    walls[qname] = best
                finally:
                    R.load_table = orig
                    EQ.load_table = orig2
            n = d.count()
            print(
                f"mode={mode} k={k}: events={n:,} "
                f"acf={walls['event_hourly_autocorrelation']:.2f}s "
                f"cusum={walls['events_cusum_alarms']:.2f}s"
            )
            d.unpersist(blocking=True)


if __name__ == "__main__":
    main()
