#!/usr/bin/env python3
"""Join/agg scaling probe: run the Q5-shaped 5-way join (the engine's
shuffle-heaviest relational plan) against 1x/5x/10x synthetic scale-ups
of the sf0.1 fixtures (key-shifted unions — same data distribution,
k-times the join and shuffle volume) and print wall times.

Evidence for BASELINE.md's scaling section: the plan holds sub-linear
wall growth because the single big shuffle (lineitem⋈orders on
l_orderkey) and the map-side partial agg amortize fixed cost across
cores — the same property that holds on a real cluster.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F

from cybersecurity_ioc_etl_spark.operators.relational import isum, mi
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def scaled(df: DataFrame, key_cols: list[str], shift: int, k: int) -> DataFrame:
    out = df
    for i in range(1, k):
        part = df
        for c in key_cols:
            part = part.withColumn(c, F.col(c) + i * shift)
        out = out.unionByName(part)
    return out


def q5(l: DataFrame, o: DataFrame, c: DataFrame, n: DataFrame, r: DataFrame) -> DataFrame:
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    rev = mi(F.col("l_extendedprice")) * (10000 - mi(F.col("l_discount")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", rev.alias("rev_raw"))
        .withColumn("rev_m", F.expr("rev_raw div 100"))
        .groupBy("r_name", "n_name")
        .agg((isum(F.col("rev_m")) / 1e6).alias("revenue"))
    )


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    l0 = load_table(spark, SF_DIR, "lineitem")
    o0 = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    r = load_table(spark, SF_DIR, "region")
    shift = (o0.agg(F.max("o_orderkey")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        l = scaled(l0, ["l_orderkey"], shift, k)
        o = scaled(o0, ["o_orderkey"], shift, k)
        q5(l, o, c, n, r).count()  # warm the plan shape
        best, rows = 9e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = q5(l, o, c, n, r).count()
            best = min(best, time.perf_counter() - t0)
        ln = l.count()
        print(f"k={k}: lineitem={ln:,} wall={best:.2f}s rows={rows} "
              f"throughput={ln/best/1e6:.1f}M lines/s")
    spark.stop()


if __name__ == "__main__":
    main()
