#!/usr/bin/env python3
"""AQE skew-JOIN probe: clone ONE hot orderkey's lineitem rows k× on top
of the sf0.1 fixture and time the forced-SMJ lineitem⋈orders fact join
with AQE skew-join splitting ON vs OFF.

The keeper-election probe (tools/skew_probe.py) covers aggregation skew
(salting); this one covers JOIN skew — the other half of the story.  With
splitting OFF the hot key's entire shuffle partition is ONE reducer task
(wall grows linearly in k on a single core); with splitting ON, AQE
rewrites the running plan to `SortMergeJoin(skew=true)` and divides the
hot partition among many tasks, each joining its slice against a
replicated copy of the matching right-side partition — legal because a
join row depends only on its own key, unlike an aggregation, so no
salting of the OTHER side is needed.

Both modes are asserted to produce the identical aggregate over the join.
Skew thresholds are scaled to fixture size exactly as tests/test_skew.py
does, so the optimizer faces the production RATIOS.  Evidence for
SCALE.md §Joins."""

from __future__ import annotations

import contextlib
import io
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
}


def _joined(li, orders):
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum("price_i").alias("s"),
        )
    )


def main() -> None:
    spark = get_spark("skew-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in _CONFS.items():
        spark.conf.set(k, v)

    li0 = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_i"),
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).localCheckpoint(eager=True)
    hot = li0.agg(F.min("l_orderkey")).collect()[0][0]

    for k in (0, 2_000_000, 8_000_000):
        if k:
            clones = spark.range(k).select(
                F.lit(hot).cast("bigint").alias("l_orderkey"),
                (F.col("id") % 10_000).alias("price_i"),
            )
            li = li0.unionByName(clones)
        else:
            li = li0
        li = li.localCheckpoint(eager=True)
        walls, results, plans = {}, {}, {}
        for mode, flag in (("split_on", "true"), ("split_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
            df = _joined(li, orders)
            df.collect()  # warm + let AQE materialize the final plan
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plans[mode] = "skew=true" in buf.getvalue()
            reps = []
            for _ in range(3):
                d2 = _joined(li, orders)
                t0 = time.perf_counter()
                rows = d2.collect()
                reps.append(time.perf_counter() - t0)
            walls[mode] = sorted(reps)[1]
            results[mode] = sorted(map(tuple, rows))
        assert results["split_on"] == results["split_off"]
        if k:
            assert plans["split_on"] and not plans["split_off"], plans
        li.unpersist(blocking=True)
        print(
            f"hot_copies={k:>9,}: split_on={walls['split_on']:.2f}s "
            f"(skew=true: {plans['split_on']}) "
            f"split_off={walls['split_off']:.2f}s "
            f"ratio={walls['split_off'] / walls['split_on']:.2f}x "
            "(identical result: yes)"
        )


if __name__ == "__main__":
    main()
