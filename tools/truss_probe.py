#!/usr/bin/env python3
"""k-truss convergence probe (VERDICT r8 item 7): run the k=4 peeling
loop at sf0.001/0.01/0.1 until the edge set stops changing and report
rounds-to-fixpoint plus the per-round surviving-edge counts.

The receipt to pin for SCALE.md: trade_ktruss_edges unrolls TWO peeling
rounds (the oracle-checkable depth); this probe measures whether the
fixture graphs actually converge within those two rounds — i.e. whether
round 3 would peel any further edge.  If a fixture ever needs a third
round, the query (and its MATERIALIZED-CTE oracle) must grow one.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.graph import (
    _TRUSS_K,
    _trade_edges,
)
from cybersecurity_ioc_etl_spark.session import get_spark


def main() -> None:
    spark = get_spark("truss-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        e = _trade_edges(spark, sf_dir)
        edges = (
            e.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        def support(ed):
            ad = ed.select(
                F.col("a").alias("v"), F.col("b").alias("w")
            ).unionAll(ed.select(F.col("b").alias("v"), F.col("a").alias("w")))
            x, y = ad.alias("x"), ad.alias("y")
            return (
                ed.alias("e")
                .join(x, F.col("x.v") == F.col("e.a"))
                .join(
                    y,
                    (F.col("y.v") == F.col("e.b"))
                    & (F.col("y.w") == F.col("x.w")),
                )
                .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
                .agg(F.count("*").alias("s"))
            )

        counts = [edges.count()]
        rounds = 0
        while True:
            prev = edges
            edges = (
                support(edges)
                .filter(F.col("s") >= _TRUSS_K - 2)
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            n = edges.count()
            counts.append(n)
            rounds += 1
            if n == counts[-2]:
                # a round that removes nothing is the fixpoint (support
                # depends only on the edge set)
                break
            prev.unpersist(blocking=True)
            if rounds > 20:
                print(f"sf{sf}: NO FIXPOINT within 20 rounds: {counts}")
                break
        print(
            f"sf{sf}: rounds_to_fixpoint={rounds - 1} "
            f"(first no-op round: {rounds}); edges per round: {counts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
