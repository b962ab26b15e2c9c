#!/usr/bin/env python3
"""Louvain level-1 CONVERGENCE probe (the tools/truss_probe.py pattern):
run the semi-synchronous greedy half-step loop to fixpoint — a full
parity PAIR (even half-step + odd half-step) with zero positive-gain
moves — on each fixture, printing moves per half-step and the
half-step count at convergence.  Sizes the bounded unroll (and the
MATERIALIZED-CTE oracle depth) for trade_louvain_converged_level: if a
future fixture moves past the unrolled depth, this probe flags it and
the query grows a round.

Usage: python tools/louvain_probe.py [sf_dirs...] [--max-pairs 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cybersecurity_ioc_etl_spark.session import get_spark  # noqa: E402
from cybersecurity_ioc_etl_spark.operators.graph import (  # noqa: E402
    _louvain_half,
    _qnum,
    _trade_edges,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "sf_dirs",
        nargs="*",
        default=[
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
    )
    ap.add_argument("--max-pairs", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("louvain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in args.sf_dirs:
        e0 = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
        ue = (
            e0.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .union(e0.select(F.col("dst").alias("a"), F.col("src").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        lab = (
            ue.select(F.col("a").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        deg = (
            ue.groupBy(F.col("a").alias("id"))
            .agg(F.count("*").alias("k"))
            .localCheckpoint(eager=True)
        )
        two_m = ue.agg(F.count("*").alias("two_m"))
        moves = []
        for pair in range(args.max_pairs):
            # flatten lineage by rebuilding labels from collected rows
            # each pair (node-cardinality on the trade quarter graph) —
            # accumulating localCheckpoints per iteration is the
            # tools/skew_probe GC trap, and unpersisting them breaks
            # truncated lineage; a driver round-trip of a tiny label
            # table is the clean reset
            lab = spark.createDataFrame(
                [(r["id"], r["lbl"]) for r in lab.collect()],
                "id bigint, lbl bigint",
            )
            lab, mv0 = _louvain_half(ue, deg, two_m, lab, 0)
            n0 = mv0.count()
            lab, mv1 = _louvain_half(ue, deg, two_m, lab, 1)
            n1 = mv1.count()
            moves.append((n0, n1))
            print(f"  pair {pair}: moves {n0}/{n1}", flush=True)
            if n0 == 0 and n1 == 0:
                break
        q = _qnum(ue, deg, lab).crossJoin(F.broadcast(two_m)).collect()[0]
        qv = (q["intra2"] * q["two_m"] - q["sum_d2"]) / (
            q["two_m"] ** 2
        )
        converged = moves and moves[-1] == (0, 0)
        print(
            f"{sf_dir}: half-step moves per pair {moves} — "
            f"{'FIXPOINT' if converged else 'NOT CONVERGED'} at pair "
            f"{len(moves)}; ncomm={q['ncomm']} Q={qv:.4f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
