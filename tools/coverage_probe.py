#!/usr/bin/env python3
"""Greedy-coverage scaling probe: run the 3-round submodular selection
loop (anti-join gain census + broadcast TakeOrdered winner) on 1x/4x/8x
synthetic scale-ups of the sf0.1 `documents` fixture (id-shifted
unions — same text distribution, k-times the incidence).

The point to measure: each round is one linear pass over the
(doc, bigram) incidence — wall should grow ~linearly with the corpus
and stay flat per round, because the covered set grows by ONE
document's bigrams per round (a broadcast key list), never by a
corpus-sized structure.  Evidence for SCALE.md's curation section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("coverage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True)
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    for k in (1, 4, 8):
        d = d0
        for i in range(1, k):
            d = d.unionByName(
                d0.withColumn("doc_id", F.col("doc_id") + i * shift)
            )
        # run the same loop body the registered query uses, against the
        # scaled frame (the query reads from sf_dir, so inline the loop
        # with the scaled incidence instead)
        from cybersecurity_ioc_etl_spark.operators.text_queries import tokens

        toks = tokens(F.col("text"))
        n = F.size(toks)
        bigrams = F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"),
        )
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            big = (
                d.select("doc_id", F.explode(bigrams).alias("b"))
                .select(
                    "doc_id",
                    F.concat_ws(" ", F.col("b.w1"), F.col("b.w2")).alias("bg"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            covered = None
            picked = None
            rows = []
            for r in (1, 2, 3):
                cand = big
                if covered is not None:
                    cand = cand.join(covered, "bg", "left_anti").join(
                        F.broadcast(picked), "doc_id", "left_anti"
                    )
                marg = cand.groupBy("doc_id").agg(F.count("*").alias("g"))
                winner = (
                    marg.orderBy(F.desc("g"), "doc_id")
                    .limit(1)
                    .localCheckpoint(eager=True)
                )
                wdoc = winner.select("doc_id")
                newly = big.join(F.broadcast(wdoc), "doc_id", "semi").select(
                    "bg"
                )
                covered = (
                    newly
                    if covered is None
                    else covered.unionByName(newly).distinct()
                ).localCheckpoint(eager=True)
                picked = (
                    wdoc if picked is None else picked.unionByName(wdoc)
                ).localCheckpoint(eager=True)
                rows.append(winner.collect()[0])
            big.unpersist(blocking=True)
            best = min(best, time.perf_counter() - t0)
        nd = d.count()
        print(
            f"k={k}: docs={nd:,} wall={best:.2f}s "
            f"gains={[r['g'] for r in rows]}"
        )


if __name__ == "__main__":
    main()
