#!/usr/bin/env python3
"""Substring-span dedup scaling probe: run the substring_dedup_spans
census (positional 5-gram digests → shared-gram set → per-doc interval
union) on 1x/5x/10x id-shifted unions of the sf0.1 `documents` fixture,
in BOTH probe modes — broadcast shared-gram set vs the gram-space
partitioned (ShuffledHashJoin) fallback.

Cloning the corpus k× makes EVERY doc an exact duplicate of its k−1
siblings, so the shared-gram set saturates to (almost) the entire gram
vocabulary — the worst case for the broadcast probe.  The laws to
measure:

- the gram census is one pass (wall grows ~linearly in k: k× the grams
  digested, k× the occurrence rows probing the shared set);
- the SHARED-GRAM SET stays bounded by the distinct-gram vocabulary
  (identical at every k — cloning adds no new grams), so the broadcast
  side does NOT grow with corpus size;
- per-doc interval-union work rides the doc_id partitioning (k× docs,
  same per-doc cost);
- CROSSOVER (VERDICT r10 item 4): at fixture scale the broadcast probe
  should win (the shared set is vocabulary-bounded and small); the
  shuffle fallback pays one extra gram-keyed exchange of 8-byte (h, p)
  pairs.  The fallback exists for when duplicated mass outgrows the
  broadcast ceiling (boilerplate-heavy corpora at 100 TB, where the
  vocabulary itself is tens of GB); this probe records the fixture-side
  cost of that insurance so SCALE.md states a MEASURED delta, not a
  guess.

Unlike the pair-generating near-dup plans (tools/dedup_probe.py, where
output grows ~k²), span scoring emits ONE row per doc — output grows
linearly, and so should wall.  Evidence for SCALE.md's substring-dedup
section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F

from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from cybersecurity_ioc_etl_spark.operators.dedup import (
        _SPAN_K,
        span_positional_census,
    )

    d0 = load_table(spark, SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    def run(dd, broadcast_shared: bool):
        tk = dd.select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
        ).filter(F.size("tk") >= _SPAN_K)
        base = tk.select("doc_id", F.size("tk").alias("n_tokens"))
        dup = span_positional_census(tk, broadcast_shared)
        lagw = Window.partitionBy("doc_id").orderBy("p")
        isl = (
            dup.withColumn("lp", F.lag("p").over(lagw))
            .groupBy("doc_id")
            .agg(F.count("*").alias("g"))
        )
        return base.join(isl, "doc_id", "left")

    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(
                d0.withColumn("doc_id", F.col("doc_id") + i * shift)
            )
        d = d.localCheckpoint(eager=True)
        walls = {}
        n = None
        for mode, bc in (("broadcast", True), ("shuffle", False)):
            out = run(d, bc)
            out.count()  # warm
            best = 9e9
            for _ in range(2):
                t0 = time.perf_counter()
                n = out.count()
                best = min(best, time.perf_counter() - t0)
            walls[mode] = best
        tk = d.select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
        ).filter(F.size("tk") >= _SPAN_K)
        nsh = (
            span_positional_census(tk, True)
            .select("doc_id")  # any column; census row count proxy below
            .count()
        )
        print(
            f"k={k}: docs={d.count():,} out_rows={n:,}"
            f" dup_positions={nsh:,}"
            f" wall_broadcast={walls['broadcast']:.2f}s"
            f" wall_shuffle={walls['shuffle']:.2f}s"
            f" shuffle/broadcast={walls['shuffle'] / walls['broadcast']:.2f}x"
        )
        d.unpersist(True)  # the skew_probe lesson: drop before next k
    spark.stop()


if __name__ == "__main__":
    main()
