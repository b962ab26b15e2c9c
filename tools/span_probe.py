#!/usr/bin/env python3
"""Substring-span dedup scaling probe: run the substring_dedup_spans
census (positional 5-gram digests → shared-gram set → per-doc interval
union) on 1x/5x/10x id-shifted unions of the sf0.1 `documents` fixture.

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
  same per-doc cost).

Unlike the pair-generating near-dup plans (tools/dedup_probe.py, where
output grows ~k²), span scoring emits ONE row per doc — output grows
linearly, and so should wall.  Evidence for SCALE.md's substring-dedup
section.
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
    spark = get_spark("span-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents").filter(
        F.col("text").isNotNull()
    )
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(
                d0.withColumn("doc_id", F.col("doc_id") + i * shift)
            )
        d = d.localCheckpoint(eager=True)
        # inline the census (the query body over an arbitrary frame)
        from pyspark.sql import Window

        from cybersecurity_ioc_etl_spark.operators.dedup import (
            _SPAN_K,
            _shingle_int,
        )

        def run(dd):
            tk = dd.select(
                "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
            ).filter(F.size("tk") >= _SPAN_K)
            base = tk.select("doc_id", F.size("tk").alias("n_tokens"))
            toks = F.col("tk")
            grams = F.transform(
                F.sequence(F.lit(0), F.size(toks) - _SPAN_K),
                lambda gi: F.concat_ws(
                    "\x01",
                    *[
                        F.element_at(toks, gi + j + 1)
                        for j in range(_SPAN_K)
                    ],
                ),
            )
            occ = tk.select(
                "doc_id", F.posexplode(grams).alias("p", "gram")
            ).select("doc_id", "p", _shingle_int(F.col("gram")).alias("h"))
            sh = (
                occ.select("doc_id", "h")
                .distinct()
                .groupBy("h")
                .agg(F.count("*").alias("nd"))
                .filter(F.col("nd") >= 2)
                .select("h")
            )
            dup = occ.join(F.broadcast(sh), "h").select("doc_id", "p")
            lagw = Window.partitionBy("doc_id").orderBy("p")
            isl = (
                dup.withColumn("lp", F.lag("p").over(lagw))
                .groupBy("doc_id")
                .agg(F.count("*").alias("g"))
            )
            return base.join(isl, "doc_id", "left"), sh

        out, sh = run(d)
        out.count()  # warm
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            n = out.count()
            best = min(best, time.perf_counter() - t0)
        nsh = sh.count()
        print(
            f"k={k}: docs={d.count():,} out_rows={n:,}"
            f" shared_grams={nsh:,} wall={best:.2f}s"
        )
        d.unpersist(True)  # the skew_probe lesson: drop before next k
    spark.stop()


if __name__ == "__main__":
    main()
