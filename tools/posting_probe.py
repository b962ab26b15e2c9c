#!/usr/bin/env python3
"""Posting-join scaling probe: run tfidf_doc_similarity_pairs' pair
plan on growing doc-count slices of the sf0.1 `documents` fixture and
print, per slice:

- pair_instances = Σ_t df_t·(df_t−1)/2 over SURVIVING terms (df ≤ cap)
  — the exact number of (doc_a, doc_b, term) rows the posting self-join
  emits, computed from the df table alone;
- dots rows (distinct document pairs) and the measured wall.

The point to measure: wall tracks pair_instances, never docs² — and the
df cap is the skew lever.  The fixture's 31-term shared vocabulary makes
this stark: term df grows with the slice, so pair_instances grows ~
quadratically UNTIL df crosses the cap, at which point the stop-terms
drop out of the index and the quadratic collapses — exactly what the cap
does to a million-doc posting list at 100 TB.  Evidence for SCALE.md's
sparse-similarity section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.text_queries import (
    tfidf_posting_dots,
    tokens,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"
DF_CAP = 1000


def main() -> None:
    spark = get_spark("posting-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    for n_docs in (250, 500, 1000, 2000):
        d = d0.filter(F.col("doc_id") < n_docs).localCheckpoint(eager=True)
        df_t = (
            d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
            .groupBy("doc_id", "tok")
            .agg(F.count("*").alias("tf"))
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
        )
        stats = df_t.agg(
            F.count("*").alias("n_terms"),
            F.sum(F.when(F.col("df") <= DF_CAP, 1).otherwise(0)).alias(
                "surviving"
            ),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("df") <= DF_CAP,
                        F.col("df") * (F.col("df") - 1) / 2,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("pair_instances"),
        ).collect()[0]
        dots, _ = tfidf_posting_dots(d, DF_CAP)
        dots.count()  # warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = dots.count()
            reps.append(time.perf_counter() - t0)
        wall = sorted(reps)[1]
        d.unpersist(blocking=True)
        print(
            f"docs={n_docs:>5,}: terms={stats['n_terms']}"
            f" surviving(df<={DF_CAP})={stats['surviving']}"
            f" pair_instances={int(stats['pair_instances']):>12,}"
            f" dot_rows={rows:>10,} wall={wall:.2f}s"
        )


if __name__ == "__main__":
    main()
