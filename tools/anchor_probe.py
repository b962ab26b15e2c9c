#!/usr/bin/env python3
"""Exact-substring anchor scaling probe: run the substring-anchor span
dedup census (strided 40-char window digests → shared-digest census →
per-doc join-back) on 1x/5x/10x synthetic scale-ups of the sf0.1
`documents` fixture (id-shifted unions — same text distribution,
k-times the corpus AND k-times every cross-doc anchor group's size).

The point to measure: the census cost is linear in ANCHORS (len/stride
per doc), and the shared-set join is digest-keyed — wall should track
the anchor count, never docs².  Note the id-shifted copies make every
anchor shared (each window now exists in k copies), so the k>1 rows
also stress the shared-set join at its worst case.  Evidence for
SCALE.md's substring-dedup section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.dedup import (
    _ANCHOR_LEN,
    _ANCHOR_STRIDE,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def scores(d):
    d = d.filter(F.col("text").isNotNull() & (F.length("text") >= _ANCHOR_LEN))
    pos = F.sequence(
        F.lit(1), F.length("text") - F.lit(_ANCHOR_LEN - 1), F.lit(_ANCHOR_STRIDE)
    )
    an = d.select(
        "doc_id",
        F.explode(
            F.transform(
                pos, lambda p: F.md5(F.col("text").substr(p, F.lit(_ANCHOR_LEN)))
            )
        ).alias("dg"),
    ).distinct()
    sh = (
        an.groupBy("dg").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    ).select("dg")
    return (
        an.join(F.broadcast(sh.withColumn("is_sh", F.lit(1))), "dg", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_anchors"),
            F.sum(F.coalesce(F.col("is_sh"), F.lit(0))).alias("n_shared"),
        )
    )


def main() -> None:
    spark = get_spark("anchor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True)
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    for k in (1, 5, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(d0.withColumn("doc_id", F.col("doc_id") + i * shift))
        out = scores(d)
        out.count()  # warm the plan shape
        best, docs = 9e9, 0
        anchors = 0
        for _ in range(2):
            t0 = time.perf_counter()
            row = out.agg(
                F.count("*").alias("docs"), F.sum("n_anchors").alias("anchors")
            ).collect()[0]
            best = min(best, time.perf_counter() - t0)
            docs, anchors = row["docs"], row["anchors"]
        print(
            f"k={k}: docs={docs:,} anchors={anchors:,} wall={best:.2f}s "
            f"anchors/s={anchors/best/1e3:.0f}K"
        )


if __name__ == "__main__":
    main()
