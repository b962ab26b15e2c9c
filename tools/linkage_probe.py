#!/usr/bin/env python3
"""Linkage scaling probe: blocked-pair volume and wall on 1x/2x/4x
clones of the sf0.1 customer fixture, under TWO cloning modes:

- same-blocks (id-shift custkey only): every clone lands in the SAME
  nation blocks, so blocked candidates grow k^2 — the anti-pattern
  receipt showing what happens when corpus growth outpaces blocking
  granularity.
- split-blocks (shift nationkey too): clones form DISJOINT blocks, so
  candidates grow k and wall tracks candidates — the production shape
  (at 100 TB you grow the blocking key with the corpus, exactly as
  semdedup grows k with n).

Evidence for SCALE.md's entity-resolution row: "the blocking key is
the lever" made a measured number on both sides of the lever.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.linkage import _lnk_sides
from cybersecurity_ioc_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("linkage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    c0, d0 = _lnk_sides(spark, SF_DIR)
    c0 = c0.localCheckpoint(eager=True)
    d0 = d0.localCheckpoint(eager=True)
    shift = (c0.agg(F.max("k")).collect()[0][0] or 0) + 1

    def clone(df, k, split_blocks):
        out = df
        for i in range(1, k):
            part = df.withColumn("k", F.col("k") + i * shift)
            if split_blocks:
                part = part.withColumn("nat", F.col("nat") + i * 25)
            out = out.unionByName(part)
        return out

    def blocked_pairs(c, d):
        ag = lambda a, b: F.when(F.col(a) == F.col(b), 1).otherwise(0)  # noqa: E731
        return (
            c.alias("o")
            .join(d.alias("d"), F.col("o.nat") == F.col("d.nat"))
            .select(
                (
                    ag("o.name", "d.name")
                    + ag("o.seg", "d.seg")
                    + ag("o.bal_i", "d.bal_i")
                ).alias("agree")
            )
            .agg(
                F.count("*").alias("cand"),
                F.sum(F.when(F.col("agree") >= 2, 1).otherwise(0)).alias(
                    "links"
                ),
            )
        )

    for mode, split in (("same-blocks", False), ("split-blocks", True)):
        prev = None
        for k in (1, 2, 4):
            c, d = clone(c0, k, split), clone(d0, k, split)
            blocked_pairs(c, d).collect()  # warm
            best, cand = 9e9, 0
            for _ in range(2):
                t0 = time.perf_counter()
                row = blocked_pairs(c, d).collect()[0]
                best = min(best, time.perf_counter() - t0)
                cand = row["cand"]
            ratio = "" if prev is None else (
                f" wall x{best / prev[0]:.1f} cand x{cand / prev[1]:.1f}"
            )
            print(
                f"{mode} k={k}: cand={cand:,} wall={best:.2f}s{ratio}"
            )
            prev = (best, cand)
    spark.stop()


if __name__ == "__main__":
    main()
