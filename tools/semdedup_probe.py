#!/usr/bin/env python3
"""SemDeDup scaling probe: grow the corpus c-fold (id-shifted unions of
the sf0.1 `embeddings` fixture) while growing the cluster count k
proportionally (k = 8c), exactly as the operator's 100 TB deployment
would (k ~ n / target_cell_size).

The claim to verify: candidate pairs — the work the exact cosine stage
pays — track SUM over clusters of (cluster_size choose 2), which stays
LINEAR in the corpus when k grows with n, while brute force grows
quadratically.  Wall time must track candidates.  Evidence for
SCALE.md's SemDeDup section, mirroring tools/dedup_probe.py (near-dup)
and tools/ann_probe.py (ANN).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.similarity import (
    semdedup_audit_frame,
    semdedup_candidate_pairs,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e0 = load_table(spark, SF_DIR, "embeddings", fan_out=True).select(
        "vec_id", "embedding"
    )
    shift = (e0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1

    for c in (1, 3, 6):
        e = e0
        for i in range(1, c):
            e = e.unionByName(e0.withColumn("vec_id", F.col("vec_id") + i * shift))
        k = 8 * c
        n_vec = e.count()
        n_cand = semdedup_candidate_pairs(e, k).count()
        audit = semdedup_audit_frame(e, k)
        audit.count()  # warm the plan shape
        best = 9e9
        for _ in range(2):
            t0 = time.perf_counter()
            audit.count()
            best = min(best, time.perf_counter() - t0)
        brute = n_vec * (n_vec - 1) // 2
        print(
            f"c={c}: vectors={n_vec:,} k={k} candidates={n_cand:,} "
            f"(brute={brute:,}, ratio={n_cand / brute:.3f}) "
            f"wall={best:.2f}s cand_per_vec={n_cand / n_vec:.0f}"
        )


if __name__ == "__main__":
    main()
