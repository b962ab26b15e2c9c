#!/usr/bin/env python3
"""Perceptual-hash near-dup scaling probe: run the dHash banded
candidate plan (decode → 64-bit dHash → 8-byte-band bucket join →
exact popcount verify) on 1x/4x/10x id-shifted scale-ups of the sf0.1
`documents` fixture.

What to measure: with 8-bit bands there are only 256 buckets per band,
so byte-band multi-index hashing is a CONSTANT-FACTOR candidate prune
(~32x under uniform hashes: 8/256 of all-pairs), not an exponential
one — wall should track emitted candidates, and candidates should stay
that fixed fraction of n²/2 as n grows.  The exponential-prune scale
path is a WIDER perceptual hash (256-bit pHash → 2^32 buckets per
byte-band) on exactly this machinery; the probe documents the
crossover honestly rather than overclaiming.  Evidence for SCALE.md's
multimodal section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.multimodal.columns import (
    _DH_HAMMING_T,
    dhash_banded_candidates,
    perceptual_hash,
    synthesize_ppm_images,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("dhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents", fan_out=True)
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1

    prev = None
    for k in (1, 4, 10):
        d = d0
        for i in range(1, k):
            d = d.unionByName(
                d0.withColumn("doc_id", F.col("doc_id") + i * shift)
            )
        hashes = perceptual_hash(synthesize_ppm_images(d)).localCheckpoint()
        n = hashes.count()
        cand = dhash_banded_candidates(hashes)
        ham = F.bit_count(
            F.col("hi_a").bitwiseXOR(F.col("hi_b"))
        ) + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        q = cand.filter(ham <= _DH_HAMMING_T)
        q.count()  # warm the plan shape
        best, pairs = 9e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = q.count()
            best = min(best, time.perf_counter() - t0)
        ncand = cand.count()
        allpairs = n * (n - 1) // 2
        print(
            f"k={k}: images={n:,} wall={best:.2f}s candidates={ncand:,} "
            f"pairs={pairs:,} prune={allpairs / max(ncand, 1):.1f}x "
            f"(all-pairs {allpairs:,})"
        )
        if prev is not None:
            print(
                f"      vs prev: wall x{best / prev[0]:.1f}, "
                f"candidates x{ncand / max(prev[1], 1):.1f}"
            )
        prev = (best, ncand)
        hashes.unpersist(blocking=True)


if __name__ == "__main__":
    main()
