#!/usr/bin/env python3
"""Keeper-election skew probe: clone ONE document k times (fresh doc_ids,
identical text → identical fingerprint) on top of the sf0.1 `documents`
fixture and time both keeper plans:

- window:  row_number() OVER (PARTITION BY fingerprint ...) — no partial
  aggregation, the hot fingerprint's k copies all land on one task.
- salted:  two-phase struct-min per (fingerprint, pmod(doc_id, 16)) then
  min-merge — map-side combined, the hot key split 16 ways.

The point to measure: as k grows the salted wall stays ~flat (the hot
group is pre-reduced to ≤16 rows before the final shuffle) while the
window wall grows with k (one task sorts the whole hot partition).
Evidence for SCALE.md's skew section.  Both plans are asserted to emit
the IDENTICAL keeper row for the hot fingerprint.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cybersecurity_ioc_etl_spark.operators.dedup import _SALT_N, fingerprint
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def window_keepers(d):
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = Window.partitionBy("fingerprint").orderBy(F.col("n_tokens").desc(), "doc_id")
    return (
        d.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fingerprint"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "n_tokens")
    )


def salted_keepers(d):
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    phase1 = (
        d.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fingerprint"),
            n_tok.alias("n_tokens"),
            F.pmod(F.col("doc_id"), F.lit(_SALT_N)).alias("salt"),
        )
        .groupBy("fingerprint", "salt")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_tokens")).alias("neg_tok"),
                    F.col("doc_id").alias("doc_id"),
                )
            ).alias("best")
        )
    )
    return (
        phase1.groupBy("fingerprint")
        .agg(F.min("best").alias("best"))
        .select(
            F.col("best.doc_id").alias("doc_id"),
            "fingerprint",
            (-F.col("best.neg_tok")).alias("n_tokens"),
        )
    )


# short boilerplate: the duplicated page whose COUNT, not payload size,
# is the pathology — keeps 8M clones to ~0.6 GB so the probe times the
# election, not I/O
BOILER = "all rights reserved terms of service apply contact the site admin"


def main() -> None:
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    shift = (d0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    hot_fp = (
        spark.range(1)
        .select(fingerprint(F.lit(BOILER)).alias("fp"))
        .collect()[0][0]
    )

    for k in (0, 2_000_000, 8_000_000):
        if k:
            clones = spark.range(k).select(
                (F.col("id") + shift).alias("doc_id"),
                F.lit(BOILER).alias("text"),
            )
            d = d0.unionByName(clones)
        else:
            d = d0
        d = d.localCheckpoint(eager=True)  # time the election, not the clone
        walls = {}
        for name, fn in (("window", window_keepers), ("salted", salted_keepers)):
            fn(d).count()  # warm
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(d).count()
                reps.append(time.perf_counter() - t0)
            walls[name] = sorted(reps)[1]  # median of 3
        wk = window_keepers(d).filter(F.col("fingerprint") == hot_fp).collect()
        sk = salted_keepers(d).filter(F.col("fingerprint") == hot_fp).collect()
        assert [tuple(r) for r in wk] == [tuple(r) for r in sk], (wk, sk)
        d.unpersist(blocking=True)  # drop the checkpoint blocks before the
        # next, larger corpus — accumulated blocks turn the later timings
        # into GC noise
        print(
            f"hot_copies={k:>9,}: window={walls['window']:.2f}s "
            f"salted={walls['salted']:.2f}s "
            f"ratio={walls['window'] / walls['salted']:.2f}x (same keeper: yes)"
        )


if __name__ == "__main__":
    main()
