#!/usr/bin/env python3
"""Product-quantization scale probe: clone the sf0.1 embeddings k×
(id-shifted unions) and time, per corpus size:

- brute: full-dimension exact cosine scoring of the whole corpus
  against the query (64 multiply-adds per vector);
- adc:   PQ asymmetric-distance scoring from stored codes (8 table
  lookups per vector; the K·M distance table is broadcast).

Both plans are linear in the corpus — the structural receipt is the
per-vector CONSTANT: ADC's scoring join touches the 8-row code table
per vector (8 small ints; 2 bytes packed at K=4) where brute-force
folds all 64 mantissa components (512 B raw) — the rows_touched ratio
printed below is pinned at dims/M = 8× at every corpus size, and the
packed-index arithmetic (M·log2 K bits = 2 B/vector vs 256 B float32)
is the 128× that lets a 100 TB corpus serve from memory.  Wall times
ride along but carry a caveat: at fixture scale both plans sit on
fixed stage-scheduling floors (sub-second), so wall converges to the
constant-factor story only at real scale.  Encoding (pq_codes) is
timed separately — the one-off index build, amortized over every
query.  Evidence for SCALE.md's vector-store section.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.similarity import (
    _mi,
    _pq_adc_scored,
    _pq_codes_frame,
)
from cybersecurity_ioc_etl_spark.session import get_spark
from cybersecurity_ioc_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.1"


def _comp(e):
    return (
        e.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
        )
        .select("vec_id", "i", _mi(F.col("x")).alias("xi"))
        .localCheckpoint(eager=True)
    )


def brute(spark, comp):
    qv = comp.filter(F.col("vec_id") == 0).select(
        F.col("i").alias("qi"), F.col("xi").alias("qx")
    )
    return (
        comp.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), F.col("i") == F.col("qi"))
        .groupBy("vec_id")
        .agg(F.sum(F.col("xi") * F.col("qx")).alias("dot_i"))
    )


def main() -> None:
    spark = get_spark("pq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e0 = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select("vec_id", "embedding")
    shift = (e0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1

    for k in (1, 4, 8):
        e = e0
        for j in range(1, k):
            e = e.unionByName(
                e0.withColumn("vec_id", F.col("vec_id") + j * shift)
            )
        comp = _comp(e)
        # index build (one-off): encode + materialize the codes
        t0 = time.perf_counter()
        codes = _pq_codes_frame(spark, SF_DIR, comp=comp).localCheckpoint(
            eager=True
        )
        n_codes = codes.count()
        build = time.perf_counter() - t0
        walls = {}
        for name, fn in (
            ("brute", lambda: brute(spark, comp)),
            ("adc", lambda: _pq_adc_scored(spark, SF_DIR, comp, codes=codes)),
        ):
            fn().count()  # warm
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().count()
                reps.append(time.perf_counter() - t0)
            walls[name] = sorted(reps)[1]
        nv = e.count()
        n_comp = comp.count()
        comp.unpersist(blocking=True)
        codes.unpersist(blocking=True)
        print(
            f"k={k}: vectors={nv:,} scoring_rows brute={n_comp:,} "
            f"adc={n_codes:,} (ratio={n_comp / n_codes:.1f}x) "
            f"build={build:.2f}s walls brute={walls['brute']:.2f}s "
            f"adc={walls['adc']:.2f}s"
        )


if __name__ == "__main__":
    main()
