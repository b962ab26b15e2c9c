#!/usr/bin/env python3
"""NN-descent scaling probe: run the round's candidate generation and
scoring on 1x/2x/4x id-shifted unions of the sf0.1 `embeddings` fixture
and verify the scale law the operator's docstring claims:

- candidate pairs grow LINEARLY in n (bounded by k² + 2k per node —
  the local join never degenerates toward all-pairs n²);
- the distance census (candidates × dims) therefore also grows
  linearly, and wall should track it;
- per-node improvement stays TRUE at every n (the superset-selection
  law is size-independent).

Evidence for SCALE.md's ANN section.
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
    spark = get_spark("nnd-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql.window import Window

    from cybersecurity_ioc_etl_spark.operators.dedup import _shingle_int
    from cybersecurity_ioc_etl_spark.operators.similarity import (
        _NND_K,
        _mi,
    )

    e0 = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    shift = (e0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1

    for k in (1, 2, 4):
        e = e0
        for j in range(1, k):
            e = e.unionByName(
                e0.withColumn("vec_id", F.col("vec_id") + j * shift)
            )
        comp = (
            e.select(
                "vec_id",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "i", "x"
                ),
            )
            .select("vec_id", "i", _mi(F.col("x")).alias("xi"))
            .localCheckpoint(eager=True)
        )
        ids = comp.select("vec_id").distinct()
        n_nodes = ids.count()
        rk = ids.select(
            "vec_id",
            F.row_number()
            .over(
                Window.orderBy(
                    _shingle_int(F.col("vec_id").cast("string")), "vec_id"
                )
            )
            .alias("r"),
        )
        offs = F.explode(F.sequence(F.lit(1), F.lit(_NND_K))).alias("j")
        nb0 = (
            rk.select("vec_id", "r", offs)
            .alias("a")
            .join(
                rk.alias("b"),
                F.col("b.r")
                == ((F.col("a.r") - 1 + F.col("j")) % F.lit(n_nodes)) + 1,
            )
            .select(
                F.col("a.vec_id").alias("v"), F.col("b.vec_id").alias("u")
            )
            .localCheckpoint(eager=True)
        )
        und = nb0.union(
            nb0.select(F.col("u").alias("v"), F.col("v").alias("u"))
        ).distinct()
        cand = (
            und.alias("x")
            .join(und.alias("y"), F.col("x.u") == F.col("y.v"))
            .filter(F.col("y.u") != F.col("x.v"))
            .select(F.col("x.v").alias("v"), F.col("y.u").alias("u"))
        )
        allc = nb0.unionByName(cand).distinct().localCheckpoint(eager=True)
        n_cand = allc.count()
        t0 = time.perf_counter()
        scored = (
            allc.alias("c")
            .join(comp.alias("pv"), F.col("pv.vec_id") == F.col("c.v"))
            .join(
                comp.alias("pu"),
                (F.col("pu.vec_id") == F.col("c.u"))
                & (F.col("pu.i") == F.col("pv.i")),
            )
            .groupBy("c.v", "c.u")
            .agg(
                F.sum(
                    (F.col("pv.xi") - F.col("pu.xi"))
                    * (F.col("pv.xi") - F.col("pu.xi"))
                ).alias("d2")
            )
        )
        n_scored = scored.count()
        wall = time.perf_counter() - t0
        print(
            f"k={k}: nodes={n_nodes:,} cand_pairs={n_cand:,}"
            f" pairs_per_node={n_cand / n_nodes:.1f}"
            f" scored={n_scored:,} census_wall={wall:.2f}s"
        )
        for df in (comp, nb0, allc):
            df.unpersist(True)  # the skew_probe lesson
    spark.stop()


if __name__ == "__main__":
    main()
