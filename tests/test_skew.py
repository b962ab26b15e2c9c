"""AQE skew-join test: a pathologically hot key gets its shuffle
partition SPLIT at runtime — the mechanism (alongside explicit salting,
operators/analytics.py::q_salted_source_profile) that keeps one 100 GB
key from pinning a single reducer at 100 TB."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    # production defaults (256MB/64MB) scaled to fixture size so the
    # optimizer faces the same *ratios* it would at cluster scale
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def test_aqe_splits_hot_key_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        # 300K rows on key 0 vs ~100 rows on each other key
        big = (
            spark.range(300_000)
            .select(F.lit(0).alias("k"), F.col("id").alias("v"))
            .unionAll(
                spark.range(3_100).select(
                    (F.col("id") % 31 + 1).alias("k"), F.col("id").alias("v")
                )
            )
        )
        small = spark.range(32).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        joined = big.join(small, "k")
        rows = joined.count()
        assert rows == 303_100
        joined.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        assert "SortMergeJoin(skew=true)" in buf.getvalue()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_cloned_orderkey_join(spark, sf_dir):
    """The fixture-shaped receipt behind SCALE.md's skew-join probe: one
    hot orderkey's lineitem rows cloned on top of the real tables, the
    forced-SMJ fact join must come back with its hot partition split
    (skew=true) and the SAME aggregate as the unsplit plan."""
    from cybersecurity_ioc_etl_spark.sources.readers import load_table

    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        li0 = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pi"),
        )
        hot = li0.agg(F.min("l_orderkey")).collect()[0][0]
        clones = spark.range(200_000).select(
            F.lit(hot).cast("bigint").alias("l_orderkey"),
            (F.col("id") % 10_000).alias("pi"),
        )
        li = li0.unionByName(clones)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus"
        )

        def run():
            return (
                li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count("*").alias("n"), F.sum("pi").alias("s"))
            )

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        split = run()
        split_rows = sorted(map(tuple, split.collect()))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            split.explain(mode="formatted")
        assert "skew=true" in buf.getvalue()

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain_rows = sorted(map(tuple, run().collect()))
        assert split_rows == plain_rows
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
