"""Bucketed-table layout: the write-once-shuffle-never-again contract.

The assertion that matters is on the PLAN: joining two tables bucketed
on the same key with the same bucket count must produce no Exchange —
the shuffle was paid at write time and never again.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark import plans as P
from cybersecurity_ioc_etl_spark.sinks.bucketed import colocated_join, write_bucketed
from cybersecurity_ioc_etl_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lines_b",
        "o_orderkey",
        n_buckets=4,
    )
    yield "t_orders_b", "t_lines_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lines_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = colocated_join(spark, left, right, "o_orderkey")
    p = P.formatted_plan(joined)
    assert P.shuffle_count(p) == 0, p
    assert "SortMergeJoin" in p or "HashJoin" in p


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    fast = colocated_join(spark, left, right, "o_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count("*").alias("n_lines"))
    )
    slow = orders.join(li, "o_orderkey")
    assert fast.count() == slow.count()
    assert (
        fast.agg(F.sum("n_lines")).collect()[0][0]
        == slow.agg(F.sum("n_lines")).collect()[0][0]
    )


def test_bucketed_groupby_reuses_layout(spark, bucketed_tables):
    """Aggregating a bucketed table ON its bucket key must also skip the
    exchange — the partial/final agg collapses to one phase per bucket."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    p = P.formatted_plan(agg)
    assert P.shuffle_count(p) == 0, p


def test_each_bucket_is_one_file(spark, bucketed_tables):
    """write_bucketed repartitions to the bucket key first: 4 buckets →
    exactly 4 data files, not 4 × input-partitions (the small-files
    trap)."""
    left, _ = bucketed_tables
    files = (
        spark.sql(f"DESCRIBE EXTENDED {left}")
        .filter("col_name = 'Location'")
        .collect()
    )
    loc = files[0].data_type.removeprefix("file:")
    import os

    data_files = [f for f in os.listdir(loc) if f.endswith(".parquet")]
    assert len(data_files) == 4, data_files


def test_range_sorted_write_has_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """write_range_sorted must produce files whose [min, max] ranges of
    the order column do not overlap — the property parquet stat-pruning
    needs to skip files on a time-bounded read."""
    import os

    from cybersecurity_ioc_etl_spark.sinks.bucketed import write_range_sorted

    out = str(tmp_path / "ranged")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    write_range_sorted(orders, out, "o_orderdate", n_files=6)
    ranges = []
    for fname in sorted(os.listdir(out)):
        if not fname.endswith(".parquet"):
            continue
        part = spark.read.parquet(f"{out}/{fname}")
        row = part.agg(
            F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx")
        ).collect()[0]
        if row.mn is not None:
            ranges.append((row.mn, row.mx))
    assert len(ranges) >= 2
    ranges.sort()
    for (_, prev_mx), (next_mn, _) in zip(ranges, ranges[1:]):
        assert prev_mx <= next_mn  # disjoint up to boundary duplicates
    # row count survives the rewrite
    assert spark.read.parquet(out).count() == orders.count()


def test_zorder_write_gives_two_dimensional_locality(spark, sf_dir, tmp_path):
    """Z-order clustering must make per-file min/max spans selective on
    BOTH interleaved columns — each dimension's average file span must
    be well under the global span (a single-column sort leaves the other
    dimension's spans at ~100%)."""
    import os

    from cybersecurity_ioc_etl_spark.sinks.bucketed import write_zordered

    out = str(tmp_path / "zordered")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("o_day"),
    )
    write_zordered(orders, out, "o_custkey", "o_day", n_files=16)

    spans = {"o_custkey": [], "o_day": []}
    glob = {
        c: orders.agg((F.max(c) - F.min(c)).alias("s")).collect()[0].s
        for c in spans
    }
    for fname in sorted(os.listdir(out)):
        if not fname.endswith(".parquet"):
            continue
        row = (
            spark.read.parquet(f"{out}/{fname}")
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                (F.max("o_day") - F.min("o_day")).alias("dy"),
            )
            .collect()[0]
        )
        if row.ck is not None:
            spans["o_custkey"].append(row.ck)
            spans["o_day"].append(row.dy)
    assert len(spans["o_custkey"]) >= 8
    for c in spans:
        avg = sum(spans[c]) / len(spans[c])
        assert avg < 0.6 * glob[c], (c, avg, glob[c])
    # and the rewrite is lossless
    assert spark.read.parquet(out).count() == orders.count()


def test_compact_parquet_dir_preserves_rows_and_bounds_files(
    spark, sf_dir, tmp_path
):
    """Small-file compaction (r8): a directory of many tiny parquet
    files rewrites to the computed target file count with every row
    preserved — the operational maintenance job for streaming-sink
    output directories."""
    import os

    from cybersecurity_ioc_etl_spark.sinks.bucketed import compact_parquet_dir

    src = str(tmp_path / "tiny")
    out = str(tmp_path / "compacted")
    # 64 tiny files (one per partition)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    df.repartition(64).write.mode("overwrite").parquet(src)
    n_in = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_in == 64
    n_req = compact_parquet_dir(spark, src, out, target_file_bytes=1 << 30)
    n_out = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_req == 1 and n_out == 1  # tiny fixture: one 1-GiB target file
    assert spark.read.parquet(out).count() == df.count()
    # schema survives the rewrite
    assert spark.read.parquet(out).schema == spark.read.parquet(src).schema


def test_compact_parquet_dir_sizes_nested_layouts(spark, sf_dir, tmp_path):
    """ADVICE r10: the size probe must be RECURSIVE — for a
    hive-partitioned source the data files live in subdirectories, and
    a top-level-only listing sees total=0, silently compacting any
    directory to ONE file regardless of actual size.  With a tiny
    target_file_bytes the nested fixture must request >1 output file;
    committer metadata (_SUCCESS) stays excluded (ADVICE r9)."""
    import os

    from cybersecurity_ioc_etl_spark.sinks.bucketed import compact_parquet_dir

    src = str(tmp_path / "nested")
    out = str(tmp_path / "nested_compacted")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    df.write.mode("overwrite").partitionBy("event_type").parquet(src)
    # no top-level *.parquet — only partition subdirs + _SUCCESS
    assert not any(f.endswith(".parquet") for f in os.listdir(src))
    nested_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    assert nested_bytes > 0
    n_req = compact_parquet_dir(
        spark, src, out, target_file_bytes=max(1, nested_bytes // 4)
    )
    assert n_req >= 2, "nested layout must not size to total=0 -> 1 file"
    assert spark.read.parquet(out).count() == df.count()
