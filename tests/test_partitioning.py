"""Storage-layout tests: hive-partitioned output + partition pruning —
the scan-side half of the 100 TB design (TESTDATA fixtures are single
files, so the pruning behavior is proven on engine-written output)."""

from __future__ import annotations

import contextlib
import glob
import io
import os
import tempfile

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.sources.readers import load_table


def test_date_partitioned_write_and_partition_pruning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = os.path.join(tempfile.mkdtemp(prefix="part_"), "events")
    ev.write.partitionBy("event_date").parquet(out)

    # layout: one directory per date
    days = glob.glob(f"{out}/event_date=*")
    n_days = ev.select("event_date").distinct().count()
    assert len(days) == n_days and n_days > 1

    back = spark.read.parquet(out)
    one_day = ev.select(F.min("event_date").alias("d")).collect()[0].d
    q = back.filter(F.col("event_date") == F.lit(one_day)).groupBy(
        "event_type"
    ).agg(F.count("*").alias("n"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    # the date predicate must prune at the PARTITION level, not post-scan
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split("\n")[0]

    # pruned read returns exactly that day's rows
    expected = ev.filter(F.col("event_date") == F.lit(one_day)).count()
    assert q.agg(F.sum("n")).collect()[0][0] == expected


def test_schema_evolution_merge_on_read(spark, sf_dir):
    """Operational reality at 100 TB: the table's schema grows over
    time.  Older parts lack the new column; mergeSchema unifies on read
    with NULLs backfilled — no rewrite of petabytes of history."""
    base = os.path.join(tempfile.mkdtemp(prefix="evo_"), "iocs")
    v1 = spark.createDataFrame([("1.2.3.4", "ip")], ["ioc", "type"])
    v1.write.parquet(f"{base}/run=1")
    v2 = spark.createDataFrame(
        [("evil.example", "url", 0.9)], ["ioc", "type", "confidence"]
    )
    v2.write.parquet(f"{base}/run=2")

    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"ioc", "type", "confidence", "run"}
    rows = {(r.ioc, r.confidence) for r in merged.collect()}
    assert rows == {("1.2.3.4", None), ("evil.example", 0.9)}


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir):
    """DPP: when the partition key is only constrained THROUGH a join
    (filter lives on the dim side), Spark must inject a runtime subquery
    filter into the fact scan — at 100 TB this is the difference between
    scanning 3 partitions and scanning 3 000."""
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = os.path.join(tempfile.mkdtemp(prefix="dpp_"), "events")
    ev.write.partitionBy("event_date").parquet(out)
    fact = spark.read.parquet(out)

    dim = (
        ev.select("event_date").distinct()
        .withColumn("is_audit_day", F.dayofmonth("event_date") <= 2)
    )
    q = (
        fact.join(dim.filter(F.col("is_audit_day")), "event_date")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    pf = plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert "dynamicpruning" in pf, pf

    # and the pruned result equals the unpartitioned computation
    expected = (
        ev.join(dim.filter(F.col("is_audit_day")), "event_date").count()
    )
    assert q.agg(F.sum("n")).collect()[0][0] == expected


def test_json_source_with_explicit_schema_quarantines_corrupt_lines(spark, sf_dir):
    """File-based JSON ingestion (the feed-drop format): explicit schema,
    PERMISSIVE mode, corrupt lines quarantined into _corrupt_record
    instead of failing the job — SURVEY §1.3's replacement for the
    reference's json.loads duck-typing, on the batch path."""
    from pyspark.sql import types as T

    d = tempfile.mkdtemp(prefix="json_src_")
    with open(f"{d}/feed.json", "w") as f:
        f.write('{"id": 1, "ioc": "1.2.3.4", "type": "ip"}\n')
        f.write('{"id": 2, "ioc": "evil.example", "type": "url"}\n')
        f.write('{"id": 3, "ioc": "broken...\n')  # truncated record
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("ioc", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(d)
        .cache()
    )
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        assert {r.ioc for r in good.collect()} == {"1.2.3.4", "evil.example"}
    finally:
        df.unpersist()
