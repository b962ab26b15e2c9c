"""SparkSession factory with scale-oriented defaults.

Local tests run on ``local[N]``; the confs below are the ones that matter
identically on a 1000-executor cluster: AQE (runtime shuffle-partition
coalescing + skew-join splitting), Arrow for the few Pandas-UDF stages,
and a UTC session timezone so date/timestamp rendering is deterministic
across engines (the DuckDB oracle also runs in UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cybersecurity-ioc-etl-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions + skew-join handling.
        # At 100 TB this is what keeps 200-byte and 2-GB partitions from
        # sharing a static partition count.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # sized for local[32]; a cluster deployment overrides via spark-submit
        .config("spark.sql.shuffle.partitions", "32")
        # Arrow transfer for pandas_udf / mapInPandas stages (enrichment,
        # multimodal decode) — row-at-a-time Python UDFs are banned in this
        # codebase.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown is gated off by default in
        # PySpark 4.1; without this every spark.read.format("splunkkv")
        # fails with DATA_SOURCE_PUSHDOWN_DISABLED because KVStoreReader
        # implements pushFilters() (sources/kvstore_datasource.py).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # deterministic timestamp rendering (matches the DuckDB oracle)
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture stores TIMESTAMP(NANOS) which the Spark parquet
        # reader rejects outright; read as raw int64 nanos and convert
        # JVM-side (sources.readers.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    # first-class KV source/sink (sources/kvstore_datasource.py) — makes
    # spark.read/write.format("splunkkv") available on every session.
    # Registration is idempotent (re-registering replaces the entry).
    from .sources.kvstore_datasource import KVStoreDataSource

    spark.dataSource.register(KVStoreDataSource)
    return spark
