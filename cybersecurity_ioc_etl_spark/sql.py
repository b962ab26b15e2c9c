"""SQL surface — SURVEY.md §7.1's registration layer.

Every fixture table plus the engine's canonical derived tables become
temp views, so the full capability surface is reachable from
``spark.sql(...)`` as well as the DataFrame API.  Views are lazy:
registering costs nothing until a query references one, and Catalyst
optimizes through them (a filter on the `iocs` view pushes down into
the underlying parquet scan exactly as the DataFrame form does).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.ioc_queries import ioc_table
from .sources.readers import TABLES, load_table, synthetic_feed


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the ten fixture tables, the synthetic email feed
    (`feed`), and the canonical 8-column IOC table (`iocs`) as temp
    views.  Returns the registered view names."""
    names: list[str] = []
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    synthetic_feed(spark, sf_dir).createOrReplaceTempView("feed")
    names.append("feed")
    ioc_table(spark, sf_dir).createOrReplaceTempView("iocs")
    names.append("iocs")
    return names
