"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship IOC pipeline at sf0.001 (smoke: rows > 0).
queries()      — every implemented operator from SURVEY.md §2 + north-star
                 extensions, as (spark, sf_dir) -> DataFrame callables.
oracle_sql()   — DuckDB-equivalent SQL per query (value-hash gate).

Queries/oracles are registered by the operator modules in
cybersecurity_ioc_etl_spark/operators/ via the @query decorator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cybersecurity_ioc_etl_spark import operators as _ops  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extract-normalize pipeline (SURVEY.md §7.2) on sf0.001."""
    return _ops.QUERIES["ioc_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_ops.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ops.ORACLES)
