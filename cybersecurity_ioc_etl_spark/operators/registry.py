"""Query registry feeding ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each operator module registers its queries with the :func:`query`
decorator; a query with ``oracle=None`` gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# session confs every query depends on, re-assertable at runtime — the
# driver may hand us a session built WITHOUT session.get_spark():
#  - nanosAsLong: events.parquet stores TIMESTAMP(NANOS); without it the
#    scan throws PARQUET_TYPE_ILLEGAL
#  - UTC timezone: date_format/strftime outputs are value-hashed against
#    a UTC DuckDB oracle; a local-TZ session shifts every date string
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
