"""PySpark-native analytics engine with the query/data-processing
capabilities of bryanbritten/cybersecurity-ioc-etl, re-expressed Spark-first.

Reference (read-only, /root/reference): an imperative single-threaded ETL
(h-isac.py, firehose.py, splunk2.py).  This package re-expresses every
operator in that repo (see SURVEY.md §2) as declarative DataFrame/SQL
transformations that Catalyst can optimize, plus the LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

__version__ = "0.1.0"

# Public API — a reference user's entry points, importable flat:
#   from cybersecurity_ioc_etl_spark import get_spark, register_tables
#   spark = get_spark(); register_tables(spark, sf_dir)
#   spark.sql("SELECT type, count(*) FROM iocs GROUP BY type")
from .functions.ioc import (  # noqa: E402,F401
    classify_ioc,
    clean_text,
    extract_iocs,
    refang,
)
from .session import get_spark  # noqa: E402,F401


def register_tables(spark, sf_dir):  # lazy import: avoids loading every
    """See :func:`cybersecurity_ioc_etl_spark.sql.register_tables`."""
    from .sql import register_tables as _impl  # operator module at import

    return _impl(spark, sf_dir)


def queries():
    """All registered queries (name → (spark, sf_dir) -> DataFrame)."""
    from . import operators

    return dict(operators.QUERIES)


def run_hisac_batch(spark, sf_dir, out_dir, poster=None):
    """See :func:`cybersecurity_ioc_etl_spark.batch.run_hisac_batch`."""
    from .batch import run_hisac_batch as _impl

    return _impl(spark, sf_dir, out_dir, poster=poster)
