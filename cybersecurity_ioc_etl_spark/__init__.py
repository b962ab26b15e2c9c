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
