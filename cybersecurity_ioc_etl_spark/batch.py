"""The reference's batch entry point (`h-isac.py main()`, lines 141-180)
as ONE assembled engine job — the end-to-end workflow a migrating user
runs instead of `python3 h-isac.py <folder> [--splunk cfg]`.

Stage map (SURVEY §3.1 trace → engine):
  get_messages + Restrict       → feed scan with Catalyst pushdown
  subject filter + parse loop   → ioc_table (filter → extract → explode)
  push_to_splunk | to_csv fork  → write_kv_batched | write_csv
  metrics update + state file   → write_metrics append table

Divergences fixed (SURVEY §4.3): both sinks work independently (the
reference crashed when --splunk was omitted, h-isac.py:210); metrics
count PARSED feed items, not restricted ones (h-isac.py:176); state
lives in an append-only table instead of a stamp-then-overwrite JSON
file.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.ioc_queries import ioc_table
from .sinks.kv import write_csv, write_kv_batched, write_metrics


def run_hisac_batch(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    poster: Callable[[list[str]], Any] | None = None,
    kv_url: str | None = None,
) -> dict[str, int]:
    """Run the full batch pipeline; returns the run metrics.

    ``poster`` given → KV sink (batched, partition-parallel);
    ``kv_url`` given → the first-class splunkkv sink (CLI ``--splunk``
    fork, config-validated per S10); otherwise → CSV under ``out_dir``
    (the reference's fork at h-isac.py:164-168, minus its crash when
    the flag is absent).  Metrics append to ``{out_dir}/metrics``
    either way.

    The IOC table is cached so the sink pass and the metrics pass share
    one extraction (the multi-consumer pattern from tests/test_plans) —
    at 100 TB prefer a persisted intermediate table over recompute.
    """
    iocs = ioc_table(spark, sf_dir).cache()
    try:
        if poster is not None:
            write_kv_batched(iocs, poster)
        elif kv_url is not None:
            iocs.write.format("splunkkv").option("url", kv_url).mode("append").save()
        else:
            write_csv(iocs, os.path.join(out_dir, "iocs_csv"), single_file=False)
        write_metrics(iocs, os.path.join(out_dir, "metrics"))
        per_type = {
            r["type"]: r["n"]
            for r in iocs.groupBy("type").agg(F.count("*").alias("n")).collect()
        }
        n_msgs = iocs.select("id").distinct().count()
    finally:
        iocs.unpersist()
    return {"n_iocs": sum(per_type.values()), "n_messages": n_msgs, **per_type}
