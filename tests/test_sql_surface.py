"""SQL registration layer (SURVEY §7.1): the engine's capabilities are
reachable from spark.sql, and Catalyst optimizes through the views."""

from __future__ import annotations

import contextlib
import io

from cybersecurity_ioc_etl_spark.sql import register_tables


def test_all_views_registered_and_queryable(spark, sf_dir):
    names = register_tables(spark, sf_dir)
    assert {"lineitem", "feed", "iocs"} <= set(names)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    assert n > 0


def test_ioc_view_matches_dataframe_api(spark, sf_dir):
    register_tables(spark, sf_dir)
    via_sql = spark.sql(
        "SELECT type, COUNT(*) AS n FROM iocs GROUP BY type ORDER BY type"
    ).collect()
    from cybersecurity_ioc_etl_spark.operators.ioc_queries import ioc_table

    via_df = (
        ioc_table(spark, sf_dir).groupBy("type").count().orderBy("type").collect()
    )
    assert [(r.type, r.n) for r in via_sql] == [(r.type, r["count"]) for r in via_df]


def test_filter_on_view_pushes_down_to_scan(spark, sf_dir):
    register_tables(spark, sf_dir)
    q = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity > 49")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def test_doc_counts_in_sync_with_registry():
    """COVERAGE.md / BASELINE.md cite the registry totals; tools/counts.py
    derives them from queries()/oracle_sql().  Stale docs fail here
    (fix: python tools/counts.py --write)."""
    import importlib

    counts = importlib.import_module("tools.counts")
    assert counts.sync(write=False) == []


def test_operator_inventory_in_sync_with_registry():
    """OPERATORS.md is generated from the registry by tools/inventory.py;
    a new query without a regenerated inventory fails here
    (fix: python tools/inventory.py --write)."""
    import importlib
    import os

    inventory = importlib.import_module("tools.inventory")
    path = os.path.join(inventory.REPO, "OPERATORS.md")
    assert os.path.exists(path) and open(path).read() == inventory.render()
