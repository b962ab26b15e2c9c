"""Analytics-operator tests beyond oracle parity: approx-distinct error
bounds, and bucketed tables giving shuffle-free co-located joins (the
100 TB repeated-join strategy the fixture queries can't show)."""

from __future__ import annotations

import contextlib
import io
import uuid

import __spark_entry__ as entrymod

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.sources.readers import load_table


def test_approx_distinct_within_relative_error(spark, sf_dir):
    """HLL++ at rsd=0.02 must land inside the query's own 4·rsd audit
    bound (the within_4rsd boolean the oracle asserts TRUE), and the
    exact_parts side must agree with an independent exact count."""
    rows = {
        r.l_returnflag: r
        for r in entrymod.queries()["approx_distinct_parts"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.exact
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("exact"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for k in exact:
        assert rows[k].exact_parts == exact[k], (k, rows[k], exact[k])
        assert rows[k].within_4rsd is True, (k, rows[k])


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Same-key bucketed tables join WITHOUT an exchange: pre-shuffled
    once at write time, every subsequent join on the bucket key is
    co-located.  This is the repeated big⋈big strategy at 100 TB —
    lineitem⋈orders pays its shuffle once, not per query."""
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"o_b_{suffix}"
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(lt)
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(ot)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the co-location (not a broadcast) is what
        # eliminates the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table(lt)
            .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        joined.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        final = plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        # tree prints root-first: anything BELOW the join (its inputs)
        # appears after it — no Exchange may feed the join
        below_join = final.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join
        assert "Bucketed: true" in plan  # both scans read bucketed layout
        # correctness: equals the unbucketed join
        expected = {
            (r.o_orderstatus, r.n)
            for r in load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderstatus, r.n) for r in joined.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_approx_percentile_tracks_exact_quantiles(spark, sf_dir):
    """The documented 100 TB quantile path (order_price_quartiles
    docstring): approx_percentile must track the exact percentile()
    within 2% relative error on the fixture — the bound that makes the
    swap safe when exact sort-based quantiles stop scaling."""
    from cybersecurity_ioc_etl_spark.sources.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    row = o.select(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02


def test_approx_percentiles_bounded_by_exact(spark, sf_dir):
    """GK-sketch rank guarantee, now computed INSIDE the query as the
    p50/p90_within_bound booleans (the oracle asserts them TRUE): every
    type must pass its own audit, n_events must match an independent
    count, and the exact side must equal the standalone exact query."""
    from cybersecurity_ioc_etl_spark.operators import QUERIES

    audit = {
        r["event_type"]: r
        for r in QUERIES["approx_value_percentiles"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in QUERIES["event_value_percentiles"](spark, sf_dir).collect()
    }
    assert set(audit) == set(exact)
    for et, row in audit.items():
        assert row["n_events"] == exact[et]["n_events"]
        assert row["p50_exact"] == exact[et]["p50_value"], (et, row)
        assert row["p90_exact"] == exact[et]["p90_value"], (et, row)
        assert row["p50_within_bound"] is True, (et, row)
        assert row["p90_within_bound"] is True, (et, row)
