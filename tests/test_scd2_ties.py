"""SCD2 fold determinism under timestamp TIES: two change points with
the same ts must get (ts, event_id)-ordered valid_to assignment — a
ts-only window sort would leave the tie order (and therefore which
version 'ends' at the tied instant) engine- and partitioning-dependent.
The fixture's microsecond timestamps never tie, so this pins the case
directly."""

from __future__ import annotations

import datetime
import tempfile

from cybersecurity_ioc_etl_spark.operators import QUERIES


def test_scd2_tied_change_points_are_deterministic(spark):
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    t1 = t0 + datetime.timedelta(hours=1)
    rows = [
        # user 7: two change points at the SAME instant, then a third
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0, 7, "view", 1.0, "{}"),
        (3, t1, 7, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string"
    )
    d = tempfile.mkdtemp(prefix="scd2_ties_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    # satisfy load_table for the other fixture tables the query ignores
    out = {
        tuple(r)
        for r in QUERIES["user_value_scd2"](spark, d)
        .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
        .collect()
    }
    # user_id 7 % 10 != 0 — rebuild with user 10 so the query's scope
    # filter keeps it
    assert out == set()  # user 7 filtered by the % 10 scope

    rows10 = [(i, ts, 10, et, 1.0, "{}") for (i, ts, _, et, _, _) in rows]
    df10 = spark.createDataFrame(
        rows10, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string"
    )
    df10.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        tuple(r)
        for r in QUERIES["user_value_scd2"](spark, d)
        .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
        .collect()
    }
    ts0 = "2024-03-01 12:00:00"
    ts1 = "2024-03-01 13:00:00"
    # event_id order breaks the tie: click's version ends AT the tied
    # instant (superseded by view), view's runs until the purchase
    assert got == {
        (10, "click", ts0, ts0, False),
        (10, "view", ts0, ts1, False),
        (10, "purchase", ts1, "current", True),
    }
