"""Stateful-streaming tests: applyInPandasWithState counters surviving
restart (ST4 parity with the reference's JSON counter file), and
watermark semantics — exactly-once window emission + late-data drop."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.streaming.stateful import (
    running_ioc_type_totals,
    windowed_counts_with_watermark,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_totals_survive_restart(spark):
    src = tempfile.mkdtemp(prefix="types_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_totals_")
    out = tempfile.mkdtemp(prefix="totals_")
    schema = "type string"

    _write_jsonl(f"{src}/a.json", [{"type": "ip"}, {"type": "ip"}, {"type": "hash"}])
    rows = spark.readStream.schema(schema).json(src)
    running_ioc_type_totals(rows, ckpt, out)
    t1 = {r.type: r.total for r in spark.read.parquet(out).collect()}
    assert t1 == {"ip": 2, "hash": 1}

    # restart with the same checkpoint: totals must CONTINUE, not reset —
    # the state store plays the role of ~/pyioc_hisac_meta.json
    _write_jsonl(f"{src}/b.json", [{"type": "ip"}, {"type": "url"}])
    rows = spark.readStream.schema(schema).json(src)
    running_ioc_type_totals(rows, ckpt, out)
    latest = {
        r.type: r.total
        for r in spark.read.parquet(out)
        .groupBy("type")
        .agg(F.max("total").alias("total"))
        .collect()
    }
    assert latest == {"ip": 3, "hash": 1, "url": 1}


def test_watermark_emits_closed_windows_and_drops_late(spark):
    src = tempfile.mkdtemp(prefix="ev_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_wm_")
    out = tempfile.mkdtemp(prefix="win_")

    # batch 1: two events in the 10:00 window, one in 11:00
    _write_jsonl(
        f"{src}/a.json",
        [
            {"ts": "2024-01-01 10:05:00", "event_type": "click"},
            {"ts": "2024-01-01 10:20:00", "event_type": "click"},
            {"ts": "2024-01-01 11:40:00", "event_type": "view"},
        ],
    )
    # batch 2 (separate file => separate micro-batch via maxFilesPerTrigger=1):
    # advances the watermark to 12:20, which closes the 10:00 window
    _write_jsonl(f"{src}/b.json", [{"ts": "2024-01-01 12:30:00", "event_type": "x"}])
    windowed_counts_with_watermark(spark, src, ckpt, out)
    run1 = {r.win_start: r.n_events for r in spark.read.parquet(out).collect()}
    # final watermark 12:20 closes both the 10:00 and 11:00 windows
    # (availableNow runs a final flush batch with the updated watermark);
    # the 12:00 window stays open in state
    assert run1 == {"2024-01-01 10:00:00": 2, "2024-01-01 11:00:00": 1}

    # restart: a LATE event (10:30 < checkpointed watermark 12:20) must be
    # dropped; 14:05 advances the watermark to 13:55, closing 12:00
    _write_jsonl(
        f"{src}/c.json",
        [
            {"ts": "2024-01-01 10:30:00", "event_type": "late"},
            {"ts": "2024-01-01 14:05:00", "event_type": "y"},
        ],
    )
    windowed_counts_with_watermark(spark, src, ckpt, out)
    run2 = {r.win_start: r.n_events for r in spark.read.parquet(out).collect()}
    # 10:00 count unchanged (late row dropped — NOT 3), 12:00 emitted once
    assert run2 == {
        "2024-01-01 10:00:00": 2,
        "2024-01-01 11:00:00": 1,
        "2024-01-01 12:00:00": 1,
    }


def test_stream_stream_join_matches_batch_range_join(spark):
    """Stream-stream inner join (the §2.9 category the reference has no
    analog for): clicks ⋈ errors per user within 10 minutes, both sides
    watermarked so join state is bounded.  Drained with availableNow,
    the result must equal the identical BATCH range join over the same
    records — the correctness claim of incremental join state."""
    click_dir = tempfile.mkdtemp(prefix="ss_clicks_")
    err_dir = tempfile.mkdtemp(prefix="ss_errs_")
    ckpt = tempfile.mkdtemp(prefix="ss_ckpt_")
    out = tempfile.mkdtemp(prefix="ss_out_")

    clicks = [
        {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_id": 100},
        {"ts": "2024-01-01 10:30:00", "user_id": 1, "event_id": 101},
        {"ts": "2024-01-01 10:00:00", "user_id": 2, "event_id": 102},
    ]
    errors = [
        {"ts": "2024-01-01 10:04:00", "user_id": 1, "event_id": 200},  # joins 100
        {"ts": "2024-01-01 10:33:00", "user_id": 1, "event_id": 201},  # joins 101
        {"ts": "2024-01-01 11:00:00", "user_id": 2, "event_id": 202},  # too late
    ]
    _write_jsonl(f"{click_dir}/a.json", clicks)
    _write_jsonl(f"{err_dir}/a.json", errors)

    schema = "ts timestamp, user_id long, event_id long"

    def range_join(c, e):
        return c.alias("c").join(
            e.alias("e"),
            (F.col("c.user_id") == F.col("e.user_id"))
            & (F.col("e.ts") > F.col("c.ts"))
            & (F.col("e.ts") <= F.col("c.ts") + F.expr("INTERVAL 10 MINUTES")),
        ).select(
            F.col("c.event_id").alias("click_id"),
            F.col("e.event_id").alias("error_id"),
        )

    sc = spark.readStream.schema(schema).json(click_dir).withWatermark("ts", "1 hour")
    se = spark.readStream.schema(schema).json(err_dir).withWatermark("ts", "1 hour")
    q = (
        range_join(sc, se)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {(r.click_id, r.error_id) for r in spark.read.parquet(out).collect()}

    bc = spark.read.schema(schema).json(click_dir)
    be = spark.read.schema(schema).json(err_dir)
    batch = {(r.click_id, r.error_id) for r in range_join(bc, be).collect()}

    assert streamed == batch == {(100, 200), (101, 201)}


def test_stream_stream_outer_join_emits_unmatched_on_watermark(spark):
    """LEFT OUTER stream-stream join semantics under controlled late
    data (VERDICT r7 item 6): a matched click emits as in the inner
    form; an unmatched click emits ONCE with NULL error columns only
    after the watermark strictly passes the end of its 10-minute match
    window; an error arriving AFTER that eviction is dropped as late
    (no retro-match, no duplicate emission); and a click whose window
    is still open against the final watermark stays PENDING — absent
    from the drained output."""
    click_dir = tempfile.mkdtemp(prefix="sso_clicks_")
    err_dir = tempfile.mkdtemp(prefix="sso_errs_")
    ckpt = tempfile.mkdtemp(prefix="sso_ckpt_")
    out = tempfile.mkdtemp(prefix="sso_out_")

    # batch 1: click A (matched by e200), click B (never matched)
    _write_jsonl(
        f"{click_dir}/a.json",
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_id": 100},
            {"ts": "2024-01-01 10:05:00", "user_id": 2, "event_id": 101},
        ],
    )
    _write_jsonl(
        f"{err_dir}/a.json",
        [{"ts": "2024-01-01 10:04:00", "user_id": 1, "event_id": 200}],
    )
    # batch 2: advances both watermarks to 11:40 (min(11:50,11:55)-10m),
    # which strictly passes B's window end (10:15) -> B's state evicts
    # and the NULL row emits.  Click C's window (11:50-12:00) stays open
    # against the final watermark -> pending, must NOT emit.
    _write_jsonl(
        f"{click_dir}/b.json",
        [{"ts": "2024-01-01 11:50:00", "user_id": 3, "event_id": 102}],
    )
    _write_jsonl(
        f"{err_dir}/b.json",
        [{"ts": "2024-01-01 11:55:00", "user_id": 9, "event_id": 300}],
    )
    # batch 3: benign — runs with watermark 11:40, so B's state (window
    # end 10:15) evicts at its end and the NULL row emits.  (Input rows
    # join against state BEFORE eviction runs within a batch, so the
    # late error must arrive one batch AFTER the evicting batch.)
    _write_jsonl(
        f"{err_dir}/c.json",
        [{"ts": "2024-01-01 11:56:00", "user_id": 9, "event_id": 301}],
    )
    # batch 4: a LATE error for B (10:08, far below the watermark, and
    # B's state already evicted) — must neither retro-match nor revise
    # or duplicate B's already-emitted null row
    _write_jsonl(
        f"{err_dir}/d.json",
        [{"ts": "2024-01-01 10:08:00", "user_id": 2, "event_id": 201}],
    )
    # FileStreamSource orders files by modification time — pin distinct
    # mtimes so maxFilesPerTrigger=1 really replays a, b, c, d in order
    # (same-second mtimes would let the late batch jump the queue)
    import os as _os
    import time as _time

    t0 = _time.time() - 100
    for f in [
        f"{click_dir}/a.json", f"{click_dir}/b.json",
        f"{err_dir}/a.json", f"{err_dir}/b.json",
        f"{err_dir}/c.json", f"{err_dir}/d.json",
    ]:
        step = {"a": 0, "b": 10, "c": 20, "d": 30}[f.rsplit("/", 1)[1][0]]
        _os.utime(f, (t0 + step, t0 + step))

    schema = "ts timestamp, user_id long, event_id long"
    sc = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(click_dir)
        .withWatermark("ts", "10 minutes")
    )
    se = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(err_dir)
        .withWatermark("ts", "10 minutes")
    )
    joined = sc.alias("c").join(
        se.alias("e"),
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") > F.col("c.ts"))
        & (F.col("e.ts") <= F.col("c.ts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("e.event_id").alias("error_id"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.click_id, r.error_id) for r in spark.read.parquet(out).collect()}
    assert rows == {(100, 200), (101, None)}


def test_stream_stream_full_outer_join_emits_both_sides(spark):
    """FULL OUTER stream-stream join semantics under controlled late
    data (VERDICT r8 item 6): matches emit as in the inner form; an
    unmatched CLICK emits once with NULL error columns when the
    watermark strictly passes its window end (leftOuter behavior); an
    unmatched ERROR emits once with NULL click columns when the
    watermark passes its own event time (its match window is
    (e_ts − 10 min, e_ts), entirely in the past once W ≥ e_ts); rows
    whose windows are still open at end-of-stream stay pending; and a
    LATE click below the watermark neither retro-matches an evicted
    error nor duplicates its emitted null row."""
    click_dir = tempfile.mkdtemp(prefix="ssfo_clicks_")
    err_dir = tempfile.mkdtemp(prefix="ssfo_errs_")
    ckpt = tempfile.mkdtemp(prefix="ssfo_ckpt_")
    out = tempfile.mkdtemp(prefix="ssfo_out_")

    # batch a: click 100 matched by error 200; click 101 never matched;
    # error 210 (user 5) never matched by any click
    _write_jsonl(
        f"{click_dir}/a.json",
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_id": 100},
            {"ts": "2024-01-01 10:05:00", "user_id": 2, "event_id": 101},
        ],
    )
    _write_jsonl(
        f"{err_dir}/a.json",
        [
            {"ts": "2024-01-01 10:04:00", "user_id": 1, "event_id": 200},
            {"ts": "2024-01-01 10:02:00", "user_id": 5, "event_id": 210},
        ],
    )
    # batch b: advances both sides' max event time to 11:50/11:55 → the
    # watermark becomes 11:40 for batch c.  Click 102's window
    # (11:50–12:00) and error 300's window (11:45–11:55) stay open
    # against the final watermark → both pending, neither emits.
    _write_jsonl(
        f"{click_dir}/b.json",
        [{"ts": "2024-01-01 11:50:00", "user_id": 3, "event_id": 102}],
    )
    _write_jsonl(
        f"{err_dir}/b.json",
        [{"ts": "2024-01-01 11:55:00", "user_id": 9, "event_id": 300}],
    )
    # batch c: benign on BOTH sides — runs with watermark 11:40, so
    # click 101 (window end 10:15) AND error 210 (e_ts 10:02) evict and
    # their null rows emit.  The click side needs its own benign file
    # here: with maxFilesPerTrigger=1 PER SOURCE, the next click file
    # would otherwise ride along in this evicting batch — and inputs
    # join state BEFORE eviction runs, so the late click would still
    # retro-match 210 (the CLAUDE.md stream-stream gotcha, reproduced
    # while building this test).
    _write_jsonl(
        f"{click_dir}/c.json",
        [{"ts": "2024-01-01 11:56:00", "user_id": 8, "event_id": 104}],
    )
    _write_jsonl(
        f"{err_dir}/c.json",
        [{"ts": "2024-01-01 11:56:00", "user_id": 9, "event_id": 301}],
    )
    # batch d: a LATE click that would have matched error 210
    # (10:01 ∈ (09:52, 10:02)) — far below the watermark, state already
    # evicted: dropped, no retro-match, no duplicate, and no
    # (103, NULL) row either
    _write_jsonl(
        f"{click_dir}/d.json",
        [{"ts": "2024-01-01 10:01:00", "user_id": 5, "event_id": 103}],
    )
    import os as _os
    import time as _time

    t0 = _time.time() - 100
    for f in [
        f"{click_dir}/a.json", f"{click_dir}/b.json", f"{click_dir}/c.json",
        f"{click_dir}/d.json",
        f"{err_dir}/a.json", f"{err_dir}/b.json", f"{err_dir}/c.json",
    ]:
        step = {"a": 0, "b": 10, "c": 20, "d": 30}[f.rsplit("/", 1)[1][0]]
        _os.utime(f, (t0 + step, t0 + step))

    schema = "ts timestamp, user_id long, event_id long"
    sc = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(click_dir)
        .withWatermark("ts", "10 minutes")
    )
    se = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(err_dir)
        .withWatermark("ts", "10 minutes")
    )
    joined = sc.alias("c").join(
        se.alias("e"),
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") > F.col("c.ts"))
        & (F.col("e.ts") <= F.col("c.ts") + F.expr("INTERVAL 10 MINUTES")),
        "fullOuter",
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("e.event_id").alias("error_id"),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {(r.click_id, r.error_id) for r in spark.read.parquet(out).collect()}
    assert rows == {(100, 200), (101, None), (None, 210)}


def test_streaming_dedup_within_watermark(spark):
    """Streaming exact dedup: dropDuplicatesWithinWatermark removes
    re-deliveries of the same IOC across micro-batches while the
    watermark bounds dedup state — the streaming face of
    dedup_exact_groups (the reference re-posts duplicates freely)."""
    src = tempfile.mkdtemp(prefix="dd_src_")
    ckpt = tempfile.mkdtemp(prefix="dd_ckpt_")
    out = tempfile.mkdtemp(prefix="dd_out_")
    _write_jsonl(
        f"{src}/a.json",
        [
            {"ts": "2024-01-01 10:00:00", "ioc": "1.2.3.4"},
            {"ts": "2024-01-01 10:01:00", "ioc": "1.2.3.4"},  # dup, same batch
            {"ts": "2024-01-01 10:02:00", "ioc": "8.8.8.8"},
        ],
    )
    _write_jsonl(
        f"{src}/b.json",
        [
            {"ts": "2024-01-01 10:03:00", "ioc": "1.2.3.4"},  # dup, next batch
            {"ts": "2024-01-01 10:04:00", "ioc": "9.9.9.9"},
        ],
    )
    rows = (
        spark.readStream.schema("ts timestamp, ioc string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["ioc"])
    )
    q = (
        rows.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    iocs = sorted(r.ioc for r in spark.read.parquet(out).collect())
    assert iocs == ["1.2.3.4", "8.8.8.8", "9.9.9.9"]  # each exactly once


def test_streaming_dedup_evicts_and_readmits(spark):
    """The EVICTION lifecycle of dropDuplicatesWithinWatermark under a
    tight (10-minute) delay — the three behaviors the
    stream_dedup_evicting oracle encodes, pinned on hand-placed rows:

    1. a duplicate within the delay DROPS (A@10:05 vs state from
       A@10:00);
    2. a duplicate probing EXPIRED-but-unevicted state still DROPS:
       eviction at the end of batch k uses the watermark in effect
       DURING k (one-batch lag), so B@11:30 in batch c — whose state
       (exp 10:10:30) is far below the in-effect watermark 10:50 but
       was not evicted at the end of batch b (that eviction used the
       earlier 09:51 watermark) — must NOT re-emit;
    3. once the lagged eviction fires (end of batch c, watermark
       10:50), the key re-admits: B@12:30 and A@12:40 in batch d
       RE-EMIT — one row per key per eviction epoch."""
    src = tempfile.mkdtemp(prefix="dde_src_")
    ckpt = tempfile.mkdtemp(prefix="dde_ckpt_")
    out = tempfile.mkdtemp(prefix="dde_out_")
    _write_jsonl(
        f"{src}/a.json",
        [
            {"ts": "2024-01-01 10:00:00", "ioc": "A"},
            {"ts": "2024-01-01 10:00:30", "ioc": "B"},
            {"ts": "2024-01-01 10:01:00", "ioc": "P1"},  # wm pad
        ],
    )
    _write_jsonl(
        f"{src}/b.json",
        [
            # dup within delay of A@10:00 -> drop (behavior 1)
            {"ts": "2024-01-01 10:05:00", "ioc": "A"},
            # pad pushes the watermark to 10:50 for batch c
            {"ts": "2024-01-01 11:00:00", "ioc": "P2"},
        ],
    )
    _write_jsonl(
        f"{src}/c.json",
        [
            # B's state expired (10:10:30 < in-effect wm 10:50) but
            # NOT yet evicted (batch b's eviction used wm 09:51) ->
            # still drops (behavior 2)
            {"ts": "2024-01-01 11:30:00", "ioc": "B"},
            {"ts": "2024-01-01 12:00:00", "ioc": "P3"},  # wm pad
        ],
    )
    _write_jsonl(
        f"{src}/d.json",
        [
            # batch c's eviction ran with wm 10:50 -> A and B evicted
            # -> both re-admit (behavior 3)
            {"ts": "2024-01-01 12:30:00", "ioc": "B"},
            {"ts": "2024-01-01 12:40:00", "ioc": "A"},
        ],
    )
    import os as _os
    import time as _time

    t0 = _time.time() - 100
    for f in ["a.json", "b.json", "c.json", "d.json"]:
        step = {"a": 0, "b": 10, "c": 20, "d": 30}[f[0]]
        _os.utime(f"{src}/{f}", (t0 + step, t0 + step))
    rows = (
        spark.readStream.schema("ts timestamp, ioc string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["ioc"])
    )
    q = (
        rows.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.ioc, r.ts.strftime("%H:%M:%S"))
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        ("A", "10:00:00"),
        ("A", "12:40:00"),
        ("B", "10:00:30"),
        ("B", "12:30:00"),
        ("P1", "10:01:00"),
        ("P2", "11:00:00"),
        ("P3", "12:00:00"),
    ]


def test_tws_user_counts_gated_or_correct(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): where
    google.protobuf exists the streamed per-user totals must equal the
    batch counts; in this container the probe reports unavailable and
    the operator must fail fast with the documented error."""
    import pytest

    from pyspark.sql import functions as F

    from cybersecurity_ioc_etl_spark.sources.readers import load_table
    from cybersecurity_ioc_etl_spark.streaming.stateful import (
        _tws_available,
        run_tws_user_counts,
    )

    if not _tws_available():
        with pytest.raises(RuntimeError, match="google.protobuf"):
            run_tws_user_counts(spark, sf_dir)
        return
    df = run_tws_user_counts(spark, sf_dir)
    final = {
        r.user_id: r.n
        for r in df.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    }
    batch = {
        r.user_id: r["count"]
        for r in load_table(spark, sf_dir, "events")
        .filter("user_id < 50")
        .groupBy("user_id")
        .count()
        .collect()
    }
    assert final == batch
