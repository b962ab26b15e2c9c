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
