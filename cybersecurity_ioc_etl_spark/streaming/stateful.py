"""Stateful streaming operators — SURVEY.md §2.9 ST4 and the watermark /
late-data machinery the reference lacks entirely ("none in reference":
no watermarks, no event-time windows, arrival-order trust only).

Two operators:

- ``running_ioc_type_totals``: cumulative per-type IOC counters via
  ``applyInPandasWithState`` — the engine's replacement for the
  reference's read-modify-write JSON counter file (h-isac.py:133-136,
  171-176).  State lives in the checkpointed state store, so totals
  survive restarts exactly-once — no AM/PM stamp bug (SURVEY §4.3.2),
  no lost updates between concurrent runs.

- ``windowed_counts_with_watermark``: event-time tumbling windows in
  append mode.  The watermark bounds state AND defines the late-data
  contract: a record older than the watermark is dropped, a window is
  emitted exactly once when the watermark passes its end.  This is the
  100 TB stream-agg shape — without a watermark, window state grows
  unboundedly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TOTALS_OUT = T.StructType(
    [
        T.StructField("type", T.StringType(), False),
        T.StructField("total", T.LongType(), False),
    ]
)
_TOTALS_STATE = T.StructType([T.StructField("total", T.LongType(), False)])


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = sum(len(p) for p in pdfs)
    total = (state.get[0] if state.exists else 0) + n
    state.update((total,))
    yield pd.DataFrame({"type": [key[0]], "total": [total]})


def running_ioc_type_totals(
    rows: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Cumulative count per IOC ``type`` across ALL runs sharing the
    checkpoint.  Each micro-batch appends the new running total for the
    types it touched; the latest row per type is the current counter
    (max(total) — totals are monotone)."""
    totals = rows.groupBy("type").applyInPandasWithState(
        _update_totals,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        totals.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def windowed_counts_with_watermark(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> None:
    """Append-mode tumbling-window counts over JSON-lines events with a
    watermark.  Each window row is emitted exactly once — when the
    watermark (max event time − delay, checkpointed across runs) passes
    the window end; later-than-watermark records are dropped."""
    raw = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).json(src_dir)
    agg = (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
