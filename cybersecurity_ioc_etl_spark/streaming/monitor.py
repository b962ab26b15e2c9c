"""Stream observability — SURVEY.md §2.9 ST3.

The reference's error handling is a print statement in ``on_error``
(firehose.py:16-17) and nothing else: no throughput visibility, no
termination signal, no retry.  Structured Streaming surfaces all of it
through ``StreamingQueryListener``; this module provides a collecting
listener (driver-side metrics buffer) that tests and operators can
attach, plus the streaming flavor of the batched KV sink (S6) built on
``foreachBatch`` so each micro-batch reuses the partition-parallel
batch writer.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQueryListener

from ..sinks.kv import SPLUNK_BATCH_LIMIT, write_kv_batched


class CollectingListener(StreamingQueryListener):
    """Buffers per-batch progress and termination events.

    progress rows: {"batch_id", "num_input_rows", "sink"}; terminated
    rows: {"id", "exception"} — exception is None on clean stop, the
    error string otherwise (the reference's on_error print, made
    machine-readable)."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []
        self.terminated: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "sink": p.sink.description,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.append({"id": str(event.id), "exception": event.exception})


def write_stream_kv_batched(
    rows: DataFrame,
    poster: Callable[[list[str]], Any],
    checkpoint_dir: str,
    batch_size: int = SPLUNK_BATCH_LIMIT,
):
    """Streaming KV sink (S6): every micro-batch goes through the same
    1000-cap partition-parallel writer as the batch path — replacing the
    reference's one-HTTPS-POST-per-IOC loop (firehose.py:114-133) with
    per-partition buffered flushes and exactly-once replay via the
    checkpoint (a replayed batch re-posts; the KV key makes it
    idempotent, which the reference's design already assumes)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_kv_batched(batch_df, poster, batch_size=batch_size)

    return (
        rows.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
