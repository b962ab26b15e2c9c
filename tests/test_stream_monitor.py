"""ST3/S6 tests: StreamingQueryListener observability and the
foreachBatch streaming KV sink sharing the batch writer's 1000-cap
contract."""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time
import uuid

from cybersecurity_ioc_etl_spark.streaming.monitor import (
    CollectingListener,
    write_stream_kv_batched,
)


def _dir_poster(out_dir: str):
    def post(batch: list[str]) -> None:
        with open(os.path.join(out_dir, uuid.uuid4().hex), "w") as f:
            json.dump(batch, f)

    return post


def _jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_listener_sees_progress_and_clean_termination(spark):
    src = tempfile.mkdtemp(prefix="mon_src_")
    ckpt = tempfile.mkdtemp(prefix="mon_ckpt_")
    out = tempfile.mkdtemp(prefix="mon_out_")
    _jsonl(f"{src}/a.json", [{"ioc": "1.2.3.4", "type": "ip"}] * 5)

    listener = CollectingListener()
    spark.streams.addListener(listener)
    try:
        rows = spark.readStream.schema("ioc string, type string").json(src)
        q = write_stream_kv_batched(rows, _dir_poster(out), ckpt, batch_size=2)
        q.awaitTermination()
        # listener events are delivered asynchronously
        deadline = time.time() + 20
        while time.time() < deadline and not listener.terminated:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    assert sum(p["num_input_rows"] for p in listener.progress) == 5
    assert listener.terminated and listener.terminated[0]["exception"] is None


def test_stream_kv_sink_applies_batch_cap(spark):
    src = tempfile.mkdtemp(prefix="kv_src_")
    ckpt = tempfile.mkdtemp(prefix="kv_ckpt_")
    out = tempfile.mkdtemp(prefix="kv_out_")
    _jsonl(f"{src}/a.json", [{"ioc": f"10.0.0.{i}", "type": "ip"} for i in range(7)])

    rows = spark.readStream.schema("ioc string, type string").json(src).coalesce(1)
    q = write_stream_kv_batched(rows, _dir_poster(out), ckpt, batch_size=3)
    q.awaitTermination()

    batches = [json.load(open(p)) for p in glob.glob(f"{out}/*")]
    assert sorted(len(b) for b in batches) == [1, 3, 3]
    posted = {json.loads(x)["ioc"] for b in batches for x in b}
    assert posted == {f"10.0.0.{i}" for i in range(7)}
