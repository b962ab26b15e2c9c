"""splunkkv DataSource V2 end-to-end tests over the local-dir transport.

The local transport (`kvstore_datasource._serve_local`) applies
query/sort/skip/limit exactly as the KV endpoint would and logs every
request to ``<dir>/_access_log/`` — these tests assert the OBSERVABLE
source behavior from that log: filter pushdown reached the server, the
scan was split into paged partitions, every page carried an explicit
sort, and writes were batched under the 1000-row batch_save cap.
"""

from __future__ import annotations

import glob
import json
import os

import pytest


def _write_collection(tmp_path, n=40):
    rows = [
        {
            "_key": f"k{i:04d}",
            "id": f"id{i % 5}",
            "date_added": "2021-01-01",
            "date_received": "2021-01-01",
            "ioc": f"10.0.0.{i}",
            "platform": "H-ISAC",
            "source": f"analyst{i % 3}",
            "tag": "N/A",
            "type": ["ip", "hash", "url", "email"][i % 4],
        }
        for i in range(n)
    ]
    with open(os.path.join(tmp_path, "collection.json"), "w") as f:
        json.dump(rows, f)
    return rows


def _requests(tmp_path):
    reqs = []
    for p in glob.glob(os.path.join(tmp_path, "_access_log", "req-*.json")):
        with open(p) as f:
            reqs.append(json.load(f))
    return reqs


def test_read_roundtrip_all_rows(spark, tmp_path):
    d = str(tmp_path)
    rows = _write_collection(d)
    got = (
        spark.read.format("splunkkv")
        .option("url", d)
        .option("numPartitions", 4)
        .load()
        .collect()
    )
    assert len(got) == len(rows)
    assert sorted(r["ioc"] for r in got) == sorted(r["ioc"] for r in rows)


def test_equalto_filter_is_pushed_to_server(spark, tmp_path):
    d = str(tmp_path)
    _write_collection(d)
    got = (
        spark.read.format("splunkkv")
        .option("url", d)
        .load()
        .filter("type = 'ip'")
        .collect()
    )
    assert len(got) == 10 and all(r["type"] == "ip" for r in got)
    pushed = [r for r in _requests(d) if json.loads(r.get("query", "{}")).get("type") == "ip"]
    # both the planning-time count and every page carry the pushed query
    assert pushed, "EqualTo('type','ip') never reached the KV endpoint"


def test_in_filter_is_pushed_to_server(spark, tmp_path):
    d = str(tmp_path)
    _write_collection(d)
    got = (
        spark.read.format("splunkkv")
        .option("url", d)
        .load()
        .filter("type IN ('ip', 'hash')")
        .collect()
    )
    assert len(got) == 20
    pushed = [
        r
        for r in _requests(d)
        if json.loads(r.get("query", "{}")).get("type") == {"$in": ["ip", "hash"]}
    ]
    assert pushed, "In('type', ...) never reached the KV endpoint"


def test_scan_is_paged_across_partitions_with_explicit_sort(spark, tmp_path):
    d = str(tmp_path)
    _write_collection(d, n=40)
    df = spark.read.format("splunkkv").option("url", d).option("numPartitions", 4).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    pages = [r for r in _requests(d) if "skip" in r]
    assert len(pages) == 4
    assert sorted(int(p["skip"]) for p in pages) == [0, 10, 20, 30]
    assert all(int(p["limit"]) == 10 for p in pages)
    # skip/limit paging is only correct under a total order — every page
    # request must carry the explicit sort field
    assert all(p.get("sort") == "_key" for p in pages)


def test_write_batches_under_cap(spark, tmp_path):
    d = str(tmp_path)
    sink = os.path.join(d, "sink")
    src = spark.createDataFrame(
        [(f"id{i}", "2021-01-01", "2021-01-01", f"ioc{i}", "H-ISAC", "a", "N/A", "ip") for i in range(25)],
        "id string, date_added string, date_received string, ioc string, "
        "platform string, source string, tag string, type string",
    ).coalesce(1)
    src.write.format("splunkkv").option("url", sink).option("batchCap", 10).mode(
        "append"
    ).save()
    with open(os.path.join(sink, "_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest == {"rows": 25, "posts": 3, "partitions": 1}
    posts = glob.glob(os.path.join(sink, "post-*.json"))
    assert len(posts) == 3
    sizes = sorted(len(json.load(open(p))) for p in posts)
    assert sizes == [5, 10, 10]


def test_overwrite_mode_is_rejected(spark, tmp_path):
    d = os.path.join(str(tmp_path), "sink")
    src = spark.createDataFrame([("a",)], "id string")
    with pytest.raises(Exception, match="append-only"):
        src.write.format("splunkkv").option("url", d).mode("overwrite").save()
