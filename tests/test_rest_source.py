"""REST query client tests (S9 splunk2.py parity): the union-typed
response dispatch (splunk2.py:22-47), explicit-schema override, auth
header, and URL joining — all against an injected fake transport."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from cybersecurity_ioc_etl_spark.sources.rest import RestClient


class FakeTransport:
    def __init__(self, response):
        self.response = response
        self.calls = []

    def __call__(self, method, url, body, headers):
        self.calls.append((method, url, body, headers))
        return json.dumps(self.response)


def _client(spark, response, token=None):
    t = FakeTransport(response)
    return RestClient(spark, "https://api.example:8089/", token=token, transport=t), t


def test_entry_shape_returns_dataframe(spark):
    c, _ = _client(spark, {"entry": [{"name": "a", "n": 1}, {"name": "b", "n": 2}]})
    df = c.get("services/search/jobs")
    assert {(r.name, r.n) for r in df.collect()} == {("a", 1), ("b", 2)}


def test_results_shape_returns_dataframe(spark):
    c, _ = _client(spark, {"results": [{"ioc": "1.2.3.4", "type": "ip"}]})
    df = c.get("search/results")
    assert df.collect()[0].ioc == "1.2.3.4"


def test_sid_and_key_shapes_return_strings(spark):
    c, _ = _client(spark, {"sid": "1699.123"})
    assert c.post("search/jobs", {"search": "index=ioc"}) == "1699.123"
    c2, _ = _client(spark, {"_key": "abc123"})
    assert c2.post("kv/collection", {"ioc": "x"}) == "abc123"


def test_bare_list_shape_and_unknown_shape(spark):
    c, _ = _client(spark, [{"k": 1}, {"k": 2}])
    assert c.get("kv/list").count() == 2
    c2, _ = _client(spark, {"messages": ["weird"]})
    assert c2.get("whatever") is None


def test_explicit_schema_wins_over_inference(spark):
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    c, _ = _client(spark, {"entry": [{"name": "a", "n": 1}]})
    df = c.get("jobs", schema=schema)
    assert df.schema == schema


def test_auth_header_and_url_join(spark):
    c, t = _client(spark, {"sid": "s"}, token="tok")
    c.get("/path/x")
    method, url, body, headers = t.calls[0]
    assert url == "https://api.example:8089/path/x"
    assert headers["Authorization"] == "Bearer tok"


def test_empty_records_yield_empty_frame(spark):
    c, _ = _client(spark, {"results": []})
    assert c.get("search/results").count() == 0
