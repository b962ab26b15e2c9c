"""Generic REST query client → DataFrame (SURVEY.md §2.1 S9, §3.3).

The reference's ``splunk2.API`` wraps a Splunk management endpoint:
authenticate, GET/POST any path, then shape-dispatch the JSON response
into a pandas frame / sid string / key string (splunk2.py:22-47).  Here
the same surface returns Spark DataFrames:

- transport is injectable (tests use fakes; ``urllib_transport`` is the
  stdlib default) and runs DRIVER-side — REST control-plane responses
  are small; bulk data belongs in a real source (parquet/Kafka), never
  behind a paginating HTTP loop.
- response shape dispatch mirrors splunk2.py's union-typed return, but
  each DataFrame branch accepts an optional explicit ``StructType`` —
  the dynamic-schema hazard SURVEY §3.3 flags.  Without one, the schema
  is inferred from the JSON (acceptable for interactive use, discouraged
  in pipelines).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# transport: (method, url, body: dict | None, headers) -> response text
Transport = Callable[[str, str, dict | None, dict], str]


def urllib_transport(
    method: str, url: str, body: dict | None, headers: dict
) -> str:
    """stdlib transport.  verify-everything by default — the reference
    disables TLS verification (splunk2.py:57-63 verify=False); we don't."""
    import urllib.request

    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read().decode("utf-8", errors="replace")


class RestClient:
    """splunk2.API surface on Spark (splunk2.py:12-71)."""

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        token: str | None = None,
        transport: Transport = urllib_transport,
    ):
        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.transport = transport

    @classmethod
    def from_config(
        cls,
        spark: SparkSession,
        config_file: str,
        transport: Transport = urllib_transport,
    ) -> "RestClient":
        """Build a client from a JSON config file with the reference's
        set-diff key validation (`h-isac.py:20-22`, S10): ``base_url``
        is required, ``token`` optional."""
        from ..config import load_config

        cfg = load_config(config_file, required=("base_url",), context="rest config")
        return cls(spark, cfg["base_url"], token=cfg.get("token"), transport=transport)

    def _headers(self) -> dict:
        h = {"Content-Type": "application/json"}
        if self.token:
            h["Authorization"] = f"Bearer {self.token}"
        return h

    def _request(self, method: str, path: str, body: dict | None = None) -> Any:
        url = f"{self.base_url}/{path.lstrip('/')}"
        text = self.transport(method, url, body, self._headers())
        return json.loads(text)

    def get(self, path: str, schema: T.StructType | None = None):
        return self.parse(self._request("GET", path), schema)

    def post(self, path: str, body: dict | None = None, schema: T.StructType | None = None):
        return self.parse(self._request("POST", path, body), schema)

    def parse(
        self, payload: Any, schema: T.StructType | None = None
    ) -> DataFrame | str | None:
        """Shape dispatch, mirroring splunk2.py:22-47:
        {'entry': [...]} → DataFrame | {'results': [...]} → DataFrame |
        {'sid': s} → str | {'_key': k} → str | [...] → DataFrame |
        else → None."""
        if isinstance(payload, dict):
            if "entry" in payload:
                return self._df(payload["entry"], schema)
            if "results" in payload:
                return self._df(payload["results"], schema)
            if "sid" in payload:
                return str(payload["sid"])
            if "_key" in payload:
                return str(payload["_key"])
            return None
        if isinstance(payload, list):
            return self._df(payload, schema)
        return None

    def _df(self, records: list, schema: T.StructType | None) -> DataFrame:
        if schema is not None:
            return self.spark.createDataFrame(records, schema=schema)
        if not records:
            # inference has nothing to infer from — empty single-column
            # frame, mirroring pandas' empty-DataFrame behavior
            return self.spark.createDataFrame(
                [], schema=T.StructType([T.StructField("value", T.StringType())])
            )
        # driver-side inference over small control-plane responses;
        # json round-trip lets Spark infer nested structs uniformly
        rdd = self.spark.sparkContext.parallelize([json.dumps(r) for r in records])
        return self.spark.read.json(rdd)
