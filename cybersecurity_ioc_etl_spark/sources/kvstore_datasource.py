"""First-class KV-store data source — ``spark.read.format("splunkkv")``.

The reference talks to the Splunk KV store through a hand-rolled REST
wrapper (`splunk2.py:49-71`) driven row-at-a-time from the ETL scripts
(`h-isac.py:31-43`, `firehose.py:131-133`).  SURVEY §2.1 S9 maps that to
"a custom DataSource V2 if made first-class" — this module IS that
source, on PySpark 4's Python DataSource API:

- **partition-parallel paged reads**: the collection is split into
  ``numPartitions`` contiguous skip/limit pages, one HTTP request per
  executor task — the 1-thread pull loop of `splunk2.py` becomes a
  cluster-wide parallel scan;
- **source-side filter pushdown** (``pushFilters``): ``EqualTo``/``In``
  predicates on flat columns translate into the KV ``query`` JSON the
  server evaluates — the exact move the reference makes with its DASL
  ``messages.Restrict`` pushdown into Outlook (`h-isac.py:152-153`,
  SURVEY §2.1 S2), now done by Catalyst automatically;
- **batched writes**: ``df.write.format("splunkkv")`` buffers 1 000
  records per POST — the reference's hard Splunk ``batch_save`` cap
  (`h-isac.py:34-36`) enforced per partition, concurrently.

Transport dispatches on URL scheme.  ``https?://`` issues real requests
(driver- and executor-side, stdlib only).  A local-directory URL serves
the collection from ``<dir>/collection.json`` and applies query/paging
server-side, logging every request to ``<dir>/_access_log/`` — tests
assert pushdown and partitioning from that log, no network needed.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Any, Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StringType, StructField, StructType

from ..config import validate_config

# canonical 8-column IOC contract (README.md:13-29 of the reference);
# the stream path's 6-field drift (SURVEY §1.1) surfaces as NULLs, not
# schema mismatch.
IOC_KV_SCHEMA = StructType(
    [
        StructField(name, StringType())
        for name in (
            "id",
            "date_added",
            "date_received",
            "ioc",
            "platform",
            "source",
            "tag",
            "type",
        )
    ]
)


# --- transport ------------------------------------------------------------


def _is_http(url: str) -> bool:
    return url.startswith("http://") or url.startswith("https://")


def _local_dir(url: str) -> str:
    return url[len("file://") :] if url.startswith("file://") else url


def _match(row: dict, query: dict) -> bool:
    for col, cond in query.items():
        if isinstance(cond, dict) and "$in" in cond:
            if row.get(col) not in cond["$in"]:
                return False
        elif row.get(col) != cond:
            return False
    return True


def _serve_local(url: str, params: dict) -> list[dict]:
    """Local stand-in for the KV endpoint: serve <dir>/collection.json,
    applying query/skip/limit exactly as the server would, and log the
    request (the observable tests assert pushdown against)."""
    d = _local_dir(url)
    log_dir = os.path.join(d, "_access_log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"req-{uuid.uuid4().hex}.json"), "w") as f:
        json.dump(params, f)
    with open(os.path.join(d, "collection.json")) as f:
        rows = json.load(f)
    query = json.loads(params.get("query", "{}"))
    rows = [r for r in rows if _match(r, query)]
    if params.get("count_only"):
        return [{"count": len(rows)}]
    # honor the explicit sort the reader sends with every paged request —
    # skip/limit paging is only correct under a total order
    sort_field = params.get("sort")
    if sort_field:
        rows = sorted(rows, key=lambda r: (r.get(sort_field) is None, str(r.get(sort_field))))
    skip, limit = int(params.get("skip", 0)), params.get("limit")
    return rows[skip : skip + int(limit)] if limit is not None else rows[skip:]


def _serve_http(url: str, params: dict) -> list[dict]:
    import urllib.parse
    import urllib.request

    q = urllib.parse.urlencode({k: str(v) for k, v in params.items()})
    req = urllib.request.Request(f"{url}?{q}", method="GET")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read().decode("utf-8", errors="replace"))


def _serve(url: str, params: dict) -> list[dict]:
    return _serve_http(url, params) if _is_http(url) else _serve_local(url, params)


def _post(url: str, batch: list[dict]) -> None:
    """One batch_save POST (≤ cap rows — h-isac.py:34-36)."""
    if _is_http(url):
        import urllib.request

        req = urllib.request.Request(
            f"{url}/batch_save",
            data=json.dumps(batch).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30):
            return
    d = _local_dir(url)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"post-{uuid.uuid4().hex}.json"), "w") as f:
        json.dump(batch, f)


# --- reader ---------------------------------------------------------------


@dataclass
class _Page(InputPartition):
    skip: int
    limit: int


class KVStoreReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        validate_config(options, ("url",), context="splunkkv reader options")
        self.url = options["url"]
        self.num_partitions = int(options.get("numpartitions", 8))
        self.sort_field = options.get("sortfield", "_key")
        self.fields = [f.name for f in schema.fields]
        self.query: dict[str, Any] = {}

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        for flt in filters:
            if isinstance(flt, EqualTo) and len(flt.attribute) == 1:
                self.query[flt.attribute[0]] = flt.value
            elif isinstance(flt, In) and len(flt.attribute) == 1:
                self.query[flt.attribute[0]] = {"$in": list(flt.value)}
            else:
                yield flt  # Spark evaluates the rest post-scan

    def _params(self, **extra: Any) -> dict:
        p: dict[str, Any] = {"query": json.dumps(self.query, sort_keys=True)}
        p.update(extra)
        return p

    def partitions(self) -> List[InputPartition]:
        # one cheap count request at planning time (the filtered count —
        # pushdown shrinks the scan, not just the rows returned), then
        # contiguous skip/limit pages, one per task.
        total = _serve(self.url, self._params(count_only=1))[0]["count"]
        n = max(1, min(self.num_partitions, total)) if total else 1
        base, rem = divmod(total, n)
        pages, skip = [], 0
        for i in range(n):
            size = base + (1 if i < rem else 0)
            pages.append(_Page(skip=skip, limit=max(size, 0)))
            skip += size
        return pages

    def read(self, partition: _Page) -> Iterator[tuple]:
        # every paged request carries an explicit sort: skip/limit pages
        # only partition the collection correctly under a total order (a
        # KV endpoint guarantees no default ordering).  Paging further
        # assumes the collection is static between partitions() and
        # read() — a mutated collection can still shift rows across page
        # boundaries, as with any snapshot-less REST source.
        rows = _serve(
            self.url,
            self._params(skip=partition.skip, limit=partition.limit, sort=self.sort_field),
        )
        for r in rows:
            yield tuple(r.get(f) for f in self.fields)


# --- writer ---------------------------------------------------------------


@dataclass
class _BatchesWritten(WriterCommitMessage):
    rows: int
    posts: int


class KVStoreWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        validate_config(options, ("url",), context="splunkkv writer options")
        self.url = options["url"]
        self.batch_cap = int(options.get("batchcap", 1000))

    def write(self, iterator: Iterator[Row]) -> _BatchesWritten:
        buf: list[dict] = []
        rows = posts = 0
        for row in iterator:
            buf.append(row.asDict())
            rows += 1
            if len(buf) >= self.batch_cap:
                _post(self.url, buf)
                posts += 1
                buf = []
        if buf:
            _post(self.url, buf)
            posts += 1
        return _BatchesWritten(rows=rows, posts=posts)

    def commit(self, messages: List[_BatchesWritten | None]) -> None:
        ok = [m for m in messages if m is not None]
        if not _is_http(self.url):
            d = _local_dir(self.url)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "_manifest.json"), "w") as f:
                json.dump(
                    {
                        "rows": sum(m.rows for m in ok),
                        "posts": sum(m.posts for m in ok),
                        "partitions": len(ok),
                    },
                    f,
                )

    def abort(self, messages: List[_BatchesWritten | None]) -> None:
        pass  # KV batch_save has no transaction to roll back; retries are idempotent by _key


# --- the data source ------------------------------------------------------


class KVStoreDataSource(DataSource):
    """``spark.read.format("splunkkv").option("url", ...)`` — see module
    docstring.  Options: ``url`` (required), ``numPartitions`` (read
    parallelism, default 8), ``sortField`` (total order for paged reads,
    default ``_key``), ``batchCap`` (write batch size, default 1 000 =
    Splunk's batch_save cap).  Requires
    ``spark.sql.python.filterPushdown.enabled=true`` (set by
    ``session.get_spark``) because the reader implements pushFilters."""

    @classmethod
    def name(cls) -> str:
        return "splunkkv"

    def schema(self) -> StructType:
        return IOC_KV_SCHEMA

    def reader(self, schema: StructType) -> KVStoreReader:
        return KVStoreReader(dict(self.options), schema)

    def writer(self, schema: StructType, overwrite: bool) -> KVStoreWriter:
        if overwrite:
            # batch_save only upserts by _key; silently appending under
            # mode("overwrite") would lie about the sink's contents.
            raise NotImplementedError(
                "splunkkv sink is append-only (KV batch_save upserts by _key); "
                "use mode('append'), or delete the collection out-of-band first"
            )
        return KVStoreWriter(dict(self.options))
