"""HTTP enrichment: fetch pastebin-style pages referenced by feed items
and extract the IOC list they contain — the reference's `get_iocs`
(firehose.py:74-80) re-architected for scale.

The reference fetches synchronously INSIDE the stream callback, blocking
ingest on every paste (firehose.py:76) and re-fetching duplicate links.
Here enrichment is a separate dataflow stage:

    distinct(urls)  →  mapInPandas(fetch+parse)  →  join back on url

- **distinct first**: each URL is fetched once, however many tweets cite
  it (the reference fetches per-tweet).
- **mapInPandas**: the ONLY Python stage in the engine besides multimodal
  decode; Arrow-batched, runs executor-parallel, and the scan/join around
  it stays JVM-side.
- **injectable transport**: `fetcher(url) -> html | None`.  `http_fetch`
  is the real one (stdlib urllib; swap in an async/rate-limited client
  for production).  `fake_fetch` derives a deterministic page from
  md5(url) so the full pipeline is testable — and oracle-checkable —
  hermetically.
- **join back**: the scraped table is tiny relative to the feed → Spark
  broadcasts it; tweets keep flowing while enrichment of new URLs runs.

The reference parses `#code_frame2 ol > li > div` with BeautifulSoup
(firehose.py:77-79); this container has no bs4, so `parse_paste_items`
is a regex equivalent over the same structure with the bs4 integration
point documented.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ITEM_RE = re.compile(r"<li[^>]*>\s*<div[^>]*>(.*?)</div>", re.S)

SCRAPED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("item", T.StringType(), False),
    ]
)


def http_fetch(url: str, timeout: float = 10.0) -> str | None:
    """Real transport (urllib, stdlib).  Production swaps this for a
    pooled/rate-limited client; the pipeline shape does not change."""
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read().decode("utf-8", errors="replace")
    except Exception:
        return None  # fetch failures yield no rows, never a task failure


def fake_fetch(url: str) -> str:
    """Deterministic stand-in page: one IP and one hash derived from
    md5(url), rendered in the pastebin DOM shape the parser expects.
    Mirrored in the DuckDB oracle (ioc_queries.q_enrichment_scraped_iocs)
    so the whole fetch→parse→classify→join pipeline is value-checked."""
    h = hashlib.md5(url.encode()).hexdigest()
    ip = ".".join(str(int(h[2 * i : 2 * i + 2], 16)) for i in range(4))
    return (
        '<div id="code_frame2"><ol>'
        f"<li><div>{ip}</div></li>"
        f"<li><div>{h}</div></li>"
        "</ol></div>"
    )


def parse_paste_items(html: str) -> list[str]:
    """`#code_frame2 ol > li > div` item texts (firehose.py:77-79).
    Regex equivalent of the reference's bs4 select; wire bs4 here if the
    deployment image has it — the stage signature is unchanged."""
    if not html:
        return []
    frame = html.split('id="code_frame2"', 1)
    scope = frame[1] if len(frame) > 1 else html
    return [m.strip() for m in _ITEM_RE.findall(scope)]


def scrape_urls(
    urls: DataFrame,
    fetcher: Callable[[str], str | None] = http_fetch,
    url_col: str = "url",
) -> DataFrame:
    """distinct URLs → (url, item) rows via Arrow-batched mapInPandas.

    Input should already be deduplicated (`urls.select(url).distinct()`)
    — fetching is the expensive side effect, so the dedup shuffle of tiny
    url strings is always worth it.  Classification of items happens
    AFTER this stage with the JVM-side `classify_ioc` expression.

    NULL urls are dropped JVM-side before the Python boundary: shipping
    them would crash the fetcher (None.encode) for rows that can yield
    no page anyway (tools/null_probe.py finding)."""
    urls = urls.filter(F.col(url_col).isNotNull())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_url: list[str] = []
            out_item: list[str] = []
            for url in pdf[url_col]:
                for item in parse_paste_items(fetcher(url) or ""):
                    out_url.append(url)
                    out_item.append(item)
            yield pd.DataFrame({"url": out_url, "item": out_item})

    return urls.mapInPandas(run, schema=SCRAPED_SCHEMA)
