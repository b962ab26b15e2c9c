"""HTTP enrichment stage tests (S4/T16, firehose.py:74-80): DOM parsing
parity, failure tolerance, Arrow-batch plumbing, and the fetch-once
(distinct-URL) contract."""

from __future__ import annotations

from cybersecurity_ioc_etl_spark.enrichment import (
    fake_fetch,
    http_fetch,
    parse_paste_items,
    scrape_urls,
)

_PAGE = """
<html><body>
<div id="other"><ol><li><div>NOT-THIS</div></li></ol></div>
<div id="code_frame2"><ol>
  <li><div>1.2.3.4</div></li>
  <li class="alt"><div> deadbeef </div></li>
</ol></div>
</body></html>
"""


def test_parse_selects_code_frame2_items_only():
    # items before the frame ("NOT-THIS") must not leak in
    assert parse_paste_items(_PAGE) == ["1.2.3.4", "deadbeef"]


def test_parse_empty_and_frameless_pages():
    assert parse_paste_items("") == []
    assert parse_paste_items("<p>no list here</p>") == []


def test_http_fetch_failure_returns_none_not_raise():
    assert http_fetch("http://127.0.0.1:1/unreachable", timeout=0.2) is None


def test_fake_fetch_is_deterministic_and_parseable():
    page = fake_fetch("https://pastebin.example/raw/abc")
    assert page == fake_fetch("https://pastebin.example/raw/abc")
    items = parse_paste_items(page)
    assert len(items) == 2
    assert items[0].count(".") == 3  # the IP
    assert len(items[1]) == 32  # the md5 hash


def test_scrape_urls_one_row_per_item(spark):
    urls = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/2",)], ["url"]
    )
    rows = scrape_urls(urls, fetcher=fake_fetch).collect()
    assert len(rows) == 4  # 2 urls x 2 items
    assert {r.url for r in rows} == {"https://a.example/1", "https://a.example/2"}


def test_scrape_urls_failed_fetch_yields_no_rows(spark):
    urls = spark.createDataFrame([("u1",), ("u2",)], ["url"])
    rows = scrape_urls(urls, fetcher=lambda u: None).collect()
    assert rows == []
