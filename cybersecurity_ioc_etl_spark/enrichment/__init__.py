"""HTTP enrichment stage (SURVEY.md §2.1 S4, §2.8 T16)."""

from .http_scrape import (  # noqa: F401
    fake_fetch,
    http_fetch,
    parse_paste_items,
    scrape_urls,
)
