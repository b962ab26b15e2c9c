"""Unit tests for the IOC extraction kernel (SURVEY.md §5.1) against the
defang-variant corpus from the reference README (README.md:33-41) and
FIXTURES.md B3."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.functions import ioc as K


def _extract(spark, body: str) -> dict[str, list[str]]:
    df = spark.createDataFrame([Row(body=body)])
    cols = K.extract_iocs(F.col("body"))
    row = df.select(
        cols["ip"].alias("ip"),
        cols["hash"].alias("hash"),
        cols["url"].alias("url"),
        cols["email"].alias("email"),
    ).first()
    return {k: list(row[k]) for k in ("ip", "hash", "url", "email")}


def test_defanged_ip_extracted_and_refanged(spark):
    got = _extract(spark, "seen at 127[.]0[.]0[.]1 yesterday")
    assert got["ip"] == ["127.0.0.1"]


def test_partially_defanged_ip(spark):
    got = _extract(spark, "host 10.0.0[.]5 contacted")
    assert got["ip"] == ["10.0.0.5"]


def test_plain_ip(spark):
    got = _extract(spark, "plain 192.168.1.1 here")
    assert got["ip"] == ["192.168.1.1"]


def test_out_of_range_octets_accepted_as_reference_does(spark):
    # divergence probe (SURVEY §4.3.6): \d{1,3} admits 999 — parity kept
    got = _extract(spark, "odd 999.1.1.1 value")
    assert got["ip"] == ["999.1.1.1"]


@pytest.mark.parametrize(
    "h,ok",
    [
        ("d41d8cd98f00b204e9800998ecf8427e", True),  # 32 hex (md5)
        ("da39a3ee5e6b4b0d3255bfef95601890afd80709", True),  # 40 hex (sha1)
        ("e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", True),
        ("a" * 48, True),  # in-range oddity
        ("a" * 30, False),  # too short — must NOT match
    ],
)
def test_hash_lengths(spark, h, ok):
    got = _extract(spark, f"hash {h} end")
    assert (h in got["hash"]) is ok


def test_url_defang_variants(spark):
    got = _extract(spark, "visit hxxps://www[.]google[.]com now")
    assert got["url"] == ["https://www.google.com"]


def test_url_meow_scheme(spark):
    got = _extract(spark, "weird meows://weird[.]scheme[.]test stuff")
    # meow scheme is accepted by the pattern but refang leaves it (only
    # hxxp is refanged — h-isac.py:47)
    assert got["url"] == ["meows://weird.scheme.test"]


def test_plain_url_reference_quirk(spark):
    # the reference URL pattern only recognizes hxxp/meow schemes, and its
    # (^|\b) anchor cannot match before '//' after a ':' — so for a plain
    # https URL Python re yields just '//x' (verified against h-isac.py:72
    # semantics).  Exact parity is asserted, quirk and all.
    got = _extract(spark, "ok https://ok.example//x done")
    assert got["url"] == ["//x"]


def test_email_only_defanged_matches(spark):
    got = _extract(spark, "contact my[.]email@somedomain[.]com please")
    assert got["email"] == ["my.email@somedomain.com"]


def test_email_plain_must_not_match(spark):
    # deliberate FP guard: only-defanged emails are captured (README.md:41)
    got = _extract(spark, "contact normal@example.com please")
    assert got["email"] == []


def test_email_mailto_stripped(spark):
    got = _extract(spark, "go mailto:bad[.]actor@evil[.]org now")
    assert got["email"] == ["bad.actor@evil.org"]


def test_reply_chain_truncation(spark):
    body = (
        "fresh ioc 1[.]2[.]3[.]4 here\n"
        "some text\n"
        "quoted From: H-ISAC Amber alert\n"
        "old ioc 5[.]6[.]7[.]8 must not appear"
    )
    got = _extract(spark, body)
    assert got["ip"] == ["1.2.3.4"]


def test_reply_marker_on_first_line_drops_everything(spark):
    body = "From: H-ISAC Amber\nold 5[.]6[.]7[.]8"
    got = _extract(spark, body)
    assert got["ip"] == []


def test_refang_idempotent(spark):
    df = spark.createDataFrame([Row(x="https://www.google.com")])
    out = df.select(K.refang(K.refang(F.col("x"))).alias("r")).first()["r"]
    assert out == "https://www.google.com"


def test_classify_decision_table(spark):
    rows = [
        Row(item="1.2.3.4", want="ip"),
        Row(item="https://evil.example/p", want="url"),
        Row(item="cdn.host.example", want="url"),
        Row(item="d41d8cd98f00b204e9800998ecf8427e", want="hash"),
        Row(item="ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ", want="hash"),  # non-hex, 32 alnum (firehose.py:97)
        Row(item="free text item", want="unmatched"),
        Row(item="http://9.9.9.9/x", want="ip"),  # host-normalized then ip
    ]
    df = spark.createDataFrame(rows)
    got = df.select("want", K.classify_ioc(F.col("item")).alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], r


def test_normalize_ws(spark):
    df = spark.createDataFrame([Row(x="a\r\nb\nc")])
    assert df.select(K.normalize_ws(F.col("x")).alias("y")).first()["y"] == "a b c"
