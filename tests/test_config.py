"""Config validation (SURVEY §2.1 S10): set-diff key checking with the
reference's semantics — missing keys raise, extension and existence are
enforced up front, and the reference's ``None.endswith`` crash path
(h-isac.py:210) is a clean error here."""

from __future__ import annotations

import json

import pytest

from cybersecurity_ioc_etl_spark.config import load_config, validate_config


def test_validate_passes_through_complete_config():
    cfg = {"url": "http://x", "token": "t", "extra": 1}
    assert validate_config(cfg, ("url", "token")) is cfg


def test_validate_names_all_missing_keys_sorted():
    with pytest.raises(KeyError, match="api_key, url"):
        validate_config({"token": "t"}, ("url", "token", "api_key"), "splunk cfg")


def test_validate_empty_required_accepts_anything():
    assert validate_config({}, ()) == {}


def test_load_rejects_non_json_extension(tmp_path):
    p = tmp_path / "creds.yaml"
    p.write_text("{}")
    with pytest.raises(ValueError, match="must be a JSON file"):
        load_config(str(p))


def test_load_missing_file_uses_reference_wording(tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        load_config(str(tmp_path / "absent.json"))


def test_load_rejects_non_object_top_level(tmp_path):
    p = tmp_path / "creds.json"
    p.write_text("[1, 2]")
    with pytest.raises(ValueError, match="JSON object"):
        load_config(str(p))


def test_load_validates_required_keys(tmp_path):
    p = tmp_path / "creds.json"
    p.write_text(json.dumps({"url": "http://x"}))
    assert load_config(str(p), ("url",)) == {"url": "http://x"}
    with pytest.raises(KeyError, match="token"):
        load_config(str(p), ("url", "token"))


def test_splunkkv_reader_requires_url():
    """The DataSource V2 surface routes its options through
    validate_config — a missing url fails when the reader is built
    (plan time), not at job launch."""
    from pyspark.sql.types import StructType

    from cybersecurity_ioc_etl_spark.sources.kvstore_datasource import (
        KVStoreReader,
    )

    with pytest.raises(KeyError, match="url"):
        KVStoreReader({}, StructType([]))
