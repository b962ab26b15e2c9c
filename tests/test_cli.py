"""CLI launcher smoke tests (the reference's two entry points unified —
see cybersecurity_ioc_etl_spark/__main__.py)."""

from __future__ import annotations

from cybersecurity_ioc_etl_spark.__main__ import main


def test_cli_list_names_every_registered_query(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.split()
    import __spark_entry__ as m

    assert set(out) == set(m.queries())


def test_cli_runs_query_against_sf_dir(spark, sf_dir, capsys):
    # `spark` fixture already holds the session; get_spark getOrCreate
    # reuses it, so the CLI runs in-process
    assert main(["ioc_type_counts", sf_dir, "--limit", "5"]) == 0
    assert "ip" in capsys.readouterr().out


def test_cli_unknown_query_is_an_error(capsys):
    assert main(["definitely_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_batch_fork(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "cli_batch")
    assert main(["--batch", out, sf_dir]) == 0
    assert "n_iocs" in capsys.readouterr().out
    assert spark.read.option("header", True).csv(f"{out}/iocs_csv").count() > 0


def test_cli_stream_fork(spark, tmp_path, capsys):
    import json

    src = tmp_path / "drops"; src.mkdir()
    tweet = {"created_at": "Mon Apr 01", "id": 7, "text": "bad ip 10.0.0.7 here",
             "retweeted": False, "user": {"screen_name": "u"},
             "entities": {"hashtags": [], "urls": []}}
    (src / "t1.json").write_text(json.dumps(tweet) + "\n")
    out = str(tmp_path / "cli_stream")
    assert main(["--stream", str(src), out]) == 0
    assert "IOC rows" in capsys.readouterr().out
    assert spark.read.parquet(f"{out}/iocs").count() >= 1


def test_cli_export_corpus_fork(spark, sf_dir, tmp_path, capsys):
    from cybersecurity_ioc_etl_spark.__main__ import main

    out = str(tmp_path / "corpus")
    assert main([sf_dir, "--export-corpus", out]) == 0
    assert "n_chunks" in capsys.readouterr().out
    assert spark.read.parquet(f"{out}/chunks").count() > 0
