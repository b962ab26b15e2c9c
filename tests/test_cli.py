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
