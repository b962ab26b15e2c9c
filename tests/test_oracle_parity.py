"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and order-insensitive
values.  Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver's exact SF.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision: the driver hashes exact values, so the decimal
        # accumulation contract must make Spark and DuckDB bit-identical
        return f"{v:.17g}"
    if v is None:
        return "NULL"
    return str(v)


def _rowset(rows, cols):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


# dtype alignment: DuckDB type → the Spark dtype an aligned query must
# declare.  Anything not in this map (HUGEINT from SUM(BIGINT), DECIMAL
# from decimal math, INTEGER vs bigint drift) must be CAST in the oracle
# or the Spark query until both sides agree.
_DUCK_TO_SPARK = {"BIGINT": "bigint", "DOUBLE": "double", "VARCHAR": "string",
                  "INTEGER": "int", "BOOLEAN": "boolean"}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    stypes = dict(sdf.dtypes)
    srows = [r.asDict() for r in sdf.collect()]

    con = _duck(sf_dir)
    try:
        rel = con.sql(ORACLES[name])
        for c, dt in zip(rel.columns, [str(t) for t in rel.types]):
            assert _DUCK_TO_SPARK.get(dt, dt) == stypes.get(c), (
                f"{name}.{c}: duckdb type {dt} vs spark {stypes.get(c)} — "
                "cast one side (see map above)"
            )
        res = con.execute(ORACLES[name])
        dcols = [d[0] for d in res.description]
        drows = [dict(zip(dcols, row)) for row in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    cols = sorted(scols)
    sset, dset = _rowset(srows, cols), _rowset(drows, cols)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
