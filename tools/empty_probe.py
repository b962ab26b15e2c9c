"""Probe every registered query against SCHEMA-ONLY empty tables.

A 100 TB pipeline constantly meets empty slices — a new source with no
documents yet, a partition with every row filtered out, a backfill over
a quiet hour.  Operators must return empty (or their well-defined
zero-row aggregate) instead of crashing, and must agree with the oracle
about WHICH of those it is.  This probe builds an empty twin of the
fixture (identical arrow schemas, zero rows), runs each query on Spark
and its oracle on DuckDB, and reports crash / mismatch / ok per query.

Usage: python tools/empty_probe.py [names...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

EMPTY_DIR = "/tmp/sf_empty"


def build_empty_dir(src_dir: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(EMPTY_DIR, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(f"{src_dir}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{EMPTY_DIR}/{t}.parquet")
    return EMPTY_DIR


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    return "NULL" if v is None else str(v)


def main() -> int:
    import __spark_entry__ as entrymod
    from cybersecurity_ioc_etl_spark.session import get_spark

    only = set(sys.argv[1:])
    build_empty_dir()
    spark = get_spark("empty-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    n_crash = n_mismatch = n_ok = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, EMPTY_DIR)
            srows = sorted(
                tuple(_norm(v) for v in r) for r in sdf.collect()
            )
        except Exception:
            n_crash += 1
            print(f"CRASH-SPARK {name}")
            traceback.print_exc(limit=3)
            continue
        if name not in oracles:
            n_ok += 1
            print(f"ok(rows-only) {name}: {len(srows)} rows")
            continue
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{EMPTY_DIR}/{t}.parquet'"
                )
            drows = sorted(
                tuple(_norm(v) for v in row)
                for row in con.execute(oracles[name]).fetchall()
            )
        except Exception:
            n_crash += 1
            print(f"CRASH-ORACLE {name}")
            traceback.print_exc(limit=3)
            continue
        finally:
            con.close()
        if srows != drows:
            n_mismatch += 1
            print(f"MISMATCH {name}: spark={srows[:3]} oracle={drows[:3]}")
        else:
            n_ok += 1
            print(f"ok {name}: {len(srows)} rows")
    print(f"\nempty-probe: {n_ok} ok, {n_mismatch} mismatch, {n_crash} crash")
    return 1 if (n_crash or n_mismatch) else 0


if __name__ == "__main__":
    raise SystemExit(main())
