"""Probe every registered query against tables with injected NULLs.

Real 100 TB feeds carry NULLs the synthetic fixtures don't: missing
text, unknown language, absent embeddings, null measures.  Operators
must (a) not crash and (b) make the SAME null-handling decision as the
oracle — NULL propagation is where Spark and DuckDB semantics can
silently diverge (three-valued filters, NULL sort position, aggregate
skipping, array functions over NULL).

This probe copies the sf0.001 fixture, nulls out a deterministic ~3% of
rows in the NON-KEY columns listed below (keys stay intact so join
cardinalities remain meaningful), then runs each query on Spark and its
oracle on DuckDB and reports crash / mismatch / ok.

Usage: python tools/null_probe.py [names...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# table -> (key column, columns to null where key % 31 == 0)
NULL_PLAN = {
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
    "embeddings": ("vec_id", ["embedding", "label"]),
    "lineitem": ("l_orderkey", ["l_quantity", "l_shipdate", "l_comment"]),
    "orders": ("o_orderkey", ["o_totalprice", "o_comment"]),
    "customer": ("c_custkey", ["c_acctbal", "c_comment"]),
    "part": ("p_partkey", ["p_name", "p_retailprice"]),
    "supplier": ("s_suppkey", ["s_comment"]),
    # ts stays non-null: a null event time is dropped at ingest (the
    # watermark contract); payload/measure nulls are the realistic case
    "events": ("event_id", ["props", "value"]),
}

NULL_DIR = "/tmp/sf_nulls"


def build_null_dir(src_dir: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(NULL_DIR, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{src_dir}/{t}.parquet")
        if t in NULL_PLAN:
            key, cols = NULL_PLAN[t]
            keys = tab[key].to_numpy(zero_copy_only=False)
            mask = pa.array(keys % 31 == 0)
            for c in cols:
                if c not in tab.column_names:
                    continue
                i = tab.column_names.index(c)
                field = tab.schema.field(i).with_nullable(True)
                nulled = pc.if_else(
                    mask, pa.nulls(len(tab), type=field.type), tab[c]
                )
                tab = tab.set_column(i, field, nulled)
        pq.write_table(tab, f"{NULL_DIR}/{t}.parquet")
    return NULL_DIR


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.17g}"
    return "NULL" if v is None else str(v)


def main() -> int:
    import __spark_entry__ as entrymod
    from cybersecurity_ioc_etl_spark.session import get_spark

    only = set(sys.argv[1:])
    build_null_dir()
    spark = get_spark("null-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    n_crash = n_mismatch = n_ok = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, NULL_DIR)
            srows = sorted(tuple(_norm(v) for v in r) for r in sdf.collect())
        except Exception:
            n_crash += 1
            print(f"CRASH-SPARK {name}", flush=True)
            traceback.print_exc(limit=3)
            continue
        if name not in oracles:
            n_ok += 1
            print(f"ok(rows-only) {name}: {len(srows)} rows", flush=True)
            continue
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{NULL_DIR}/{t}.parquet'"
                )
            drows = sorted(
                tuple(_norm(v) for v in row)
                for row in con.execute(oracles[name]).fetchall()
            )
        except Exception:
            n_crash += 1
            print(f"CRASH-ORACLE {name}", flush=True)
            traceback.print_exc(limit=3)
            continue
        finally:
            con.close()
        if srows != drows:
            n_mismatch += 1
            diffs = [
                (a, b) for a, b in zip(srows, drows) if a != b
            ][:2]
            print(
                f"MISMATCH {name}: n={len(srows)}/{len(drows)} "
                f"first_diffs={diffs}",
                flush=True,
            )
        else:
            n_ok += 1
            print(f"ok {name}: {len(srows)} rows", flush=True)
    print(f"\nnull-probe: {n_ok} ok, {n_mismatch} mismatch, {n_crash} crash")
    return 1 if (n_crash or n_mismatch) else 0


if __name__ == "__main__":
    raise SystemExit(main())
