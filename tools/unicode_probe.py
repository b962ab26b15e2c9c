"""Probe text operators against non-ASCII content.

The fixtures are pure ASCII, so Java-regex vs RE2 and JVM vs utf8proc
string semantics are never exercised by the oracle gate.  Real corpora
are full of NBSP, combining marks, case-folding specials (ß, Σ, İ) and
emoji.  This probe rewrites a deterministic ~3% of `documents.text`
(and `part.p_name`) to unicode-rich strings and diffs every query
against its oracle — divergences here are ENGINE-SEMANTICS findings
(e.g. Java `\\s` vs RE2 `\\s`, lower() casefolding) to be normalized
in the operator or documented.

Usage: python tools/unicode_probe.py [names...]
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

# rotated unicode payloads — NBSP whitespace, casefold specials,
# combining marks, CJK (no whitespace at all), emoji, RTL
_PAYLOADS = [
    "café straße GROSSE ß test nbsp emsp word",
    "Σίσυφος Σ İstanbul i̇ done",
    "étude combining å ring vs å precomposed",
    "日本語のテキストには空白がない 中文文本也没有空格",
    "emoji 🎉🚀 zwj 👩‍💻 family test",
    "مرحبا rtl text mixed with ltr words",
]


NULL_DIR = "/tmp/sf_unicode"


def build_unicode_dir(src_dir: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(NULL_DIR, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{src_dir}/{t}.parquet")
        plan = {
            "documents": ("doc_id", "text"),
            "part": ("p_partkey", "p_name"),
            # valid JSON with unicode content: stresses from_json /
            # VARIANT vs DuckDB's JSON functions on non-ASCII payloads
            "events": ("event_id", "props"),
        }
        if t in plan:
            key_col, txt_col = plan[t]
            keys = tab[key_col].to_numpy(zero_copy_only=False)
            texts = tab[txt_col].to_pylist()
            if t == "events":
                new = [
                    '{"k": 7, "note": "' + _PAYLOADS[k % len(_PAYLOADS)] + '"}'
                    if k % 37 == 0
                    else v
                    for k, v in zip(keys, texts)
                ]
            else:
                new = [
                    _PAYLOADS[k % len(_PAYLOADS)] if k % 37 == 0 else v
                    for k, v in zip(keys, texts)
                ]
            i = tab.column_names.index(txt_col)
            tab = tab.set_column(i, tab.schema.field(i), pa.array(new, pa.string()))
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
    build_unicode_dir()
    spark = get_spark("unicode-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    n_crash = n_mismatch = n_ok = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, NULL_DIR)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(_norm(r[c]) for c in cols) for r in sdf.collect()
            )
        except Exception:
            n_crash += 1
            print(f"CRASH-SPARK {name}", flush=True)
            traceback.print_exc(limit=3)
            continue
        if name not in oracles:
            n_ok += 1
            continue
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{NULL_DIR}/{t}.parquet'"
                )
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = sorted(
                tuple(_norm(row[dcols.index(c)]) for c in cols)
                for row in res.fetchall()
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
            diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:2]
            print(
                f"MISMATCH {name}: n={len(srows)}/{len(drows)} "
                f"first_diffs={diffs}",
                flush=True,
            )
        else:
            n_ok += 1
    print(f"\nunicode-probe: {n_ok} ok, {n_mismatch} mismatch, {n_crash} crash")
    return 1 if (n_crash or n_mismatch) else 0


if __name__ == "__main__":
    raise SystemExit(main())
