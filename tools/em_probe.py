#!/usr/bin/env python3
"""Fellegi-Sunter EM CONVERGENCE probe (the tools/louvain_probe.py
pattern): run the pattern-census EM loop far past the production
unroll — on DuckDB, since the recursion is the oracle's own CTE chain
— and print, per fixture, the quantized log-likelihood trajectory and
the stop round under the per-pair grain tolerance (first round whose
mean per-pair ll improvement drops below one 1e-6-nat grain, i.e.
dll <= n_pairs).  Sizes the bounded unroll (_EM_ROUNDS) for
linkage_em_converged: if a future fixture's stop round climbs past the
unroll, this probe flags it and the query (plus its oracle) grows
rounds.

Also shows why the Louvain strict dll<=0 rule is the wrong transfer:
EM's geometric tail keeps the exact-integer ll creeping upward, so the
strict plateau lands at rounds 31/28/15 (sf0.001/0.01/0.1) — hugging
the unroll bound and spending rounds on sub-grain motion — while the
grain tolerance stops at 28/21/10 with the same determinism.

Usage: python tools/em_probe.py [sf_dirs...] [--max-rounds 40]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402

from cybersecurity_ioc_etl_spark.operators.linkage import (  # noqa: E402
    _EM_G,
    _EM_M0,
    _EM_P0,
    _EM_ROUNDS,
    _EM_U0,
    _LNK_FIELDS,
    _LNK_PAIRS_SQL,
    _em_estep_sql,
    _em_mstep_sql,
)

_TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def _probe_sql(rounds: int) -> str:
    ll = (
        "SELECT CAST(SUM(n * CAST(FLOOR(1000000.0"
        " * ln(CAST(mix AS DOUBLE))) AS BIGINT)) AS BIGINT) AS v FROM"
    )
    blocks = [
        f"""p0 AS (SELECT CAST({_EM_P0} AS BIGINT) AS qp,
  {', '.join(
      f'CAST({_EM_M0} AS BIGINT) AS qm_{f},'
      f' CAST({_EM_U0} AS BIGINT) AS qu_{f}'
      for f in _LNK_FIELDS)})"""
    ]
    for k in range(rounds + 1):
        blocks.append(_em_estep_sql(f"p{k}", f"e{k}"))
        blocks.append(f"ll{k} AS ({ll} e{k})")
        if k < rounds:
            blocks.append(_em_mstep_sql(f"e{k}", f"m{k}", f"p{k + 1}"))
    rows = " UNION ALL ".join(
        f"SELECT {k} AS round, (SELECT v FROM ll{k}) AS ll_num"
        for k in range(rounds + 1)
    )
    return f"""
WITH {_LNK_PAIRS_SQL},
pat AS MATERIALIZED (
  SELECT a_name, a_seg, a_bal,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(is_match) AS BIGINT) AS n_true
  FROM pairs GROUP BY 1, 2, 3
),
na AS MATERIALIZED (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_all FROM pat
),
{','.join(blocks)},
t AS MATERIALIZED ({rows})
SELECT round, ll_num,
  ll_num - LAG(ll_num) OVER (ORDER BY round) AS dll,
  (SELECT n_all FROM na) AS n_all
FROM t ORDER BY round
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "sf_dirs",
        nargs="*",
        default=[
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
    )
    ap.add_argument("--max-rounds", type=int, default=40)
    args = ap.parse_args()
    sql = _probe_sql(args.max_rounds)
    ok = True
    for sf_dir in args.sf_dirs:
        con = duckdb.connect()
        try:
            for t in _TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS"
                    f" SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            res = con.execute(sql).fetchall()
        finally:
            con.close()
        n_all = res[0][3]
        stop = next(
            (r[0] for r in res if r[2] is not None and r[2] <= r[3]),
            None,
        )
        strict = next(
            (r[0] for r in res if r[2] is not None and r[2] <= 0), None
        )
        print(
            f"{sf_dir}: n_pairs={n_all} grain_stop_round={stop}"
            f" strict_dll<=0_round={strict}"
            f" (unroll _EM_ROUNDS={_EM_ROUNDS})"
        )
        for r in res[: (stop or args.max_rounds) + 2]:
            print(f"  round {r[0]:2d} ll={r[1]} dll={r[2]}")
        if stop is None or stop > _EM_ROUNDS:
            ok = False
            print(
                f"  !! stop round {stop} exceeds _EM_ROUNDS="
                f"{_EM_ROUNDS} — grow the unroll"
            )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
