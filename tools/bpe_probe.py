#!/usr/bin/env python3
"""BPE trainer depth probe: run 32 merges at sf0.1 (8x the
bpe_n_merges query's oracle-bounded 4) and record the convergence /
vocab-growth receipt for SCALE.md.

The laws to pin:
- the winning pair's count is (weakly) DECREASING round over round —
  each merge consumes the most frequent adjacency, so the trainer
  converges toward singleton pairs rather than oscillating;
- the symbol vocabulary changes by AT MOST +1 net per merge: the
  merged symbol is the only addition, and a constituent symbol can
  vanish when every occurrence was consumed (measured growth set
  {-1, 0, +1} at sf0.1) — so a 30k-merge production vocabulary is
  30k loop iterations, not a bigger per-round plan;
- per-round wall stays ~FLAT as rounds deepen (each round is the same
  pair census -> LIMIT-1 winner broadcast -> literal replace over the
  checkpointed (seq, f) word table; the corpus is never rescanned),
  which is the evidence that the 4-round oracle bound is a DuckDB CTE
  affordability limit, not an engine depth limit.

WordPiece mode (``--wordpiece``) runs the LIKELIHOOD objective
(wordpiece_top_pair) to the same depth — proving the 1-merge
wordpiece_merge_step query bound is the oracle's CTE affordability
limit, not the trainer's.  Extra law pinned there: the round's winner
must carry a finite gain (its pair count ≥ 1 and both constituent
counts ≥ pair count), and the objective genuinely DIVERGES from BPE
(rounds where the likelihood pick differs from the frequency pick are
counted — the receipt that the trio are different trainers, not one
trainer renamed).

Run: python tools/bpe_probe.py [n_merges] [--wordpiece]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.operators.bpe import (
    _to_seq,
    _word_freq,
    merge_top_pair,
    pair_counts,
    wordpiece_top_pair,
)

SF_DIR = "/root/testdata/sf0.1"


def run_probe(
    n_merges: int = 32,
    sf_dir: str = SF_DIR,
    spark=None,
    objective: str = "bpe",
) -> list[dict]:
    """Train n_merges rounds; return per-round receipts
    {round, merged_pair, pair_count, vocab_symbols, wall_s} — plus,
    for objective="wordpiece", gain_i and bpe_pair (the frequency
    objective's pick the same round, for the divergence census).
    Creates (and stops) its own session unless one is passed in."""
    own_session = spark is None
    if own_session:
        from cybersecurity_ioc_etl_spark.session import get_spark

        spark = get_spark("bpe-probe")
        spark.sparkContext.setLogLevel("ERROR")
    seqs = (
        _word_freq(spark, sf_dir)
        .select(_to_seq(F.col("w")).alias("seq"), "f")
        .localCheckpoint(eager=True)
    )

    def vocab_symbols(s) -> int:
        # distinct symbols across the word table (seq is chr(31)-joined)
        return (
            s.select(
                F.explode(F.split(F.col("seq"), "\x1f")).alias("sym")
            )
            .filter(F.col("sym") != "")
            .distinct()
            .count()
        )

    receipts: list[dict] = []
    cur = seqs
    for r in range(1, n_merges + 1):
        t0 = time.perf_counter()
        top = (
            pair_counts(cur)
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top:
            break
        bpe_pair = f"{top[0]['left_sym']}+{top[0]['right_sym']}"
        if objective == "wordpiece":
            cur, info = wordpiece_top_pair(cur, checkpoint=(r % 2 == 0))
            w = info.collect()[0]
            wall = time.perf_counter() - t0
            receipts.append(
                {
                    "round": r,
                    "merged_pair": w["merged_pair"],
                    "pair_count": w["pair_count"],
                    "gain_i": w["gain_i"],
                    "bpe_pair": bpe_pair,
                    "vocab_symbols": vocab_symbols(cur),
                    "wall_s": round(wall, 3),
                }
            )
            continue
        cur, mp = merge_top_pair(cur, checkpoint=(r % 2 == 0))
        pair = mp.collect()[0][0]
        wall = time.perf_counter() - t0
        receipts.append(
            {
                "round": r,
                "merged_pair": pair,
                "pair_count": top[0]["pair_count"],
                "vocab_symbols": vocab_symbols(cur),
                "wall_s": round(wall, 3),
            }
        )
    if own_session:
        spark.stop()
    return receipts


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    objective = "wordpiece" if "--wordpiece" in sys.argv else "bpe"
    n = int(args[0]) if args else 32
    receipts = run_probe(n, objective=objective)
    growth = [
        receipts[i + 1]["vocab_symbols"] - receipts[i]["vocab_symbols"]
        for i in range(len(receipts) - 1)
    ]
    for rec in receipts:
        extra = (
            f" gain_i={rec['gain_i']:>12} bpe_pick={rec['bpe_pair']!r}"
            if objective == "wordpiece"
            else ""
        )
        print(
            f"round {rec['round']:>3}: merge={rec['merged_pair']!r:<16}"
            f" count={rec['pair_count']:>7}"
            f" vocab={rec['vocab_symbols']:>5} wall={rec['wall_s']:.2f}s"
            + extra
        )
    half = len(receipts) // 2
    early = sum(r["wall_s"] for r in receipts[:half]) / max(1, half)
    late = sum(r["wall_s"] for r in receipts[half:]) / max(
        1, len(receipts) - half
    )
    if objective == "wordpiece":
        diverged = sum(
            1 for r in receipts if r["merged_pair"] != r["bpe_pair"]
        )
        finite = all(r["pair_count"] >= 1 for r in receipts)
        print(
            f"\nreceipt: rounds={len(receipts)} objective=wordpiece"
            f" diverged_from_bpe={diverged}/{len(receipts)}"
            f" winners_finite={finite}"
            f" vocab_growth_per_round={sorted(set(growth))}"
            f" mean_wall_first_half={early:.2f}s"
            f" mean_wall_second_half={late:.2f}s"
        )
        return
    dec = all(
        receipts[i]["pair_count"] >= receipts[i + 1]["pair_count"]
        for i in range(len(receipts) - 1)
    )
    print(
        f"\nreceipt: rounds={len(receipts)}"
        f" counts_monotone_nonincreasing={dec}"
        f" vocab_growth_per_round={sorted(set(growth))}"
        f" mean_wall_first_half={early:.2f}s mean_wall_second_half={late:.2f}s"
    )


if __name__ == "__main__":
    main()
