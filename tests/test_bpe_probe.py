"""Structural receipts of the BPE trainer depth probe (SCALE.md
tokenizer section) at fixture scale: the convergence and vocab-growth
laws tools/bpe_probe.py measures at sf0.1 hold for any depth/corpus, so
the suite pins them on a cheap 6-merge run."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.bpe_probe import run_probe


def test_bpe_depth_receipts(spark, sf_dir):
    receipts = run_probe(6, sf_dir, spark=spark)
    assert len(receipts) == 6
    # convergence: winning pair count monotone non-increasing
    counts = [r["pair_count"] for r in receipts]
    assert counts == sorted(counts, reverse=True)
    # vocab: merged symbol is the only addition; constituents may be
    # fully consumed -> net change per merge is at most +1
    vocabs = [r["vocab_symbols"] for r in receipts]
    growth = [b - a for a, b in zip(vocabs, vocabs[1:])]
    assert all(g <= 1 for g in growth)
    # every round produced a real merge
    assert all(
        r["merged_pair"] and "+" in r["merged_pair"] for r in receipts
    )


def test_wordpiece_depth_receipts(spark, sf_dir):
    """The likelihood objective runs to depth with the same vocab-growth
    law, every winner finite, and genuine divergence from the frequency
    objective (SCALE.md tokenizer section; 32 rounds measured at
    sf0.1, pinned here on a cheap 6-merge run)."""
    receipts = run_probe(6, sf_dir, spark=spark, objective="wordpiece")
    assert len(receipts) == 6
    # every round produced a real merge with a finite gain
    assert all(r["pair_count"] >= 1 for r in receipts)
    assert all(
        r["merged_pair"] and "+" in r["merged_pair"] for r in receipts
    )
    # vocab-growth law holds for the likelihood objective too
    vocabs = [r["vocab_symbols"] for r in receipts]
    growth = [b - a for a, b in zip(vocabs, vocabs[1:])]
    assert all(g <= 1 for g in growth)
    # the trio are different trainers: the likelihood pick must
    # diverge from the frequency pick in at least one round
    assert any(r["merged_pair"] != r["bpe_pair"] for r in receipts)
