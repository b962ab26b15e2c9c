"""Tokenizer-training operators — the byte-pair-encoding (BPE) corpus
statistics an LLM data pipeline computes at scale (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
algorithm is: count adjacent symbol pairs weighted by word frequency,
merge the most frequent pair, repeat).

Scale design: the corpus collapses to the WORD-FREQUENCY table first
(map-side-combined count — at 100 TB this is the classic word-count
shuffle carrying (word, partial-count) pairs), and every BPE round runs
over that table, never the corpus again.  Pair counting is per-row array
expressions over the symbol sequence + one map-side-combined sum keyed
by the pair; a merge is a broadcast of the ONE winning pair into a
literal string replace.  Iterating rounds composes exactly like
kmeans_two_rounds (checkpoint the tiny vocab frame between rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import query

_SEP = "\x1f"  # symbol-boundary marker inside a word's symbol sequence
_PAIR = "\x01"  # left/right separator inside a pair key

_TOKENIZE_SQL = "str_split_regex(trim(text), '\\s+')"

# word → symbol sequence: every char followed by the boundary marker
# ('ab' → 'a<US>b<US>'); a merge deletes ONE interior marker.
_SEQ_SQL = "regexp_replace(w, '(.)', '\\1' || chr(31), 'g')"

# shared CTE prefix: word frequencies → symbol sequences → weighted
# adjacent-pair counts.  {seq} lets the merge-step oracle re-point pair
# counting at the post-merge sequences.
_PAIRS_FROM_SQL = """
syms AS (
  SELECT f, list_slice(string_split({seq}, chr(31)), 1,
                       len(string_split({seq}, chr(31))) - 1) AS s
  FROM {src}
),
bi AS (
  SELECT f, unnest([s[i] || chr(1) || s[i + 1] for i in range(1, len(s))]) AS p
  FROM syms
),
pc AS (
  SELECT string_split(p, chr(1))[1] AS left_sym,
         string_split(p, chr(1))[2] AS right_sym,
         CAST(SUM(f) AS BIGINT) AS pair_count
  FROM bi GROUP BY p
)"""

_WF_SQL = f"""
words AS (SELECT unnest({_TOKENIZE_SQL}) AS w FROM documents),
wf AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
seqs AS (SELECT {_SEQ_SQL} AS seq, f FROM wf)"""


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, f): word frequencies over the corpus — the one corpus-wide
    shuffle every BPE round amortizes."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )


def _to_seq(w: Column) -> Column:
    return F.regexp_replace(w, "(.)", "$1" + _SEP)


def pair_counts(seqs: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count) from (seq, f) symbol sequences.
    Per-row array expressions + ONE map-side-combined sum on the pair."""
    s_full = F.split(F.col("seq"), _SEP)
    s = F.slice(s_full, 1, F.size(s_full) - 1)  # drop trailing ''
    bi = F.when(
        F.size(s) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(s) - 1),
            lambda i: F.concat_ws(
                _PAIR, F.element_at(s, i), F.element_at(s, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        seqs.select("f", F.explode(bi).alias("p"))
        .groupBy("p")
        .agg(F.sum("f").cast("bigint").alias("pair_count"))
        .select(
            F.split(F.col("p"), _PAIR)[0].alias("left_sym"),
            F.split(F.col("p"), _PAIR)[1].alias("right_sym"),
            "pair_count",
        )
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
WITH {_WF_SQL},{_PAIRS_FROM_SQL.format(seq="seq", src="seqs")}
SELECT left_sym, right_sym, pair_count
FROM pc ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20
""",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round 0: the 20 most frequent adjacent character pairs across
    the corpus, weighted by word frequency — what a tokenizer trainer
    merges first.  Top-k via TakeOrderedAndProject (count desc, pair
    lexicographic)."""
    seqs = _word_freq(spark, sf_dir).select(_to_seq(F.col("w")).alias("seq"), "f")
    return (
        pair_counts(seqs)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(20)
    )


@query(
    "bpe_merge_step",
    oracle=f"""
WITH {_WF_SQL},{_PAIRS_FROM_SQL.format(seq="seq", src="seqs")},
top1 AS (
  SELECT left_sym, right_sym FROM pc
  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
),
merged AS (
  SELECT replace(seq,
                 t.left_sym || chr(31) || t.right_sym || chr(31),
                 t.left_sym || t.right_sym || chr(31)) AS seq2,
         f, t.left_sym || '+' || t.right_sym AS merged_pair
  FROM seqs, top1 t
),{_PAIRS_FROM_SQL.format(seq="seq2", src="merged").replace("syms AS", "syms2 AS").replace("bi AS", "bi2 AS").replace("pc AS", "pc2 AS").replace("FROM syms", "FROM syms2").replace("FROM bi", "FROM bi2")}
SELECT (SELECT merged_pair FROM merged LIMIT 1) AS merged_pair,
       left_sym, right_sym, pair_count
FROM pc2 ORDER BY pair_count DESC, left_sym, right_sym LIMIT 10
""",
)
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE full BPE training round: pick the most frequent pair, merge it
    in every word's symbol sequence (literal left-to-right replace of
    'l<US>r<US>' with 'lr<US>' — identical non-overlapping semantics in
    both engines), and emit the top-10 pair counts of the NEW symbol
    vocabulary.  The merged pair rides along so the oracle pins WHICH
    merge happened, not just the resulting counts.

    Scale shape: the winner is a 1-row frame broadcast into the vocab
    table (crossJoin of a LIMIT 1 — same pattern as the engine's other
    scalar broadcasts); the re-count touches only (seq, f) vocab rows,
    never the corpus.  Iterating = repeating this round with the vocab
    frame checkpointed, exactly the kmeans_two_rounds loop discipline."""
    seqs = _word_freq(spark, sf_dir).select(_to_seq(F.col("w")).alias("seq"), "f")
    top1 = (
        pair_counts(seqs)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(1)
        .select(
            F.col("left_sym").alias("ml"), F.col("right_sym").alias("mr")
        )
    )
    merged = seqs.crossJoin(F.broadcast(top1)).select(
        F.expr(
            "replace(seq, concat(ml, chr(31), mr, chr(31)), concat(ml, mr, chr(31)))"
        ).alias("seq"),
        "f",
        F.concat_ws("+", "ml", "mr").alias("merged_pair"),
    )
    mp = merged.select("merged_pair").limit(1)
    return (
        pair_counts(merged.select("seq", "f"))
        .crossJoin(F.broadcast(mp))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(10)
        .select("merged_pair", "left_sym", "right_sym", "pair_count")
    )
