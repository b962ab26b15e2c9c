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

def _pairs_sql(sfx: str, src: str) -> str:
    """CTE chain syms{sfx}/bi{sfx}/pc{sfx}: weighted adjacent-pair counts
    from the (seq, f) table `src` — the per-round census, suffixed so the
    merge-step oracles can unroll rounds like the pagerank/kmeans ones."""
    return f"""
syms{sfx} AS (
  SELECT f, list_slice(string_split(seq, chr(31)), 1,
                       len(string_split(seq, chr(31))) - 1) AS s
  FROM {src}
),
bi{sfx} AS (
  SELECT f, unnest([s[i] || chr(1) || s[i + 1] for i in range(1, len(s))]) AS p
  FROM syms{sfx}
),
pc{sfx} AS (
  SELECT string_split(p, chr(1))[1] AS left_sym,
         string_split(p, chr(1))[2] AS right_sym,
         CAST(SUM(f) AS BIGINT) AS pair_count
  FROM bi{sfx} GROUP BY p
)"""


def _merge_round_sql(r: int) -> str:
    """One unrolled merge round: top{r} = the winner of the previous
    census, seqs{r} = sequences with that pair merged, pc{r} = the new
    census."""
    prev_seq = "seqs" if r == 1 else f"seqs{r - 1}"
    prev_pc = "pc" if r == 1 else f"pc{r - 1}"
    return f""",
top{r} AS (
  SELECT left_sym, right_sym FROM {prev_pc}
  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
),
seqs{r} AS (
  SELECT replace(seq,
                 t.left_sym || chr(31) || t.right_sym || chr(31),
                 t.left_sym || t.right_sym || chr(31)) AS seq, f
  FROM {prev_seq}, top{r} t
),{_pairs_sql(str(r), f"seqs{r}")}"""


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
WITH {_WF_SQL},{_pairs_sql("", "seqs")}
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
WITH {_WF_SQL},{_pairs_sql("", "seqs")}{_merge_round_sql(1)}
SELECT (SELECT left_sym || '+' || right_sym FROM top1) AS merged_pair,
       left_sym, right_sym, pair_count
FROM pc1 ORDER BY pair_count DESC, left_sym, right_sym LIMIT 10
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
    merged, mp = merge_top_pair(seqs)
    return (
        pair_counts(merged)
        .crossJoin(F.broadcast(mp))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(10)
        .select("merged_pair", "left_sym", "right_sym", "pair_count")
    )


def merge_top_pair(
    seqs: DataFrame, checkpoint: bool = True
) -> tuple[DataFrame, DataFrame]:
    """One BPE merge: returns (merged (seq, f) vocab, 1-row merged-pair
    frame).  The winner broadcasts into a literal left-to-right replace;
    the merged vocab is localCheckpoint-ed so iterated rounds start from
    a materialized leaf (kmeans_two_rounds / connected_components loop
    discipline — per-round plans stay flat however many merges run).
    ``checkpoint=False`` lets an n-round trainer thin the cadence
    (bpe_n_merges checkpoints every SECOND merge, pagerank's cadence)."""
    top1 = (
        pair_counts(seqs)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(1)
        .select(F.col("left_sym").alias("ml"), F.col("right_sym").alias("mr"))
    )
    merged = seqs.crossJoin(F.broadcast(top1)).select(
        F.expr(
            "replace(seq, concat(ml, chr(31), mr, chr(31)),"
            " concat(ml, mr, chr(31)))"
        ).alias("seq"),
        "f",
        F.concat_ws("+", "ml", "mr").alias("merged_pair"),
    )
    if checkpoint:
        merged = merged.localCheckpoint(eager=True)
    return merged.select("seq", "f"), merged.select("merged_pair").limit(1)


@query(
    "bpe_two_merges",
    oracle=f"""
WITH {_WF_SQL},{_pairs_sql("", "seqs")}{_merge_round_sql(1)}{_merge_round_sql(2)}
SELECT (SELECT left_sym || '+' || right_sym FROM top1) AS merged_pair_1,
       (SELECT left_sym || '+' || right_sym FROM top2) AS merged_pair_2,
       left_sym, right_sym, pair_count
FROM pc2 ORDER BY pair_count DESC, left_sym, right_sym LIMIT 10
""",
)
def q_bpe_two_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO composed BPE merges — the vocabulary actually grows multi-char
    symbols (round 2's winner can contain round 1's merged symbol), which
    is the property that makes BPE a TRAINING loop rather than a one-shot
    census.  The oracle unrolls both rounds from the same round-CTE
    generator; both merged pairs ride along so the oracle pins the merge
    SEQUENCE, not just final counts.  Loop discipline per merge_top_pair:
    each round's vocab is a checkpointed leaf, so n merges cost n flat
    plans, not one n-deep plan."""
    seqs = _word_freq(spark, sf_dir).select(_to_seq(F.col("w")).alias("seq"), "f")
    merged1, mp1 = merge_top_pair(seqs)
    merged2, mp2 = merge_top_pair(merged1)
    return (
        pair_counts(merged2)
        .crossJoin(F.broadcast(mp1.select(F.col("merged_pair").alias("merged_pair_1"))))
        .crossJoin(F.broadcast(mp2.select(F.col("merged_pair").alias("merged_pair_2"))))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(10)
        .select("merged_pair_1", "merged_pair_2", "left_sym", "right_sym", "pair_count")
    )


_N_MERGES = 4

_N_MERGES_SQL = "".join(_merge_round_sql(r) for r in range(1, _N_MERGES + 1))
_N_MERGES_COLS = ",\n       ".join(
    f"(SELECT left_sym || '+' || right_sym FROM top{r}) AS merged_pair_{r}"
    for r in range(1, _N_MERGES + 1)
)


@query(
    "bpe_n_merges",
    oracle=f"""
WITH {_WF_SQL},{_pairs_sql("", "seqs")}{_N_MERGES_SQL}
SELECT {_N_MERGES_COLS},
       left_sym, right_sym, pair_count
FROM pc{_N_MERGES}
ORDER BY pair_count DESC, left_sym, right_sym LIMIT 10
""",
)
def q_bpe_n_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR composed BPE merges — the N-round trainer (VERDICT r4 ask
    #4).  The oracle unrolls all four rounds from the same round-CTE
    generator and pins the full merge SEQUENCE plus the round-4 census,
    whose top rows contain earlier rounds' merged symbols (at sf0.01,
    ('m','er') ranks 2nd — 'er' is round 1's merge): multi-char growth,
    the property that makes this a trainer rather than a repeated
    census.

    Loop discipline: the vocab frame is localCheckpoint-ed every SECOND
    merge (pagerank's cadence) — a checkpoint every round pays eager
    materialization the tiny vocab doesn't need, never checkpointing
    grows one n-deep plan; every-2 bounds both, and generalizing to a
    30k-merge production vocabulary only lengthens this loop.  Each
    round stays: pair census (map-side combined) → LIMIT-1 winner
    broadcast → literal replace over (seq, f) vocab rows — the corpus
    is never rescanned after the word-frequency shuffle."""
    # the loop's static input materializes ONCE (SCALE.md iteration
    # rule): un-checkpointed rounds would otherwise replay the
    # word-frequency shuffle per census (measured 2.12 -> ~1.5 s)
    seqs = (
        _word_freq(spark, sf_dir)
        .select(_to_seq(F.col("w")).alias("seq"), "f")
        .localCheckpoint(eager=True)
    )
    cur, mps = seqs, []
    for r in range(1, _N_MERGES + 1):
        cur, mp = merge_top_pair(cur, checkpoint=(r % 2 == 0))
        mps.append(mp)
    out = pair_counts(cur)
    for idx, mp in enumerate(mps, 1):
        out = out.crossJoin(
            F.broadcast(mp.select(F.col("merged_pair").alias(f"merged_pair_{idx}")))
        )
    return (
        out.orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(10)
        .select(
            *[f"merged_pair_{r}" for r in range(1, _N_MERGES + 1)],
            "left_sym",
            "right_sym",
            "pair_count",
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer INFERENCE: encode the corpus with the trained n-merge vocab
# ---------------------------------------------------------------------------


def trained_vocab(
    spark: SparkSession, sf_dir: str, n_merges: int = _N_MERGES
) -> DataFrame:
    """(w, f, seq): the word table with each word's symbol sequence
    after ``n_merges`` trained BPE merges — the tokenizer's vocabulary
    artifact.  Same loop as bpe_n_merges but carrying the word column
    through every round, so the result maps word → encoded form.
    The starting vocab materializes once ahead of the loop (the
    bpe_n_merges checkpoint note)."""
    cur = (
        _word_freq(spark, sf_dir)
        .select("w", "f", _to_seq(F.col("w")).alias("seq"))
        .localCheckpoint(eager=True)
    )
    for r in range(1, n_merges + 1):
        top1 = (
            pair_counts(cur)
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .limit(1)
            .select(F.col("left_sym").alias("ml"), F.col("right_sym").alias("mr"))
        )
        cur = cur.crossJoin(F.broadcast(top1)).select(
            "w",
            "f",
            F.expr(
                "replace(seq, concat(ml, chr(31), mr, chr(31)),"
                " concat(ml, mr, chr(31)))"
            ).alias("seq"),
        )
        if r % 2 == 0:  # bpe_n_merges' checkpoint cadence
            cur = cur.localCheckpoint(eager=True)
    return cur


def _encode_rounds_sql(n: int) -> str:
    """w-carrying unrolled merge rounds: s0 → s{n} with (w, f, seq)."""
    parts = []
    for r in range(1, n + 1):
        prev = f"s{r - 1}"
        parts.append(f"""{_pairs_sql(f'w{r - 1}', prev)},
t{r} AS (
  SELECT left_sym, right_sym FROM pcw{r - 1}
  ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1
),
s{r} AS (
  SELECT w, f,
    replace(seq, t.left_sym || chr(31) || t.right_sym || chr(31),
            t.left_sym || t.right_sym || chr(31)) AS seq
  FROM {prev}, t{r} t
),""")
    return "".join(parts)


_ENCODE_ORACLE = f"""
WITH words AS (SELECT unnest({_TOKENIZE_SQL}) AS w FROM documents),
wf AS (SELECT w, COUNT(*) AS f FROM words GROUP BY w),
s0 AS (SELECT w, f, {_SEQ_SQL} AS seq FROM wf),
{_encode_rounds_sql(_N_MERGES)}
enc AS (
  SELECT w, len(string_split(seq, chr(31))) - 1 AS n_syms FROM s{_N_MERGES}
),
docw AS (SELECT source, unnest({_TOKENIZE_SQL}) AS w FROM documents)
SELECT source,
  COUNT(*) AS n_words,
  CAST(SUM(n_syms) AS BIGINT) AS n_symbols,
  CAST(SUM(n_syms) AS DOUBLE) / COUNT(*) AS avg_symbols_per_word
FROM docw JOIN enc USING (w)
GROUP BY source
"""


@query("bpe_encode_stats", oracle=_ENCODE_ORACLE)
def q_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE — the encode pass that closes BPE's
    train→apply loop the way ivf_trained_topk closes ANN's
    train→index→serve: train the 4-merge vocabulary (bpe_n_merges'
    exact loop, word column carried through), then encode EVERY corpus
    word occurrence by broadcast-joining the word→sequence vocabulary
    and count symbols per source.  avg symbols/word < avg chars/word is
    the compression the merges bought — the number a tokenizer team
    actually tracks per source.

    Scale shape: training never rescans the corpus after the word-freq
    shuffle (bpe.py module docstring); the encode pass is the standard
    production tokenization sweep — ONE broadcast join of the vocab
    against the streamed corpus (at a 30k-merge vocab the word→encoding
    table is still MBs), then a map-side-combined per-source sum.  The
    exact-integer symbol counts divide once into the per-source average
    (int÷int, correctly rounded, engine-identical)."""
    vocab = trained_vocab(spark, sf_dir)
    enc = vocab.select(
        "w", (F.size(F.split("seq", _SEP)) - 1).cast("long").alias("n_syms")
    )
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    docw = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    return (
        docw.join(F.broadcast(enc), "w")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_symbols"),
            (F.sum("n_syms").cast("double") / F.count("*")).alias(
                "avg_symbols_per_word"
            ),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece merge objective — likelihood gain instead of raw frequency
# ---------------------------------------------------------------------------

def wordpiece_top_pair(
    seqs: DataFrame, checkpoint: bool = True
) -> tuple[DataFrame, DataFrame]:
    """One WordPiece LIKELIHOOD merge over a (seq, f) word table:
    returns (merged (seq, f) vocab, 1-row (merged_pair, gain_i,
    pair_count) winner frame).  Same round economics as
    merge_top_pair (winner broadcast into a literal replace,
    checkpoint-able cadence); the objective is the quantized log
    likelihood gain FLOOR(1e9·(ln c_ab − ln c_a − ln c_b)) — see
    q_wordpiece_merge_step.  Shared by the query (one round, oracle
    bound) and tools/bpe_probe.py's 32-round depth receipt."""
    s_full = F.split(F.col("seq"), _SEP)
    s = F.slice(s_full, 1, F.size(s_full) - 1)
    sc = (
        seqs.select("f", F.explode(s).alias("sym"))
        .groupBy("sym")
        .agg(F.sum("f").cast("bigint").alias("cnt"))
    )
    pc = pair_counts(seqs)
    gain = (
        F.floor(
            F.lit(1e9)
            * (
                F.log(F.col("pair_count"))
                - F.log(F.col("ca"))
                - F.log(F.col("cb"))
            )
        )
    ).cast("bigint")
    g = (
        pc.join(
            F.broadcast(
                sc.select(
                    F.col("sym").alias("left_sym"), F.col("cnt").alias("ca")
                )
            ),
            "left_sym",
        )
        .join(
            F.broadcast(
                sc.select(
                    F.col("sym").alias("right_sym"), F.col("cnt").alias("cb")
                )
            ),
            "right_sym",
        )
        .select("left_sym", "right_sym", "pair_count", gain.alias("gain_i"))
    )
    topw = (
        g.orderBy(F.col("gain_i").desc(), "left_sym", "right_sym")
        .limit(1)
        .select(
            F.col("left_sym").alias("ml"),
            F.col("right_sym").alias("mr"),
            F.col("gain_i").alias("wg"),
            F.col("pair_count").alias("wc"),
        )
    )
    merged = seqs.crossJoin(F.broadcast(topw)).select(
        F.expr(
            "replace(seq, concat(ml, chr(31), mr, chr(31)),"
            " concat(ml, mr, chr(31)))"
        ).alias("seq"),
        "f",
        F.concat_ws("+", "ml", "mr").alias("merged_pair"),
        F.col("wg").alias("gain_i"),
        F.col("wc").alias("pair_count"),
    )
    if checkpoint:
        merged = merged.localCheckpoint(eager=True)
    return (
        merged.select("seq", "f"),
        merged.select("merged_pair", "gain_i", "pair_count").limit(1),
    )


_WP_ORACLE = f"""
WITH {_WF_SQL},{_pairs_sql("", "seqs")},
sc AS (
  SELECT sym, CAST(SUM(f) AS BIGINT) AS cnt FROM (
    SELECT f, unnest(s) AS sym FROM syms) GROUP BY sym
),
g AS (
  SELECT p.left_sym, p.right_sym, p.pair_count,
    CAST(FLOOR(1e9 * (ln(p.pair_count) - ln(ca.cnt) - ln(cb.cnt)))
         AS BIGINT) AS gain_i
  FROM pc p
  JOIN sc ca ON p.left_sym = ca.sym
  JOIN sc cb ON p.right_sym = cb.sym
),
topw AS (
  SELECT left_sym, right_sym, gain_i FROM g
  ORDER BY gain_i DESC, left_sym, right_sym LIMIT 1
),
seqs1 AS (
  SELECT replace(seq,
                 t.left_sym || chr(31) || t.right_sym || chr(31),
                 t.left_sym || t.right_sym || chr(31)) AS seq, f
  FROM seqs, topw t
),{_pairs_sql("1", "seqs1")}
SELECT (SELECT left_sym || '+' || right_sym FROM topw) AS merged_pair,
       (SELECT gain_i FROM topw) AS gain_i,
       left_sym, right_sym, pair_count
FROM pc1 ORDER BY pair_count DESC, left_sym, right_sym LIMIT 10
"""


@query("wordpiece_merge_step", oracle=_WP_ORACLE)
def q_wordpiece_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE WordPiece training round — the LIKELIHOOD merge objective
    (Schuster & Nakajima 2012; the BERT tokenizer) beside BPE's raw
    frequency: the pair merged is the one maximizing
    score(a,b) = count(ab) / (count(a)·count(b)) — the unigram-LM
    likelihood gain of fusing the pair — which prefers pairs whose
    parts rarely occur APART (BPE's raw count would merge frequent
    symbols that also thrive independently).  The argmax rides the
    quantized log form FLOOR(1e9·(ln c_ab − ln c_a − ln c_b)): one
    identical closed-form double expression per pair on both engines
    (the ioc_host_dga_scores discipline), compared as exact ints with
    lexicographic tie-break.  Emits the winner, its integer gain, and
    the top-10 pair counts of the post-merge vocabulary — pinning
    WHICH merge the objective picked, not just the resulting census.

    Completes the tokenizer-trainer objective trio: BPE (frequency,
    bpe_merge_step), unigram-LM (Viterbi inference,
    viterbi_segment_stats), WordPiece (likelihood, this).

    Scale shape: symbol and pair censuses are vocabulary-grain
    map-side-combined sums off the one corpus-wide word-count shuffle;
    the gain join keys pairs to two symbol-count rows (vocab-sized,
    broadcast); the winner is a 1-row broadcast into the literal
    replace — identical economics to bpe_merge_step."""
    seqs = _word_freq(spark, sf_dir).select(
        _to_seq(F.col("w")).alias("seq"), "f"
    )
    new_seqs, info = wordpiece_top_pair(seqs)
    merged = new_seqs
    return (
        pair_counts(merged)
        .crossJoin(F.broadcast(info.select("merged_pair", "gain_i")))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(10)
        .select(
            "merged_pair", "gain_i", "left_sym", "right_sym", "pair_count"
        )
    )
