"""Corpus preparation for model training — chunking, packing,
decontamination.  The three steps between "deduped corpus" and "batches
on the GPU", each as a declarative plan that scales:

- chunking: long documents → overlapping context-window pieces (the
  preprocessing for embedding/RAG indexing and fixed-window training);
- packing: documents → contiguous token-budget bins (sequence packing —
  the distributable budget-slice form: a cumulative-sum window, with
  boundary repair left to a cheap local pass);
- decontamination: n-gram overlap against a held-out eval set (shared
  shingle-hash join — the standard "did the eval leak into training"
  audit).

All three are pure column expressions + one bounded shuffle; shingle
machinery is shared with dedup (md5-prefix ints, portable to the DuckDB
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .dedup import _SHINGLE_INT_SQL, _SHINGLES_SQL, _shingle_int, _word_shingles
from .registry import query

_CHUNK = 200  # chars per chunk
_STRIDE = 150  # 50-char overlap


@query(
    "doc_chunking",
    oracle=f"""
SELECT doc_id,
  CAST((off - 1) // {_STRIDE} AS BIGINT) AS chunk_idx,
  CAST(length(substring(text, CAST(off AS INTEGER), {_CHUNK})) AS BIGINT)
    AS chunk_len,
  md5(substring(text, CAST(off AS INTEGER), {_CHUNK})) AS chunk_md5
FROM (
  SELECT doc_id, text, unnest(generate_series(1, length(text), {_STRIDE})) AS off
  FROM documents
)
""",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document split into {200-char,
    50-overlap} pieces — 1 row → N rows via a generated offset sequence
    (no UDF, no shuffle; the explode happens in place at the scan).  The
    md5 checksum makes the oracle prove byte-identical chunk boundaries,
    not just matching counts.  Swap chars for tokens by chunking the
    token array with the same expressions."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(1), F.length("text"), F.lit(_STRIDE))
        ).alias("chunk_idx", "off"),
        "text",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.length(F.expr(f"substring(text, off, {_CHUNK})"))
        .cast("bigint")
        .alias("chunk_len"),
        F.md5(F.expr(f"substring(text, off, {_CHUNK})")).alias("chunk_md5"),
    )


@query(
    "doc_packing_bins",
    oracle="""
WITH laid_out AS (
  SELECT source, n_chars,
    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS cum_before
  FROM documents
)
SELECT source, CAST(cum_before // 5000 AS BIGINT) AS bin_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS bin_chars
FROM laid_out
GROUP BY source, bin_id
""",
)
def q_doc_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, budget-slice form: lay documents out in stable
    (source, doc_id) order and cut every 5000 chars of cumulative budget.
    One window cumsum per source partition — this is how packing
    distributes (true greedy first-fit is inherently sequential; the
    slice form gets within one document of it, and a per-bin local pass
    repairs boundaries).  Bins are reproducible because the layout order
    is the sort key, not arrival order."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select(
            "source",
            "n_chars",
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum_before"),
        )
        .groupBy("source", F.expr("cum_before div 5000").alias("bin_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("bin_chars"),
        )
    )


@query(
    "eval_contamination",
    oracle=f"""
WITH eval_shingles AS (
  SELECT DISTINCT sh
  FROM (SELECT unnest({_SHINGLES_SQL.strip()}) AS sh FROM documents WHERE doc_id < 10)
),
corpus AS (
  SELECT doc_id, unnest({_SHINGLES_SQL.strip()}) AS sh
  FROM documents WHERE doc_id >= 10
)
SELECT c.doc_id, COUNT(DISTINCT c.sh) AS n_shared_shingles
FROM corpus c JOIN eval_shingles e ON c.sh = e.sh
GROUP BY c.doc_id
""",
)
def q_eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination audit: training docs sharing any word-3-gram with
    the held-out eval set (doc_id < 10), scored by distinct shared
    shingles.  The eval side collapses to a distinct shingle set and
    BROADCASTS (eval sets are tiny by construction); the corpus side
    streams through the broadcast semi-match — at 100 TB this is a
    broadcast join against millions of eval shingles, never a corpus
    self-join.  Matched docs get dropped or downweighted before training.

    The join key is the RAW shingle string, not an md5-prefix int: the
    hash never reaches the output, hashing every corpus shingle costs a
    full md5 pass over the exploded corpus (~1.8x the whole query's wall
    at sf0.1), and raw-string equality is collision-free on both engines.
    If a huge eval set ever makes the broadcast too wide, hash BOTH
    sides with the same function and accept the collision epsilon."""
    # two separate loads: the eval side must NOT inherit fan_out — the
    # repartition would sit between scan and filter, blocking pushdown of
    # doc_id < 10 and shuffling the whole corpus to keep 10 rows.  Only
    # the CPU-bound corpus shingling pass fans out.
    ev = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select(F.explode(_word_shingles(F.col("text"))).alias("sh"))
        .distinct()
    )
    corpus = (
        load_table(spark, sf_dir, "documents", fan_out=True)
        .filter(F.col("doc_id") >= 10)
        .select("doc_id", F.explode(_word_shingles(F.col("text"))).alias("sh"))
    )
    return (
        corpus.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared_shingles"))
    )


# ---------------------------------------------------------------------------
# Span-grain decontamination — contaminated token fraction per training doc
# ---------------------------------------------------------------------------

_CONTAM_K = 5  # token grain; matches substring_dedup_spans

_CONTAM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, str_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
t AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM d
      WHERE len(toks) >= {_CONTAM_K}),
g AS (
  SELECT doc_id, n_tokens,
    [{_SHINGLE_INT_SQL.format(
        x=f"array_to_string(list_slice(toks, gi, gi + {_CONTAM_K - 1}),"
          " chr(1))")}
     for gi in range(1, len(toks) - {_CONTAM_K - 2})] AS hs
  FROM t
),
occ AS (
  SELECT doc_id, u.i - 1 AS p, hs[u.i] AS h
  FROM g, unnest(range(1, len(g.hs) + 1)) AS u(i)
),
ev AS (SELECT DISTINCT h FROM occ WHERE doc_id < 10),
hit AS (
  SELECT o.doc_id, o.p FROM occ o JOIN ev e ON o.h = e.h
  WHERE o.doc_id >= 10
),
w AS (
  SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS lp
  FROM hit
),
isl AS (
  SELECT doc_id,
    COUNT(*) AS n_eval_grams,
    SUM(CASE WHEN lp IS NULL THEN {_CONTAM_K}
             ELSE LEAST({_CONTAM_K}, p - lp) END) AS covered,
    SUM(CASE WHEN lp IS NULL OR p - lp > {_CONTAM_K} THEN 1 ELSE 0 END)
      AS n_spans
  FROM w GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(t.n_tokens AS BIGINT) AS n_tokens,
  CAST(i.n_eval_grams AS BIGINT) AS n_eval_grams,
  CAST(i.n_spans AS BIGINT) AS n_spans,
  CAST(i.covered AS BIGINT) AS covered_tokens,
  CAST(i.covered AS DOUBLE) / t.n_tokens AS contaminated_fraction
FROM t JOIN isl i ON t.doc_id = i.doc_id
WHERE t.doc_id >= 10
"""


@query("eval_contamination_spans", oracle=_CONTAM_ORACLE)
def q_eval_contamination_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decontamination at SPAN grain — the substring_dedup_spans
    machinery pointed at the eval set: a training doc's token position
    is contaminated when covered by a verbatim {k}-token run that also
    appears in the held-out eval docs (doc_id < 10), and the emitted
    covered-token fraction is the DECISION signal span-level
    decontamination needs (eval_contamination counts shared shingles —
    good for flagging; the span fraction says how much of the doc to
    cut, the Lee et al. scrub grain).  Only contaminated docs emit.

    Scale shape: eval grams collapse to a distinct 8-byte-hash set and
    BROADCAST (eval sets are tiny); training docs pay one posexplode
    census + the broadcast probe + a per-doc lag window — one doc_id
    shuffle; corpus text never shuffles."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tk = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
    ).filter(F.size("tk") >= _CONTAM_K)
    toks = F.col("tk")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - _CONTAM_K),
        lambda gi: F.concat_ws(
            "\x01",
            *[F.element_at(toks, gi + j + 1) for j in range(_CONTAM_K)],
        ),
    )
    occ = tk.select(
        "doc_id", F.posexplode(grams).alias("p", "gram")
    ).select("doc_id", "p", _shingle_int(F.col("gram")).alias("h"))
    ev = occ.filter(F.col("doc_id") < 10).select("h").distinct()
    hit = (
        occ.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(ev), "h")
        .select("doc_id", "p")
    )
    lagw = Window.partitionBy("doc_id").orderBy("p")
    w = hit.withColumn("lp", F.lag("p").over(lagw))
    isl = w.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_eval_grams"),
        F.sum(
            F.when(F.col("lp").isNull(), F.lit(_CONTAM_K)).otherwise(
                F.least(F.lit(_CONTAM_K), F.col("p") - F.col("lp"))
            )
        )
        .cast("bigint")
        .alias("covered_tokens"),
        F.sum(
            F.when(
                F.col("lp").isNull()
                | (F.col("p") - F.col("lp") > _CONTAM_K),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_spans"),
    )
    base = tk.filter(F.col("doc_id") >= 10).select(
        "doc_id", F.size("tk").cast("bigint").alias("n_tokens")
    )
    return base.join(isl, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_eval_grams",
        "n_spans",
        "covered_tokens",
        (
            F.col("covered_tokens").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("contaminated_fraction"),
    )


@query(
    "packing_efficiency_audit",
    oracle="""
WITH laid_out AS (
  SELECT source, n_chars,
    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS cb
  FROM documents
),
per_doc AS (
  SELECT source, n_chars, cb,
    cb // 5000 AS b0,
    CASE WHEN n_chars > 0 THEN (cb + n_chars - 1) // 5000
         ELSE cb // 5000 END AS b1
  FROM laid_out
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST((SUM(n_chars) + 4999) // 5000 AS BIGINT) AS min_bins,
  CAST(COUNT(DISTINCT b0) AS BIGINT) AS n_bins_assigned,
  CAST(SUM(CASE WHEN b1 > b0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
  CAST(SUM(CASE WHEN b1 > b0 THEN cb + n_chars - (b0 + 1) * 5000
            ELSE 0 END) AS BIGINT) AS spill_chars,
  CAST(SUM(CASE WHEN b1 > b0 THEN cb + n_chars - (b0 + 1) * 5000
            ELSE 0 END) * 1000000 AS DOUBLE)
    / CAST(NULLIF(SUM(n_chars), 0) AS DOUBLE) AS spill_ppm,
  CAST((SUM(n_chars) + 4999) // 5000 * 5000 - SUM(n_chars) AS BIGINT)
    AS last_slack_chars
FROM per_doc GROUP BY source
""",
)
def q_packing_efficiency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit for the budget-slice layout
    (doc_packing_bins) — the receipt that quantifies what the slice
    form trades for distributability (VERDICT r8 item 8).  Slice
    packing is CAPACITY-optimal by construction (min_bins =
    ceil(total/5000) slices, zero internal padding, slack only in the
    last slice), but it cuts documents at bin boundaries; the cost of
    the boundary-repair pass is exactly the straddlers.  Per source:
    the bin-count lower bound, the bins that actually receive a
    document start (a giant doc can span bins no other doc starts in),
    the straddler census, and the SPILL — characters landing past
    their doc's first bin boundary, i.e. the bytes a repair pass must
    move (split) or re-pad (bump), as an exact count and as ppm of the
    corpus.  A greedy whole-doc packer would instead pay bin-internal
    padding >= spill on the same layout order — the two regimes'
    waste is directly comparable through this number.

    Determinism: everything is exact integer arithmetic off one
    cumulative-sum window over the stable (source, doc_id) layout
    order; the only double is the single ppm division (exact int /
    exact int — bit-identical, no rounding, the dsir lesson).

    Scale shape: one window shuffle on source (the same single
    partitioning doc_packing_bins rides), then a map-side-combined
    agg; no joins, no second scan."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc = d.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cb"),
    ).select(
        "source",
        "n_chars",
        "cb",
        F.expr("cb div 5000").alias("b0"),
        F.when(
            F.col("n_chars") > 0,
            F.expr("(cb + n_chars - 1) div 5000"),
        )
        .otherwise(F.expr("cb div 5000"))
        .alias("b1"),
    )
    straddle = F.col("b1") > F.col("b0")
    spill = F.when(
        straddle,
        F.col("cb") + F.col("n_chars") - (F.col("b0") + 1) * F.lit(5000),
    ).otherwise(F.lit(0))
    agged = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("b0").cast("bigint").alias("n_bins_assigned"),
        F.sum(F.when(straddle, 1).otherwise(0))
        .cast("bigint")
        .alias("n_straddlers"),
        F.sum(spill).cast("bigint").alias("spill_chars"),
    )
    # integer `div` post-agg, never double-divide-then-truncate: the
    # double quotient of two big ints can round up across the floor
    # boundary at scale
    return agged.select(
        "source",
        "n_docs",
        "total_chars",
        F.expr("(total_chars + 4999) div 5000").alias("min_bins"),
        "n_bins_assigned",
        "n_straddlers",
        "spill_chars",
        (
            (F.col("spill_chars") * F.lit(1000000)).cast("double")
            / F.nullif(F.col("total_chars"), F.lit(0)).cast("double")
        ).alias("spill_ppm"),
        F.expr(
            "(total_chars + 4999) div 5000 * 5000 - total_chars"
        ).alias("last_slack_chars"),
    )
