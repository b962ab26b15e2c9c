"""Corpus-curation pipeline — the composed filter chain every LLM
pretraining data job runs, as ONE oracle-checked query:

    lang-id gate → quality gate → exact dedup (keep first) → deterministic
    sample → per-source accounting

Each stage exists standalone elsewhere (text_queries.q_doc_lang_id,
text_queries.q_doc_quality, dedup.q_dedup_keep_first,
sampling.q_deterministic_sample); this module proves they COMPOSE — the
real deliverable of a curation engine, since stage order changes both the
result (dedup before sampling keeps different survivors than after) and
the cost (cheap narrow filters must run before the dedup shuffle so the
window only sorts survivors).

Scale shape at 100 TB: stages 1-2 are narrow scans (no shuffle, filters
evaluated next to the parquet reader), stage 3 is the single shuffle —
partitioned by the 16-byte content fingerprint over the already-filtered
minority of rows — and stage 4 is a narrow hash filter over the dedup
survivors.  The final rollup shuffles only (source, counters).  Exactly
one full-width shuffle end to end, and it happens at the minimum possible
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .dedup import _FP_SQL, fingerprint
from .registry import query
from .sampling import _bucket_sql, hash_bucket
from .text_queries import _TOKENIZE_SQL, EN_STOPWORDS, tokens

_STOP_LIST_SQL = "['" + "','".join(EN_STOPWORDS) + "']"

_CURATION_ORACLE = f"""
WITH staged AS (
  SELECT doc_id, source, n_chars,
    len({_TOKENIZE_SQL}) AS n_tokens,
    len(list_filter({_TOKENIZE_SQL}, t -> list_contains({_STOP_LIST_SQL}, t)))
      AS n_stop,
    {_FP_SQL} AS fp
  FROM documents
),
gated AS (
  -- stage 1+2: english vote (>=10% stopword density) and min-length gate
  SELECT * FROM staged WHERE n_stop * 10 >= n_tokens AND n_tokens >= 5
),
deduped AS (
  -- stage 3: exact dedup, keep the lowest doc_id per fingerprint
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM gated
  ) WHERE doc_id = keeper
),
sampled AS (
  -- stage 4: deterministic 50% hash sample of the survivors
  SELECT * FROM deduped
  WHERE {_bucket_sql(x="CAST(doc_id AS VARCHAR)")} < 50
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM sampled
GROUP BY source
"""


def curate(documents: DataFrame) -> DataFrame:
    """The reusable pipeline: returns the curated per-doc frame (doc_id,
    source, n_chars, n_tokens) after gate → dedup → sample."""
    toks = tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    staged = documents.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
        fingerprint(F.col("text")).alias("fp"),
    )
    gated = staged.filter(
        (F.col("n_stop") * 10 >= F.col("n_tokens")) & (F.col("n_tokens") >= 5)
    )
    w = Window.partitionBy("fp")
    deduped = gated.withColumn("keeper", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("keeper")
    )
    return deduped.filter(hash_bucket(F.col("doc_id")) < 50)


@query("curation_pipeline", oracle=_CURATION_ORACLE)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: lang gate → quality gate → exact dedup →
    50% deterministic sample → per-source doc/char/token accounting.
    The per-source char AND token sums prove both engines kept the
    identical row set through all four stages, not just equal counts."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return curate(d).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
    )
