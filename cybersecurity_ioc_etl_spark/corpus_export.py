"""End-to-end training-corpus export — the deliverable batch job a data
team runs nightly: curate (lang/quality gates → exact dedup →
deterministic sample) → chunk to context windows → write a
range-partitioned archive plus a per-source manifest.

This composes the oracle-checked operators (operators/curation.py,
operators/corpus_prep.py) into one job with one materialization
boundary, mirroring how batch.py assembles the reference's IOC job.

Scale notes:
- the curated keep-set is only (doc_id) keys; re-attaching text is an
  equi-join that AQE broadcasts when the survivor set is small and
  shuffles by doc_id otherwise — never a second pass over text filters;
- chunking explodes in place at the scan (generated offsets, no UDF);
- the archive is written with write_range_sorted on doc_id: disjoint
  per-file ranges make downstream doc_id-bounded reads stat-prune, and
  re-exports land byte-identical because every stage is a pure function
  of the row keys;
- audit counters come from the manifest aggregation (df.observe would
  double-fire under repartitionByRange's sampling pass — see the note
  in run_corpus_export).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.curation import curate
from .sinks.bucketed import write_range_sorted
from .sources.readers import load_table

_CHUNK = 200
_STRIDE = 150


def chunk_text(docs: DataFrame, chunk: int = _CHUNK, stride: int = _STRIDE) -> DataFrame:
    """Sliding-window chunks WITH payload (corpus_prep.q_doc_chunking
    keeps only checksums; the export needs the text).  An empty document
    yields one empty chunk rather than crashing: sequence(1, 0) throws
    'Illegal sequence boundaries', so the upper bound is clamped to 1."""
    return docs.select(
        "doc_id",
        "source",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(stride))
        ).alias("chunk_idx", "off"),
        "text",
    ).select(
        "doc_id",
        "source",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(f"substring(text, off, {chunk})").alias("chunk_text"),
    )


def run_corpus_export(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> dict[str, int]:
    """Run the export; returns audit metrics.

    Layout under ``out_dir``:
      chunks/    range-sorted parquet (doc_id, source, chunk_idx, chunk_text)
      manifest/  per-source (n_docs, n_chunks, total_chars)
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    keep = curate(docs).select("doc_id")
    survivors = docs.join(keep, "doc_id")
    chunks = chunk_text(survivors)

    # NOT df.observe here: repartitionByRange runs a range-boundary
    # sampling pass over the child plan before the real one, so an
    # observation on the chunk stream fires twice and double-counts.
    # The manifest aggregation is the audit pass instead — one small agg
    # job whose totals the caller gets for free.
    manifest = chunks.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk_text")).cast("bigint").alias("total_chars"),
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))
    write_range_sorted(chunks, os.path.join(out_dir, "chunks"), "doc_id", n_files)

    totals = (
        spark.read.parquet(os.path.join(out_dir, "manifest"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("total_chars").alias("total_chars"),
        )
        .collect()[0]
    )
    return {
        "n_docs": int(totals.n_docs),
        "n_chunks": int(totals.n_chunks),
        "total_chars": int(totals.total_chars),
    }
