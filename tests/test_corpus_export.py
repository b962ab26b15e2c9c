"""End-to-end corpus-export job: determinism, curation gating, manifest
consistency, and the range-partitioned archive layout."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from cybersecurity_ioc_etl_spark.corpus_export import run_corpus_export
from cybersecurity_ioc_etl_spark.operators.curation import curate
from cybersecurity_ioc_etl_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def export(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export"))
    metrics = run_corpus_export(spark, sf_dir, out)
    return out, metrics


def test_metrics_match_written_data(spark, export):
    out, metrics = export
    chunks = spark.read.parquet(f"{out}/chunks")
    assert metrics["n_chunks"] == chunks.count()
    assert metrics["n_docs"] == chunks.select("doc_id").distinct().count()
    assert (
        metrics["total_chars"]
        == chunks.agg(F.sum(F.length("chunk_text"))).collect()[0][0]
    )


def test_only_curated_survivors_are_exported(spark, sf_dir, export):
    out, _ = export
    exported = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/chunks").select("doc_id").distinct().collect()
    }
    keep = {
        r.doc_id
        for r in curate(load_table(spark, sf_dir, "documents")).select("doc_id").collect()
    }
    assert exported == keep


def test_manifest_agrees_with_chunks(spark, export):
    out, _ = export
    manifest = {
        r.source: (r.n_docs, r.n_chunks, r.total_chars)
        for r in spark.read.parquet(f"{out}/manifest").collect()
    }
    actual = {
        r.source: (r.n_docs, r.n_chunks, r.total_chars)
        for r in spark.read.parquet(f"{out}/chunks")
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.length("chunk_text")).cast("bigint").alias("total_chars"),
        )
        .collect()
    }
    assert manifest == actual


def test_reexport_is_byte_identical(spark, sf_dir, export, tmp_path):
    """Every stage is a pure function of row keys: a second export must
    produce the identical chunk multiset."""
    out, metrics = export
    out2 = str(tmp_path / "again")
    metrics2 = run_corpus_export(spark, sf_dir, out2)
    assert metrics == metrics2
    h1 = (
        spark.read.parquet(f"{out}/chunks")
        .select(F.md5(F.concat_ws("|", "doc_id", "chunk_idx", "chunk_text")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")))
        .collect()[0][0]
    )
    h2 = (
        spark.read.parquet(f"{out2}/chunks")
        .select(F.md5(F.concat_ws("|", "doc_id", "chunk_idx", "chunk_text")).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")))
        .collect()[0][0]
    )
    assert h1 == h2


def test_archive_files_have_disjoint_docid_ranges(spark, export):
    out, _ = export
    ranges = []
    base = f"{out}/chunks"
    for fname in sorted(os.listdir(base)):
        if not fname.endswith(".parquet"):
            continue
        row = (
            spark.read.parquet(f"{base}/{fname}")
            .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
            .collect()[0]
        )
        if row.mn is not None:
            ranges.append((row.mn, row.mx))
    assert len(ranges) >= 2
    ranges.sort()
    for (_, prev_mx), (next_mn, _) in zip(ranges, ranges[1:]):
        assert prev_mx <= next_mn


def test_chunk_text_safe_on_empty_documents(spark):
    """chunk_text must be safe standalone: sequence(1, 0) throws
    'Illegal sequence boundaries', so an empty/whitespace doc yields one
    empty chunk instead of crashing (previously only safe because
    curate()'s n_tokens gate ran first)."""
    from cybersecurity_ioc_etl_spark.corpus_export import chunk_text

    docs = spark.createDataFrame(
        [(1, "web", ""), (2, "web", "abc")],
        ["doc_id", "source", "text"],
    )
    rows = chunk_text(docs, chunk=2, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    assert by_doc[1] == [""]
    assert by_doc[2] == ["ab", "c"]
